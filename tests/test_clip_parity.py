"""Parity of the JAX CLIP tower against HF torch CLIPVisionModel
(random-init, tiny config — no downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from matryoshka_mm_tpu.models.clip import ClipVisionConfig, clip_vision_forward  # noqa: E402
from matryoshka_mm_tpu.models.convert import convert_clip_vision  # noqa: E402

CFG = ClipVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=4,
    num_attention_heads=4, image_size=56, patch_size=14,
)


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return convert_clip_vision(hf_model.state_dict(), CFG)


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 3, 56, 56)).astype(np.float32)


def test_select_layer_features_match(hf_model, jax_params, pixels):
    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(pixels), output_hidden_states=True)
    want = hf_out.hidden_states[CFG.select_layer][:, 1:, :].numpy()

    got = np.asarray(clip_vision_forward(jax_params, jnp.asarray(pixels), CFG)["patch"])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_router_taps_match(hf_model, jax_params, pixels):
    taps = {}

    def hook_k(module, inp, out):
        taps["k"] = out

    def hook_q(module, inp, out):
        taps["q"] = out

    last = hf_model.vision_model.encoder.layers[-1].self_attn
    h1 = last.k_proj.register_forward_hook(hook_k)
    h2 = last.q_proj.register_forward_hook(hook_q)
    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(pixels), output_hidden_states=True)
    h1.remove()
    h2.remove()

    out = clip_vision_forward(jax_params, jnp.asarray(pixels), CFG, want_router_taps=True)

    sel = hf_out.hidden_states[CFG.select_layer]
    np.testing.assert_allclose(np.asarray(out["cls"]), sel[:, 0].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["patchavgpool"]), sel[:, 1:].mean(1).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["clslast"]), hf_out.hidden_states[-1][:, 0].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["poolout"]), hf_out.pooler_output.numpy(), atol=1e-4)

    # attention maps exactly as computed by the reference from raw q/k taps
    # (llava_arch.py:391-395)
    D = CFG.hidden_size
    q, k = taps["q"], taps["k"]
    want_qk = torch.softmax(
        (q[:, :1, :] @ k[:, 1:, :].transpose(-2, -1)).squeeze(1) * D ** -0.5, dim=-1
    ).numpy()
    want_kk = torch.softmax(
        (k[:, :1, :] @ k[:, 1:, :].transpose(-2, -1)).squeeze(1) * D ** -0.5, dim=-1
    ).numpy()
    np.testing.assert_allclose(np.asarray(out["attnqk"]), want_qk, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["attnkk"]), want_kk, atol=1e-4)
