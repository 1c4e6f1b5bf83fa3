import json
import os

import numpy as np
import jax
import pytest

from matryoshka_mm_tpu.models.builder import (
    DebugTokenizer,
    LlavaModel,
    is_mm_model,
    load_pretrained_model,
)
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_projector_only,
)


def test_load_debug_model():
    tok, model, proc, ctx = load_pretrained_model("debug://tiny", None, "tiny")
    assert isinstance(model, LlavaModel)
    assert model.cfg.is_m3
    assert ctx == model.cfg.tokenizer_model_max_length
    assert proc.crop_size["height"] == model.cfg.vision.image_size  # sized to config


def test_is_mm_model():
    assert is_mm_model("liuhaotian/llava-v1.5-7b")
    assert is_mm_model("debug://tiny")
    assert not is_mm_model("lmsys/vicuna-7b-v1.5")


def test_checkpoint_roundtrip(tmp_path):
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, cfg, step=7)
    params2, cfg2 = load_checkpoint(path)
    assert cfg2 == cfg
    a = np.asarray(params["llama"]["lm_head"])
    b = np.asarray(params2["llama"]["lm_head"])
    np.testing.assert_array_equal(a, b)

    # loader integration
    tok, model, proc, ctx = load_pretrained_model(path, None, "ckpt")
    np.testing.assert_array_equal(
        np.asarray(model.params["llama"]["lm_head"]), a)


def test_projector_only_checkpoint(tmp_path):
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "proj")
    save_projector_only(path, params, cfg, step=3)
    subset, _ = load_checkpoint(path)
    assert set(subset) == {"mm_projector"}


def test_latest_checkpoint(tmp_path):
    for s in (10, 200, 30):
        os.makedirs(tmp_path / f"checkpoint-{s}")
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-200")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_hf_torch_checkpoint_load(tmp_path):
    """Write a tiny HF-style LLaVA torch checkpoint and load it."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4)
    torch.manual_seed(0)
    lm = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v for k, v in lm.state_dict().items()}
    # add a 2-layer mlp projector the llava way
    sd["model.mm_projector.0.weight"] = torch.zeros(32, 24)
    sd["model.mm_projector.0.bias"] = torch.zeros(32)
    sd["model.mm_projector.2.weight"] = torch.zeros(32, 32)
    sd["model.mm_projector.2.bias"] = torch.zeros(32)

    path = tmp_path / "hf"
    os.makedirs(path)
    torch.save(sd, path / "pytorch_model.bin")
    with open(path / "config.json", "w") as f:
        json.dump({
            "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 4, "mm_projector_type": "mlp2x_gelu",
            "mm_hidden_size": 24, "image_aspect_ratio": "pad",
            "config": {"use_alternative": True, "projection_type": "v4",
                       "matryoshka_vis_token_scale": "ver=v0_numtoks=[1,4]",
                       "moe": None, "projector_loc": "after_vision_tower",
                       "lm_loss_type": "micro"},
        }, f)

    tok, model, proc, ctx = load_pretrained_model(str(path), None, "llava-test")
    assert model.cfg.is_m3
    assert model.cfg.tokscale_list == [1, 4]
    got = np.asarray(model.params["llama"]["embed_tokens"], dtype=np.float32)
    want = lm.state_dict()["model.embed_tokens.weight"].numpy()
    np.testing.assert_allclose(got, want, atol=1e-2)  # bf16 cast
