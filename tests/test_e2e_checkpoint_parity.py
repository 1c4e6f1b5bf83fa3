"""End-to-end converted-checkpoint parity vs a torch reference pipeline.

The component parity tests (CLIP vs HF, llama vs HF, bit-exact pooling,
splice) each cover one stage; this test composes ALL of them through the
real user path — a liuhaotian-layout torch checkpoint on disk, loaded via
``load_pretrained_model`` (conversion included) — and checks greedy
next-token agreement against an in-test torch port of the reference
pipeline (tower -> select_layer/patch -> mm_projector ->
adaptive_avg_pool2d matryoshka pooling -> splice -> LM), i.e. the
offline analog of BASELINE.md's "temperature-0 answer match" north star
(the real-weight version runs via scripts/check_fidelity.py when
M3_CHECKPOINT is set).

Reference semantics ported here: llava/model/llava_arch.py
encode_images (hidden_states[select_layer][:, 1:]), project_v4 pooling
order (projector BEFORE pooling for projector_loc=after_vision_tower),
and prepare_inputs_labels_for_multimodal's single-image splice.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX  # noqa: E402
from matryoshka_mm_tpu.models.builder import load_pretrained_model  # noqa: E402
from matryoshka_mm_tpu.models.llava import (  # noqa: E402
    forward_spliced,
    prepare_multimodal,
)

H_LM, V, H_VIS = 32, 128, 48
IMG, PATCH = 56, 14                       # 4x4 patch grid -> scales 1/4/16


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    lm_cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=H_LM, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-5, rope_theta=10000.0)
    lm = transformers.LlamaForCausalLM(lm_cfg).eval()
    vis_cfg = transformers.CLIPVisionConfig(
        hidden_size=H_VIS, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=IMG, patch_size=PATCH,
        layer_norm_eps=1e-5)
    vis = transformers.CLIPVisionModel(vis_cfg).eval()

    sd = dict(lm.state_dict())
    for k, v in vis.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    g = torch.Generator().manual_seed(1)
    proj = {
        "model.mm_projector.0.weight": torch.randn(H_LM, H_VIS, generator=g) * 0.1,
        "model.mm_projector.0.bias": torch.randn(H_LM, generator=g) * 0.1,
        "model.mm_projector.2.weight": torch.randn(H_LM, H_LM, generator=g) * 0.1,
        "model.mm_projector.2.bias": torch.randn(H_LM, generator=g) * 0.1,
    }
    sd.update(proj)
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "vocab_size": V, "hidden_size": H_LM, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 4, "rms_norm_eps": 1e-5,
            "mm_projector_type": "mlp2x_gelu", "mm_hidden_size": H_VIS,
            "mm_vision_select_layer": -2, "mm_vision_select_feature": "patch",
            "image_aspect_ratio": "pad",
            "vision_tower_config": {
                "hidden_size": H_VIS, "intermediate_size": 96,
                "num_hidden_layers": 3, "num_attention_heads": 4,
                "image_size": IMG, "patch_size": PATCH,
            },
            "config": {"use_alternative": True, "projection_type": "v4",
                       "matryoshka_vis_token_scale": "ver=v0_numtoks=[1,4,16]",
                       "moe": None, "projector_loc": "after_vision_tower",
                       "lm_loss_type": "micro"},
        }, f)
    return str(path), lm, vis, proj


def _torch_image_features(vis, proj, px, numtoks):
    """Reference pipeline: tower -> hidden_states[-2][:, 1:] -> projector
    -> adaptive_avg_pool2d to sqrt(numtoks)^2 tokens (llava_arch.py
    project_v4, projector before pooling)."""
    with torch.no_grad():
        out = vis(px, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]                 # (1, P, H_VIS)
        w0 = proj["model.mm_projector.0.weight"]
        b0 = proj["model.mm_projector.0.bias"]
        w2 = proj["model.mm_projector.2.weight"]
        b2 = proj["model.mm_projector.2.bias"]
        feats = torch.nn.functional.gelu(feats @ w0.T + b0) @ w2.T + b2
        B, P, D = feats.shape
        side = int(round(P ** 0.5))
        r = int(round(numtoks ** 0.5))
        grid = feats.reshape(B, side, side, D).permute(0, 3, 1, 2)
        pooled = torch.nn.functional.adaptive_avg_pool2d(grid, (r, r))
        return pooled.permute(0, 2, 3, 1).reshape(B, numtoks, D)


def _torch_logits(lm, embeds):
    with torch.no_grad():
        out = lm(inputs_embeds=embeds)
    return out.logits


@pytest.mark.parametrize("numtoks", [1, 4, 16])
def test_converted_checkpoint_forced_greedy_parity(checkpoint, numtoks):
    path, lm, vis, proj = checkpoint
    tok, model, _proc, _ctx = load_pretrained_model(path, None, "llava-e2e")
    assert model.cfg.tokscale_list == [1, 4, 16]

    rng = np.random.default_rng(0)
    ids = rng.integers(5, V - 5, (1, 9)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.5

    # ---- torch reference: splice image features into the embeddings ----
    img_feats = _torch_image_features(vis, proj, torch.from_numpy(px),
                                      numtoks)
    emb = lm.get_input_embeddings()
    pre = emb(torch.from_numpy(ids[:, :3].astype(np.int64)))
    post = emb(torch.from_numpy(ids[:, 4:].astype(np.int64)))
    embeds = torch.cat([pre, img_feats, post], dim=1)

    # ---- ours: the converted checkpoint through the public pipeline ----
    spliced, _ = prepare_multimodal(model.params, model.cfg,
                                    jnp.asarray(ids), jnp.asarray(px),
                                    numtoks=numtoks)
    n_real = int(np.asarray(spliced.attn_mask).sum())
    assert n_real == embeds.shape[1]

    # forced greedy: at every step both sides extend with the TORCH argmax
    # so per-step agreement is independent of earlier flips
    agree, steps = 0, 6
    for _ in range(steps):
        t_logits = _torch_logits(lm, embeds)[0, embeds.shape[1] - 1]
        j_logits = np.asarray(
            forward_spliced(model.params, model.cfg, spliced),
            np.float32)[0, n_real - 1]
        t_tok = int(t_logits.argmax())
        j_tok = int(j_logits.argmax())
        # bf16 conversion bounds the logit error; the composed pipelines
        # must agree within it
        np.testing.assert_allclose(
            j_logits, t_logits.numpy(), atol=0.08,
            err_msg=f"numtoks={numtoks}")
        agree += int(t_tok == j_tok)
        nxt = torch.tensor([[t_tok]])
        embeds = torch.cat([embeds, emb(nxt)], dim=1)
        new_emb = np.asarray(spliced.embeds)
        tok_emb = np.asarray(model.params["llama"]["embed_tokens"],
                             np.float32)[t_tok]
        new_emb = np.concatenate(
            [new_emb[:, :n_real],
             tok_emb[None, None].astype(new_emb.dtype)], axis=1)
        n_real += 1
        spliced = spliced._replace(
            embeds=jnp.asarray(new_emb),
            position_ids=jnp.arange(n_real)[None],
            attn_mask=jnp.ones((1, n_real), bool))
    # greedy tokens: allow at most one bf16-margin flip over the run
    assert agree >= steps - 1, f"numtoks={numtoks}: {agree}/{steps}"


def test_converted_checkpoint_anyres_merge_parity(checkpoint, tmp_path):
    """Anyres spatial_unpad merge through the converted checkpoint matches
    a torch port of the reference merge (llava_arch.py:552-589: grid
    reassembly, unpad_image crop, per-row image_newline, base prepend)."""
    import shutil

    from matryoshka_mm_tpu.models.llava import encode_anyres_features

    src, lm, vis, proj = checkpoint
    path = tmp_path / "anyres"
    shutil.copytree(src, path)
    # extend the checkpoint: anyres config + an image_newline weight
    g = torch.Generator().manual_seed(7)
    newline = torch.randn(H_LM, generator=g) * 0.1
    sd = torch.load(os.path.join(path, "pytorch_model.bin"),
                    weights_only=True)
    sd["model.image_newline"] = newline
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    cfg_d = json.load(open(os.path.join(path, "config.json")))
    cfg_d["image_aspect_ratio"] = "anyres"
    cfg_d["mm_patch_merge_type"] = "spatial_unpad"
    cfg_d["image_grid_pinpoints"] = [[112, 56], [56, 112], [112, 112]]
    json.dump(cfg_d, open(os.path.join(path, "config.json"), "w"))

    tok, model, _proc, _ctx = load_pretrained_model(str(path), None,
                                                    "llava-e2e-anyres")
    rng = np.random.default_rng(3)
    # 2x1 tile grid (112x56 pinpoint wins for a wide image) + base tile
    image_size = (100, 40)                   # (w, h): wide -> rows cropped
    tiles = rng.standard_normal((3, 3, IMG, IMG)).astype(np.float32) * 0.5
    numtoks = 16

    got = np.asarray(encode_anyres_features(
        model.params, model.cfg, jnp.asarray(tiles), image_size, numtoks),
        np.float32)

    # ---- torch reference port ----
    feats = _torch_image_features(vis, proj, torch.from_numpy(tiles),
                                  numtoks)                 # (3, 16, D)
    base, grid_tiles = feats[0], feats[1:]
    h = w = 4
    num_w, num_h = 2, 1                       # 112x56 pinpoint, 56px tiles
    D = base.shape[-1]
    grid = grid_tiles.reshape(num_h, num_w, h, w, D) \
        .permute(4, 0, 2, 1, 3).reshape(D, num_h * h, num_w * w)
    # unpad (reference mm_utils.unpad_image): wide image -> crop rows
    ow, oh = image_size
    cur_h, cur_w = grid.shape[1], grid.shape[2]
    if ow / oh > cur_w / cur_h:
        new_h = int(oh * (cur_w / ow))
        pad = (cur_h - new_h) // 2
        grid = grid[:, pad: cur_h - pad, :]
    else:
        new_w = int(ow * (cur_h / oh))
        pad = (cur_w - new_w) // 2
        grid = grid[:, :, pad: cur_w - pad]
    nl = newline[:, None, None].expand(D, grid.shape[1], 1)
    grid = torch.cat([grid, nl], dim=2)
    tile_feats = grid.reshape(D, -1).T
    want = torch.cat([base, tile_feats], dim=0).numpy()

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=0.03)   # bf16 pipeline


def test_converted_checkpoint_router_parity(checkpoint, tmp_path):
    """M3-MoE router through the converted checkpoint: gating probs match
    the torch port (tanh MLP + softmax over the select-layer cls feature,
    llava_arch.py:127-135, 499-518) and gateprobargmax picks the same
    scale."""
    import shutil

    from matryoshka_mm_tpu.generate import gating_probs

    src, lm, vis, proj = checkpoint
    path = tmp_path / "moe"
    shutil.copytree(src, path)
    g = torch.Generator().manual_seed(11)
    r_fc1_w = torch.randn(24, H_VIS, generator=g) * 0.2
    r_fc1_b = torch.randn(24, generator=g) * 0.2
    r_fc2_w = torch.randn(3, 24, generator=g) * 0.2
    r_fc2_b = torch.randn(3, generator=g) * 0.2
    sd = torch.load(os.path.join(path, "pytorch_model.bin"),
                    weights_only=True)
    sd["model.router.fc1.weight"] = r_fc1_w
    sd["model.router.fc1.bias"] = r_fc1_b
    sd["model.router.fc2.weight"] = r_fc2_w
    sd["model.router.fc2.bias"] = r_fc2_b
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    cfg_d = json.load(open(os.path.join(path, "config.json")))
    cfg_d["config"]["moe"] = \
        "t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01"
    json.dump(cfg_d, open(os.path.join(path, "config.json"), "w"))

    tok, model, _proc, _ctx = load_pretrained_model(str(path), None,
                                                    "llava-e2e-moe")
    assert model.cfg.is_m3_moe
    rng = np.random.default_rng(5)
    px = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.5

    got = np.asarray(gating_probs(model.params, model.cfg,
                                  jnp.asarray(px)), np.float32)

    with torch.no_grad():
        cls = vis(torch.from_numpy(px),
                  output_hidden_states=True).hidden_states[-2][:, 0]
        h = torch.tanh(cls @ r_fc1_w.T + r_fc1_b)
        want = torch.softmax(h @ r_fc2_w.T + r_fc2_b, dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=0.02)
    assert int(got[0].argmax()) == int(want[0].argmax())
