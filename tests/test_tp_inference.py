"""Tensor-parallel inference (parallel/inference.py) on the CPU mesh.

The reference's multi-GPU inference story is HF ``device_map=auto``
(reference: llava/model/builder.py:45-49); here the same jitted
prefill/decode graphs run over TP-sharded params and must produce the
single-device tokens.
"""

import numpy as np
import jax
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, generate
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def cfg():
    return LlavaConfig.tiny_debug()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llava_params(jax.random.PRNGKey(0), cfg)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9, 23, 7]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    return ids, px


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_generate_matches_single_device(params, cfg, tp):
    """Greedy tokens under a (1, tp) mesh == single-device tokens."""
    from matryoshka_mm_tpu.parallel.inference import (
        make_tp_mesh, shard_model_for_inference)

    ids, px = _inputs()
    gen_cfg = GenerationConfig(max_new_tokens=12, decode_chunk=4,
                               eos_token_id=-1)
    want = generate(params, cfg, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=gen_cfg)[0]

    mesh = make_tp_mesh(tp)
    assert mesh.devices.shape == (1, tp)
    sparams, scfg, mesh = shard_model_for_inference(params, cfg,
                                                    mesh=mesh)
    assert scfg.llama.attn_impl == "reference"
    # the placement must actually split something across the model axis
    shardings = jax.tree.leaves(jax.tree.map(lambda x: x.sharding, sparams))
    assert any("model" in str(s.spec) for s in shardings)

    got = generate(sparams, scfg, ids, px,
                   matryoshka_vis_token_scale="ver=v0_numtoks=4",
                   gen_cfg=gen_cfg)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_pretrained_model_tp():
    """tp_size plumbs through the public loader (device_map=auto parity).

    Round 4: tp_size>1 routes generate() through the kernel-preserving
    TPEngine (parallel/tp_decode.py) — attn_impl is NOT forced to
    "reference" anymore, and the engine's decode params are genuinely
    split across the tp mesh."""
    from matryoshka_mm_tpu.models.builder import load_pretrained_model

    tok, model, proc, ctx = load_pretrained_model(
        "debug://tiny", None, "tiny", tp_size=2)
    assert model.cfg.llama.attn_impl == "auto"          # kernels kept
    assert model.tp_engine is not None
    assert model.tp_engine.tp == 2
    devsets = {tuple(sorted(d.id for d in leaf.sharding.device_set))
               for leaf in jax.tree.leaves(model.tp_engine.tp_params)}
    assert any(len(ds) == 2 for ds in devsets)

    ids, px = _inputs()
    out = model.generate(jax.numpy.asarray(ids), jax.numpy.asarray(px),
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         max_new_tokens=6, eos_token_id=-1)
    assert np.asarray(out).shape[0] == 1


def test_tp_quant_loads():
    """Round 4: quantized TP no longer raises — the engine shards the
    unfused quantized layout and re-fuses per-device shards (the round-3
    quant_fuse ValueError guard is gone by design)."""
    from matryoshka_mm_tpu.models.builder import load_pretrained_model

    tok, model, proc, ctx = load_pretrained_model(
        "debug://tiny", None, "tiny", tp_size=2, load_8bit=True)
    assert model.tp_engine is not None
    ids, px = _inputs()
    out = model.generate(jax.numpy.asarray(ids), jax.numpy.asarray(px),
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         max_new_tokens=4, eos_token_id=-1)
    assert np.asarray(out).shape[0] == 1
