"""Multi-LoRA serving: adapter pack + per-row adapters in the paged pool."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, generate
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.ops.lora import add_lora, extract_lora, load_lora
from matryoshka_mm_tpu.serve.multi_lora import pack_adapters


@pytest.fixture(scope="module")
def setup():
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    adapters = {}
    for i, name in enumerate(("alpha", "beta")):
        wrapped = add_lora(params, jax.random.PRNGKey(10 + i), r=4, alpha=8.0)
        # give B real values so each adapter visibly changes the model
        def bump(tree):
            for mod in ("self_attn", "mlp"):
                for proj, leaf in tree["llama"]["layers"][mod].items():
                    leaf["lora_b"] = jax.random.normal(
                        jax.random.fold_in(jax.random.PRNGKey(20 + i),
                                           hash(proj) % 1000),
                        leaf["lora_b"].shape) * 0.05
        bump(wrapped)
        adapters[name] = extract_lora(wrapped)
    return cfg, params, adapters


def test_pack_adapters_shapes(setup):
    cfg, params, adapters = setup
    pack, names = pack_adapters(adapters)
    assert names == {None: 0, "alpha": 1, "beta": 2}
    A = pack.a[("self_attn", "q_proj")]
    n_layers = cfg.llama.num_hidden_layers
    assert A.shape[:2] == (3, n_layers)         # base-zero + 2 adapters
    assert not np.asarray(A[0]).any()           # slot 0 is the base model
    assert np.asarray(A[1]).any()


def test_pack_rank_mismatch_rejected(setup):
    cfg, params, adapters = setup
    bad = add_lora(params, jax.random.PRNGKey(9), r=8, alpha=8.0)
    with pytest.raises(ValueError, match="rank"):
        pack_adapters({**adapters, "bad": extract_lora(bad)})


def test_multi_lora_pool_matches_solo(setup):
    """Rows with different adapters decode together and each matches its
    solo adapter-attached generation."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg, params, adapters = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2, eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=3, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, adapters=adapters)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9, 61, 7, 30]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    try:
        reqs = {name: b.submit(ids, px, numtoks=4, max_new_tokens=8,
                               lora_id=name)
                for name in (None, "alpha", "beta")}
        outs = {n: np.concatenate(list(b.stream(r))) for n, r in reqs.items()}
        for name in (None, "alpha", "beta"):
            p = params if name is None else load_lora(params, adapters[name])
            want = generate(p, cfg, ids, px,
                            matryoshka_vis_token_scale="ver=v0_numtoks=4",
                            gen_cfg=gen_cfg)[0]
            np.testing.assert_array_equal(outs[name][: len(want)], want,
                                          err_msg=f"adapter={name}")
        # adapters actually change the output
        assert not np.array_equal(outs[None], outs["alpha"])
        with pytest.raises(KeyError):
            b.submit(ids, px, lora_id="nope")
    finally:
        b.shutdown()


def test_lora_prefix_chains_are_salted(setup):
    """The same prompt under different adapters must not share KV pages."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg, params, adapters = setup
    gen_cfg = GenerationConfig(max_new_tokens=4, decode_chunk=2, eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, prefix_cache=True,
                          adapters=adapters)
    rng = np.random.default_rng(1)
    ids = rng.integers(5, 100, (1, 21)).astype(np.int32)
    ids[0, 2] = IMAGE_TOKEN_INDEX
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    try:
        r1 = b.submit(ids, px, numtoks=4, max_new_tokens=4, lora_id=None)
        _ = np.concatenate(list(b.stream(r1)))
        # same prompt, adapter alpha: must MISS (different chain root)
        r2 = b.submit(ids, px, numtoks=4, max_new_tokens=4, lora_id="alpha")
        toks_a = np.concatenate(list(b.stream(r2)))
        assert b.stats["prefix_hits"] == 0
        # repeat with alpha: now hits its own salted chain
        r3 = b.submit(ids, px, numtoks=4, max_new_tokens=4, lora_id="alpha")
        toks_a2 = np.concatenate(list(b.stream(r3)))
        assert b.stats["prefix_hits"] == 1
        np.testing.assert_array_equal(toks_a, toks_a2)
    finally:
        b.shutdown()
