"""Prefix caching: chain index, refcounted pages, suffix-only prefill."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, generate
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.serve.prefix_cache import (
    PrefixIndex,
    RefcountAllocator,
    build_key_seq,
    chain_hashes,
)


def test_chain_hashes_prefix_property():
    key = np.arange(40, dtype=np.int64)
    h1 = chain_hashes(key, 8)
    h2 = chain_hashes(key[:24], 8)
    assert len(h1) == 5 and len(h2) == 3
    assert h1[:3] == h2                      # shared prefix, same chain
    key2 = key.copy()
    key2[0] = 999                            # root change reroots everything
    assert chain_hashes(key2, 8)[0] != h1[0]
    assert chain_hashes(key2, 8)[2] != h1[2]


def test_build_key_seq_image_span():
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]])
    key, resume = build_key_seq(ids, 4, 0xABCD, IMAGE_TOKEN_INDEX)
    assert len(key) == 4 + 4 and resume == 2 + 4
    key_b, _ = build_key_seq(ids, 4, 0xDCBA, IMAGE_TOKEN_INDEX)
    assert (key[:2] == key_b[:2]).all()      # text matches
    assert (key[2:6] != key_b[2:6]).all()    # image span keys differ
    key_t, resume_t = build_key_seq(np.array([[5, 6, 7]]), None, None,
                                    IMAGE_TOKEN_INDEX)
    assert resume_t == 0 and (key_t == [5, 6, 7]).all()


def test_prefix_index_longest_run():
    idx = PrefixIndex()
    h = chain_hashes(np.arange(40, dtype=np.int64), 8)
    idx.register(h[:4], [10, 11, 12, 13])
    assert idx.lookup(h) == [10, 11, 12, 13]
    assert idx.lookup(h[:2]) == [10, 11]
    idx.drop_pages([12])                     # chain now stops before page 12
    assert idx.lookup(h) == [10, 11]


def test_refcount_allocator_sharing():
    a = RefcountAllocator(n_pages=10, page_size=8, max_rows=3,
                          max_pages_per_row=4)
    assert a.allocate_row(0, n_tokens=24)    # 3 fresh pages
    shared = a.tables[0][:2].tolist()
    a.pin(shared)
    assert a.allocate_row(1, n_tokens=24, shared=shared)   # 2 shared + 1 fresh
    assert a.ref[shared[0]] == 2
    assert len(a.free) == 9 - 4              # 3 + 1 distinct in use (page 0 reserved)
    a.free_row(0)
    # shared pages still referenced by row 1; row 0's third page was unpinned
    assert a.ref[shared[0]] == 1
    a.free_row(1)
    assert a.ref[shared[0]] == 0
    assert set(shared) <= a.cached           # pinned -> retained, not freed
    flushed = a.flush_cached()
    assert set(shared) <= set(flushed)
    assert len(a.free) == 9              # page 0 stays reserved


@pytest.fixture(scope="module")
def model():
    cfg = LlavaConfig.tiny_debug()
    return cfg, init_llava_params(jax.random.PRNGKey(0), cfg)


def _req(seed, n_text=21):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 100, (1, n_text)).astype(np.int32)
    ids[0, 2] = IMAGE_TOKEN_INDEX
    px = np.random.default_rng(0).standard_normal((1, 3, 56, 56)).astype(np.float32)
    return ids, px   # same image every time; text varies by seed


def test_prefix_cache_end_to_end(model):
    """Second request sharing image+prompt prefix admits via cached pages
    and produces exactly the tokens the full-prefill path produces."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg, params = model
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2, eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, prefix_cache=True)
    try:
        ids, px = _req(1)
        r1 = b.submit(ids, px, numtoks=4, max_new_tokens=8)
        toks1 = np.concatenate(list(b.stream(r1)))
        assert b.stats["prefix_hits"] == 0 and b.stats["prefix_misses"] == 1

        # identical request -> shares 2 pages (T=24, max usable H=2)
        r2 = b.submit(ids, px, numtoks=4, max_new_tokens=8)
        toks2 = np.concatenate(list(b.stream(r2)))
        assert b.stats["prefix_hits"] == 1
        assert b.stats["prefix_pages_reused"] == 2
        np.testing.assert_array_equal(toks1, toks2)

        # same prefix, different trailing question -> still hits, and the
        # output matches solo full generation for the new prompt
        ids3 = ids.copy()
        ids3[0, -4:] = [61, 62, 63, 64]
        r3 = b.submit(ids3, px, numtoks=4, max_new_tokens=8)
        toks3 = np.concatenate(list(b.stream(r3)))
        assert b.stats["prefix_hits"] == 2
        want3 = generate(params, cfg, ids3, px,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks3[: len(want3)], want3)

        # divergent text before the image region -> clean miss
        ids4 = ids.copy()
        ids4[0, 0] = 99
        r4 = b.submit(ids4, px, numtoks=4, max_new_tokens=4)
        _ = np.concatenate(list(b.stream(r4)))
        assert b.stats["prefix_misses"] >= 2
    finally:
        b.shutdown()


def test_prefix_cache_flush_under_pressure(model):
    """Cached pages are reclaimed when a new request needs them."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg, params = model
    gen_cfg = GenerationConfig(max_new_tokens=4, decode_chunk=2, eos_token_id=-1)
    # tiny pool: 1 row x 6 pages of 8 = 48 slots
    b = ContinuousBatcher(params, cfg, max_batch=1, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, prefix_cache=True)
    try:
        ids_a, px = _req(2)
        r = b.submit(ids_a, px, numtoks=4, max_new_tokens=4)
        _ = np.concatenate(list(b.stream(r)))
        assert len(b.alloc.cached) > 0       # pages retained for reuse
        # a different prompt (different image) needs the whole pool
        rng = np.random.default_rng(7)
        ids_b = rng.integers(5, 100, (1, 21)).astype(np.int32)
        ids_b[0, 2] = IMAGE_TOKEN_INDEX
        px_b = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
        r2 = b.submit(ids_b, px_b, numtoks=4, max_new_tokens=4)
        toks = np.concatenate(list(b.stream(r2)))
        assert toks.size >= 4                # admitted after flush
    finally:
        b.shutdown()


def test_prefix_cache_int8_pool(model):
    """Prefix reuse over an int8 paged pool: the hit path dequantizes the
    gathered prefix for the suffix prefill and re-quantizes new pages on
    import; greedy outputs match between the hit and miss admissions
    (both attend the same int8-quantized prefix KV)."""
    import dataclasses

    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg, params = model
    cfg8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=-1)
    b = ContinuousBatcher(params, cfg8, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, prefix_cache=True)
    try:
        assert b.paged.k.dtype == jnp.int8 and b.paged.k_scale is not None
        ids, px = _req(7)
        r1 = b.submit(ids, px, numtoks=4, max_new_tokens=8)
        toks1 = np.concatenate(list(b.stream(r1)))
        assert b.stats["prefix_misses"] == 1

        r2 = b.submit(ids, px, numtoks=4, max_new_tokens=8)
        toks2 = np.concatenate(list(b.stream(r2)))
        assert b.stats["prefix_hits"] == 1
        np.testing.assert_array_equal(toks1, toks2)
    finally:
        b.shutdown()
