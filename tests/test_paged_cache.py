"""Paged KV cache: allocator bookkeeping and decode parity vs dense cache."""

import numpy as np
import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    lm_head,
)
from matryoshka_mm_tpu.serve.paged_cache import (
    PageAllocator,
    import_dense_cache,
    init_paged_cache,
    paged_decode_step,
)

CFG = LlamaConfig.tiny_debug()
PAGE = 8


def test_allocator():
    # page 0 is reserved (trash page for overrun writes): 9 allocatable
    a = PageAllocator(n_pages=10, page_size=8, max_rows=2, max_pages_per_row=4)
    assert 0 not in a.free
    assert a.allocate_row(0, n_tokens=17, headroom=0)   # 3 pages
    assert a.capacity(0) == 24
    assert len(a.free) == 6
    assert a.extend_row(0)
    assert a.capacity(0) == 32
    assert not a.extend_row(0)  # max_pages_per_row reached
    a.free_row(0)
    assert len(a.free) == 9
    # exhaustion (9 allocatable: 4 + 4 fit)
    assert a.allocate_row(0, n_tokens=32)
    assert a.allocate_row(1, n_tokens=32)
    assert not a.extend_row(0)  # max_pages_per_row reached
    assert not a.allocate_row(0, n_tokens=32)  # 1 page left < 4 needed


def test_paged_decode_matches_dense():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, S = 2, 16  # prompt fills exactly 2 pages per row
    ids = jnp.asarray(rng.integers(5, 100, (B, S)).astype(np.int32))
    embeds = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    valid = jnp.ones((B, S), bool)

    # ---- dense path ----
    cap = S + 8
    dense = init_kv_cache(CFG, B, cap, dtype=jnp.float32)
    hidden, dense = llama_forward(params, CFG, embeds, position_ids=pos,
                                  attn_valid=valid, cache=dense)
    logits = lm_head(params, hidden[:, -1:, :])[:, 0]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)

    # ---- paged path: import each row's prefill via a scrambled page map ----
    paged = init_paged_cache(CFG, n_pages=12, page_size=PAGE, dtype=jnp.float32)
    alloc = PageAllocator(12, PAGE, max_rows=B, max_pages_per_row=4)
    for b in range(B):
        assert alloc.allocate_row(b, n_tokens=S, headroom=8)
        row_dense = jax.tree.map(lambda x: x, dense)
        from matryoshka_mm_tpu.models.llama import KVCache

        solo = KVCache(dense.k[:, b:b + 1, :S], dense.v[:, b:b + 1, :S],
                       dense.valid[b:b + 1, :S], dense.positions[b:b + 1, :S],
                       dense.write_idx)
        paged = import_dense_cache(paged, solo, alloc.tables[b], PAGE)

    tables = jnp.asarray(alloc.tables)
    row_len = jnp.full((B,), S, jnp.int32)
    active = jnp.ones((B,), bool)

    tok_d, tok_p = tok, tok
    for step in range(4):
        # dense step
        h = embed_tokens(params, tok_d[:, None])
        hd, dense = llama_forward(params, CFG, h,
                                  position_ids=jnp.full((B, 1), S + step),
                                  attn_valid=jnp.ones((B, 1), bool),
                                  cache=dense)
        logits_d = lm_head(params, hd[:, 0:1, :])[:, 0]
        # paged step
        paged, logits_p = paged_decode_step(
            params, CFG, paged, tables, row_len + step, tok_p, active, PAGE)
        np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_d),
                                   atol=2e-4)
        tok_d = jnp.argmax(logits_d, -1).astype(jnp.int32)
        tok_p = jnp.argmax(logits_p, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok_d), np.asarray(tok_p))


def test_paged_rows_are_isolated():
    """An inactive row's pages must not change during decode."""
    params = init_llama_params(jax.random.PRNGKey(1), CFG)
    paged = init_paged_cache(CFG, n_pages=8, page_size=PAGE, dtype=jnp.float32)
    alloc = PageAllocator(8, PAGE, max_rows=2, max_pages_per_row=2)
    alloc.allocate_row(0, 8)
    alloc.allocate_row(1, 8)
    tables = jnp.asarray(alloc.tables)
    before = np.asarray(paged.k[:, alloc.tables[1]])

    tokens = jnp.asarray([5, 7], jnp.int32)
    active = jnp.asarray([True, False])
    paged, _ = paged_decode_step(params, CFG, paged, tables,
                                 jnp.asarray([0, 0], jnp.int32), tokens,
                                 active, PAGE)
    after = np.asarray(paged.k[:, alloc.tables[1]])
    np.testing.assert_array_equal(before, after)


def test_paged_decode_kernel_path_matches_gather():
    """use_kernel=True (Pallas, interpret on CPU) == gather path."""
    params = init_llama_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(3)
    B, S = 2, 16
    ids = jnp.asarray(rng.integers(5, 100, (B, S)).astype(np.int32))
    embeds = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    dense = init_kv_cache(CFG, B, S + 8, dtype=jnp.float32)
    hidden, dense = llama_forward(params, CFG, embeds, position_ids=pos,
                                  attn_valid=jnp.ones((B, S), bool),
                                  cache=dense)
    tok = jnp.argmax(lm_head(params, hidden[:, -1:, :])[:, 0], -1).astype(jnp.int32)

    from matryoshka_mm_tpu.models.llama import KVCache

    def build_paged():
        paged = init_paged_cache(CFG, n_pages=12, page_size=PAGE,
                                 dtype=jnp.float32)
        alloc = PageAllocator(12, PAGE, max_rows=B, max_pages_per_row=4)
        for b in range(B):
            assert alloc.allocate_row(b, n_tokens=S, headroom=8)
            solo = KVCache(dense.k[:, b:b + 1, :S], dense.v[:, b:b + 1, :S],
                           dense.valid[b:b + 1, :S],
                           dense.positions[b:b + 1, :S], dense.write_idx)
            paged = import_dense_cache(paged, solo, alloc.tables[b], PAGE)
        return paged, jnp.asarray(alloc.tables)

    row_len = jnp.full((B,), S, jnp.int32)
    active = jnp.ones((B,), bool)

    paged_g, tables = build_paged()
    paged_k, _ = build_paged()
    for step in range(3):
        paged_g, logits_g = paged_decode_step(
            params, CFG, paged_g, tables, row_len + step, tok, active, PAGE,
            use_kernel=False)
        paged_k, logits_k = paged_decode_step(
            params, CFG, paged_k, tables, row_len + step, tok, active, PAGE,
            use_kernel=True)
        np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_g),
                                   atol=2e-4)
        tok = jnp.argmax(logits_g, -1).astype(jnp.int32)
