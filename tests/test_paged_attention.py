"""Pallas paged-attention decode kernel vs gathered reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.ops.attention import attention_reference
from matryoshka_mm_tpu.ops.paged_attention import paged_decode_attention

B, H, Dh = 2, 4, 128
PAGE, NPAGES, P = 16, 12, 4


def _setup(seed=0, row_lens=(30, 50)):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k_pages = rng.standard_normal((NPAGES, PAGE, H, Dh)).astype(np.float32)
    v_pages = rng.standard_normal((NPAGES, PAGE, H, Dh)).astype(np.float32)
    # scrambled, non-overlapping page maps
    perm = rng.permutation(NPAGES)
    tables = perm[: B * P].reshape(B, P).astype(np.int32)
    row_len = np.asarray(row_lens, np.int32)
    return q, k_pages, v_pages, tables, row_len


def _reference(q, k_pages, v_pages, tables, row_len):
    outs = []
    for b in range(B):
        k_rows = k_pages[tables[b]].reshape(P * PAGE, H, Dh)
        v_rows = v_pages[tables[b]].reshape(P * PAGE, H, Dh)
        n = row_len[b] + 1
        out = attention_reference(
            jnp.asarray(q[b:b + 1, :, None, :]),
            jnp.asarray(k_rows[None].transpose(0, 2, 1, 3)),
            jnp.asarray(v_rows[None].transpose(0, 2, 1, 3)),
            causal=False,
            kv_valid=jnp.asarray((np.arange(P * PAGE) < n)[None]),
        )
        outs.append(np.asarray(out[0, :, 0]))
    return np.stack(outs)


def test_paged_attention_matches_reference():
    q, k_pages, v_pages, tables, row_len = _setup()
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(tables), jnp.asarray(row_len)))
    want = _reference(q, k_pages, v_pages, tables, row_len)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_paged_attention_page_boundaries():
    """Row lengths exactly at page boundaries (0 extra, full pages)."""
    q, k_pages, v_pages, tables, row_len = _setup(1, row_lens=(15, 63))
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(tables), jnp.asarray(row_len)))
    want = _reference(q, k_pages, v_pages, tables, row_len)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_paged_attention_gqa():
    rng = np.random.default_rng(2)
    Hkv = 2
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k_pages = rng.standard_normal((NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    v_pages = rng.standard_normal((NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    tables = np.arange(B * P).reshape(B, P).astype(np.int32)
    row_len = np.asarray([20, 40], np.int32)
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(tables), jnp.asarray(row_len)))
    # reference with expanded kv
    k_exp = np.repeat(k_pages, H // Hkv, axis=2)
    v_exp = np.repeat(v_pages, H // Hkv, axis=2)
    want = _reference(q, k_exp, v_exp, tables, row_len)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_paged_attention_stacked_matches_plain():
    """Layer-indexed stacked variant selects the right layer's pools."""
    from matryoshka_mm_tpu.ops.paged_attention import (
        paged_decode_attention_stacked)

    L = 3
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k_all = rng.standard_normal((L, NPAGES, PAGE, H, Dh)).astype(np.float32)
    v_all = rng.standard_normal((L, NPAGES, PAGE, H, Dh)).astype(np.float32)
    tables = np.arange(B * P).reshape(B, P).astype(np.int32)
    row_len = np.asarray([22, 47], np.int32)
    for l in range(L):
        got = np.asarray(paged_decode_attention_stacked(
            jnp.asarray(q), jnp.asarray(k_all), jnp.asarray(v_all),
            jnp.asarray(l, jnp.int32), jnp.asarray(tables),
            jnp.asarray(row_len)))
        want = np.asarray(paged_decode_attention(
            jnp.asarray(q), jnp.asarray(k_all[l]), jnp.asarray(v_all[l]),
            jnp.asarray(tables), jnp.asarray(row_len)))
        np.testing.assert_allclose(got, want, atol=2e-5)

def _quant(x):
    """per-(slot, head) absmax int8 quantization over the last dim."""
    s = np.maximum(np.abs(x).max(axis=-1) / 127.0, 1e-8)
    q = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def test_paged_attention_int8_kv():
    """int8 pages + per-(slot, head) scales match the dequantized float
    reference.  Tolerance is bf16-bounded: the kernel folds the V scale
    into the probabilities and casts them to bf16 for the PV dot
    (~2^-9 relative), while the reference runs f32 end-to-end."""
    q, k_pages, v_pages, tables, row_len = _setup(4, row_lens=(30, 50))
    kq, ks = _quant(k_pages)
    vq, vs = _quant(v_pages)
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(tables), jnp.asarray(row_len),
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs)))
    want = _reference(q, kq.astype(np.float32) * ks[..., None],
                      vq.astype(np.float32) * vs[..., None],
                      tables, row_len)
    np.testing.assert_allclose(got, want, atol=4e-3)


def test_paged_attention_stacked_int8_kv():
    from matryoshka_mm_tpu.ops.paged_attention import (
        paged_decode_attention_stacked)

    L, Hkv = 2, 2
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k_all = rng.standard_normal((L, NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    v_all = rng.standard_normal((L, NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    tables = np.arange(B * P).reshape(B, P).astype(np.int32)
    row_len = np.asarray([22, 47], np.int32)
    kq, ks = _quant(k_all)
    vq, vs = _quant(v_all)
    for l in range(L):
        got = np.asarray(paged_decode_attention_stacked(
            jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
            jnp.asarray(l, jnp.int32), jnp.asarray(tables),
            jnp.asarray(row_len), k_scale=jnp.asarray(ks),
            v_scale=jnp.asarray(vs)))
        want = np.asarray(paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kq[l]), jnp.asarray(vq[l]),
            jnp.asarray(tables), jnp.asarray(row_len),
            k_scale=jnp.asarray(ks[l]), v_scale=jnp.asarray(vs[l])))
        np.testing.assert_allclose(got, want, atol=2e-5)


