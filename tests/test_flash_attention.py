"""Flash-attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.ops.attention import attention_reference
from matryoshka_mm_tpu.ops.flash_attention import flash_attention

B, H, S, Dh = 1, 2, 256, 64


def _inputs(seed=0, Sk=S):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, Sk, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, Sk, Dh)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    q, k, v = _inputs()
    got = flash_attention(q, k, v, causal=causal)
    want = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_forward_with_padding_mask():
    q, k, v = _inputs(1)
    valid = np.ones((B, S), bool)
    valid[:, 200:] = False  # right padding
    got = flash_attention(q, k, v, causal=True, kv_valid=jnp.asarray(valid))
    want = attention_reference(q, k, v, causal=True, kv_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got[:, :, :200]),
                               np.asarray(want[:, :, :200]), atol=2e-3)


def test_forward_left_padding():
    q, k, v = _inputs(2)
    valid = np.ones((B, S), bool)
    valid[:, :56] = False  # left padding
    got = flash_attention(q, k, v, causal=True, kv_valid=jnp.asarray(valid))
    want = attention_reference(q, k, v, causal=True, kv_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got[:, :, 56:]),
                               np.asarray(want[:, :, 56:]), atol=2e-3)


def test_unaligned_seq_len():
    """Sq=200 not a multiple of the 128 block -> wrapper pads & slices."""
    q, k, v = _inputs(3, Sk=200)
    q = q[:, :, :200]
    got = flash_attention(q, k, v, causal=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_gqa_expansion():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, 4, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 2, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 2, S, Dh)).astype(np.float32))
    got = flash_attention(q, k, v, causal=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_gradients_match_reference():
    q, k, v = _inputs(5)
    valid = np.ones((B, S), bool)
    valid[:, 230:] = False
    valid_j = jnp.asarray(valid)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, kv_valid=valid_j)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True, kv_valid=valid_j)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        gf, gr = np.asarray(gf), np.asarray(gr)
        # padded kv rows have undefined grads in the reference too; compare valid
        if name in "kv":
            gf, gr = gf[:, :, :230], gr[:, :, :230]
        np.testing.assert_allclose(gf, gr, atol=5e-3, err_msg=name)


def test_gqa_gradients_match_reference():
    """Hkv < H on the kernel path: dK/dV must sum over the query group in
    the kernel's VMEM accumulator (no HBM expansion of K/V)."""
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((2, 8, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 2, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 2, S, Dh)).astype(np.float32))
    valid = np.ones((2, S), bool)
    valid[:, 230:] = False
    valid_j = jnp.asarray(valid)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v, causal=True, kv_valid=valid_j)
            return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))
        return f

    g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        gf, gr = np.asarray(gf), np.asarray(gr)
        if name in "kv":
            gf, gr = gf[:, :, :230], gr[:, :, :230]
        np.testing.assert_allclose(gf, gr, atol=5e-3, err_msg=name)


def test_gqa_sliding_window():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, 4, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, S, Dh)).astype(np.float32))
    got = flash_attention(q, k, v, causal=True, sliding_window=64)
    want = attention_reference(q, k, v, causal=True, sliding_window=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)
