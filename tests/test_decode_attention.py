"""Flash-decode attention kernel vs the reference softmax path
(ops/decode_attention.py; interpret mode runs the kernel on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from matryoshka_mm_tpu.ops.attention import attention_reference
from matryoshka_mm_tpu.ops.decode_attention import flash_decode_attention

pytestmark = pytest.mark.quick


def _case(B, H, Hkv, S, Dh, *, window=None, seed=0, valid_frac=0.7):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, Dh)), jnp.float32)
    n_valid = max(1, int(S * valid_frac))
    valid = np.zeros((B, S), bool)
    valid[:, :n_valid] = True
    kv_pos = np.tile(np.arange(S, dtype=np.int32), (B, 1))
    q_pos = np.full((B,), n_valid - 1, np.int32)

    got = flash_decode_attention(
        q, k, v, jnp.asarray(valid), jnp.asarray(kv_pos),
        jnp.asarray(q_pos), sliding_window=window, interpret=True)

    want = attention_reference(
        q[:, :, None, :], k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        causal=True, q_positions=jnp.asarray(q_pos)[:, None],
        kv_positions=jnp.asarray(kv_pos), kv_valid=jnp.asarray(valid),
        sliding_window=window)[:, :, 0, :]
    return np.asarray(got), np.asarray(want)


def test_matches_reference_mha():
    got, want = _case(2, 8, 8, 128, 128)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_matches_reference_gqa():
    got, want = _case(3, 8, 2, 256, 128, seed=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sliding_window():
    got, want = _case(1, 4, 4, 128, 128, window=16, seed=2, valid_frac=1.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_multi_block_online_softmax():
    # S spans several 128-blocks so the running max/denominator matter
    got, want = _case(1, 8, 8, 512, 128, seed=3, valid_frac=0.9)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bf16_io():
    rng = np.random.default_rng(4)
    B, H, S, Dh = 2, 4, 128, 128
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.bfloat16)
    valid = jnp.ones((B, S), bool)
    kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))
    q_pos = jnp.full((B,), S - 1, jnp.int32)
    got = flash_decode_attention(q, k, v, valid, kv_pos, q_pos,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    want = attention_reference(
        q[:, :, None, :], k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        causal=True, q_positions=q_pos[:, None], kv_positions=kv_pos,
        kv_valid=valid)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
