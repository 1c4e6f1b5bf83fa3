"""Ring attention vs single-device attention on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from matryoshka_mm_tpu.ops.attention import attention_reference
from matryoshka_mm_tpu.parallel.ring_attention import ring_attention


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


@pytest.mark.parametrize("n_dev,causal", [(2, True), (4, True), (4, False)])
def test_ring_matches_reference(n_dev, causal):
    rng = np.random.default_rng(0)
    B, H, S, Dh = 2, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))

    want = attention_reference(q, k, v, causal=causal)
    got = ring_attention(q, k, v, _mesh(n_dev), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_with_padding():
    rng = np.random.default_rng(1)
    B, H, S, Dh = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[:, 12:] = False
    want = attention_reference(q, q, q, causal=True, kv_valid=jnp.asarray(valid))
    got = ring_attention(q, q, q, _mesh(4), causal=True,
                         kv_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got[:, :, :12]),
                               np.asarray(want[:, :, :12]), atol=2e-5)


@pytest.mark.parametrize("n_dev,causal", [(2, True), (4, True), (4, False)])
def test_ring_flash_blocks_match_reference(n_dev, causal):
    """use_flash=True: every rotation step runs the Pallas kernel
    (interpret mode on CPU) and merges blocks via logsumexp."""
    rng = np.random.default_rng(3)
    B, H, S, Dh = 1, 2, 4 * 128, 8   # >=128 rows per device block
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    want = attention_reference(q, k, v, causal=causal)
    got = ring_attention(q, k, v, _mesh(n_dev), causal=causal, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_ring_flash_with_padding():
    rng = np.random.default_rng(4)
    B, H, S, Dh = 1, 1, 2 * 128, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[:, 200:] = False
    want = attention_reference(q, q, q, causal=True, kv_valid=jnp.asarray(valid))
    got = ring_attention(q, q, q, _mesh(2), causal=True,
                         kv_valid=jnp.asarray(valid), use_flash=True)
    np.testing.assert_allclose(np.asarray(got[:, :, :200]),
                               np.asarray(want[:, :, :200]), atol=2e-4)


def test_ring_gradients():
    rng = np.random.default_rng(2)
    B, H, S, Dh = 1, 1, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    mesh = _mesh(2)

    def loss_ring(x):
        return jnp.sum(ring_attention(x, x, x, mesh, causal=True) ** 2)

    def loss_ref(x):
        return jnp.sum(attention_reference(x, x, x, causal=True) ** 2)

    g1 = jax.grad(loss_ring)(q)
    g2 = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)
