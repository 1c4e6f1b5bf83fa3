"""Ring attention: sequence-parallel attention over a mesh axis.

Neither sequence nor context parallelism exists in the reference
(SURVEY.md P6 — its long-sequence pressure is handled by the M3 mechanism
itself).  This module adds ring attention as a capability beyond the
reference for contexts that exceed one chip's HBM:

* Q, K, V are sharded along the sequence dimension over a ``seq`` mesh
  axis; each device holds one block;
* K/V blocks rotate around the ring with ``lax.ppermute`` while each
  device accumulates its queries' attention over every block with the
  flash-attention online-softmax merge (running max / denominator in f32);
* causality is handled per block pair from absolute positions, so blocks
  entirely in the future are numerically masked;
* the local block-vs-block attention itself goes through ops.attention —
  on TPU the Pallas flash kernel computes each tile.

Differentiable (ppermute transposes); one rotation step per device, so
communication is O(S·D) per device per layer, fully overlappable by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

def _block_attention(q, k, v, q_pos, kv_pos, kv_valid, causal):
    """Local block attention returning (out_unnormalized, row_max, row_sum).

    out_unnormalized = exp(s - m) @ v with m the block row max, so blocks
    merge exactly like flash-attention tiles.
    """
    B, H, Sq, Dh = q.shape
    scale = Dh ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = kv_valid[:, None, None, :]
    if causal:
        mask = mask & (kv_pos[:, None, None, :] <= q_pos[:, None, :, None])
    s = jnp.where(mask, s, -1e30)
    m = jnp.max(s, axis=-1)                                   # (B, H, Sq)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)                                   # (B, H, Sq)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return out, m, l


def ring_attention(
    q: jnp.ndarray,            # (B, H, S, Dh) — S sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    kv_valid: Optional[jnp.ndarray] = None,   # (B, S)
    seq_axis: str = "seq",
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention; returns (B, H, S, Dh) sharded like q.

    ``use_flash`` routes each rotation step's block-vs-block attention
    through the Pallas flash kernel (merged across steps via the kernel's
    logsumexp residual); the default keeps the differentiable jnp path —
    the flash path is forward-only (inference / no-grad contexts)."""
    B, H, S, Dh = q.shape
    if use_flash is None:
        use_flash = False
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))

    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[seq_axis]

    def ring_fn(q, k, v, q_pos, kv_pos, kv_valid):
        idx = jax.lax.axis_index(seq_axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, _):
            k_blk, v_blk, pos_blk, val_blk, acc, m_run, l_run = carry
            out, m_blk, l_blk = _block_attention(
                q, k_blk, v_blk, q_pos, pos_blk, val_blk, causal)
            m_new = jnp.maximum(m_run, m_blk)
            alpha = jnp.exp(m_run - m_new)
            beta = jnp.exp(m_blk - m_new)
            acc = acc * alpha[..., None] + out * beta[..., None]
            l_run = l_run * alpha + l_blk * beta
            # rotate kv to the next device
            k_blk = jax.lax.ppermute(k_blk, seq_axis, perm)
            v_blk = jax.lax.ppermute(v_blk, seq_axis, perm)
            pos_blk = jax.lax.ppermute(pos_blk, seq_axis, perm)
            val_blk = jax.lax.ppermute(val_blk, seq_axis, perm)
            return (k_blk, v_blk, pos_blk, val_blk, acc, m_new, l_run), None

        acc0 = jnp.zeros(q.shape[:3] + (Dh,), jnp.float32)
        m0 = jnp.full(q.shape[:3], -1e30, jnp.float32)
        l0 = jnp.zeros(q.shape[:3], jnp.float32)
        (k, v, kv_pos, kv_valid, acc, m_run, l_run), _ = jax.lax.scan(
            step, (k, v, kv_pos, kv_valid, acc0, m0, l0),
            jnp.arange(n_dev))
        safe_l = jnp.where(l_run == 0.0, 1.0, l_run)
        return (acc / safe_l[..., None]).astype(q.dtype)

    def ring_fn_flash(q, k, v, q_pos, kv_pos, kv_valid):
        """Flash-kernel blocks merged by logsumexp.  The block relation
        (past / diagonal / future) is decided from the source device of the
        rotating block, so the kernel only ever runs the two static cases
        it has compiled (full and diagonal-causal)."""
        from ..ops.flash_attention import flash_attention_lse

        idx = jax.lax.axis_index(seq_axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        Sl = q.shape[2]

        def full_blk(k_blk, v_blk, val_blk):
            return flash_attention_lse(q, k_blk, v_blk, causal=False,
                                       kv_valid=val_blk)

        def diag_blk(k_blk, v_blk, val_blk):
            return flash_attention_lse(q, k_blk, v_blk, causal=True,
                                       kv_valid=val_blk)

        def none_blk(k_blk, v_blk, val_blk):
            return (jnp.zeros(q.shape, q.dtype),
                    jnp.full(q.shape[:3], -1e30, jnp.float32))

        def step(carry, s):
            k_blk, v_blk, val_blk, acc, lse_run = carry
            src = (idx - s) % n_dev            # block's home device
            if causal:
                case = jnp.where(src == idx, 1, jnp.where(src < idx, 0, 2))
            else:
                case = jnp.zeros((), jnp.int32)
            out_b, lse_b = jax.lax.switch(
                case, (full_blk, diag_blk, none_blk), k_blk, v_blk, val_blk)
            lse_new = jnp.logaddexp(lse_run, lse_b)
            # -1e30 marks "nothing attended"; such terms contribute zero
            w_old = jnp.exp(jnp.minimum(lse_run - lse_new, 0.0)) * (lse_run > -1e29)
            w_new = jnp.exp(jnp.minimum(lse_b - lse_new, 0.0)) * (lse_b > -1e29)
            acc = acc * w_old[..., None] + out_b.astype(jnp.float32) * w_new[..., None]
            k_blk = jax.lax.ppermute(k_blk, seq_axis, perm)
            v_blk = jax.lax.ppermute(v_blk, seq_axis, perm)
            val_blk = jax.lax.ppermute(val_blk, seq_axis, perm)
            return (k_blk, v_blk, val_blk, acc, lse_new), None

        acc0 = jnp.zeros(q.shape[:3] + (Dh,), jnp.float32)
        lse0 = jnp.full(q.shape[:3], -1e30, jnp.float32)
        (k, v, kv_valid, acc, lse), _ = jax.lax.scan(
            step, (k, v, kv_valid, acc0, lse0), jnp.arange(n_dev))
        return acc.astype(q.dtype)

    specs = (P(None, None, seq_axis, None),) * 3 + (
        P(None, seq_axis), P(None, seq_axis), P(None, seq_axis))
    out = jax.shard_map(
        ring_fn_flash if use_flash else ring_fn, mesh=mesh,
        in_specs=specs, out_specs=P(None, None, seq_axis, None),
        check_vma=False,
    )(q, k, v, positions, positions, kv_valid)
    return out
