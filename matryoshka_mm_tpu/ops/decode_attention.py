"""Flash-decode attention: single-token queries against a KV cache.

The XLA path for decode attention (one fused QK^T kernel + one fused PV
kernel per layer) reads the per-layer cache slice twice at ~450 GB/s
effective — the narrow per-head matvecs don't tile onto the MXU
(reference hot loop this replaces: HF decode attention inside
llava/model/language_model/llava_llama.py generate).  This kernel streams
each cache block once and keeps the MXU busy with a deliberate
over-compute trick:

* the cache stays in its native ``(B, S, n_kv, Dh)`` layout — no
  (B, n_kv, S, Dh) transpose anywhere;
* a KV block ``(BS, n_kv, Dh)`` is viewed as ``(BS*n_kv, Dh)`` (a
  layout-no-op merge of major dims) and hit with ONE
  ``(H, Dh) @ (Dh, BS*n_kv)`` MXU matmul — every query head against
  every kv head.  That is n_kv x more FLOPs than needed, but it turns
  H*BS matvecs into one dense matmul that overlaps the block DMA;
* the online softmax runs directly over the FLAT (H, BS*n_kv) logits:
  the GQA diagonal mask (built from 2D iotas, no gathers) NEG_INFs the
  cross-head products, so they contribute exp(..)=0 to the denominator
  and the PV matmul ``P_flat @ V_flat`` needs no spreading — masked
  probabilities are already zero.  Each valid (head, slot) pair appears
  exactly once per row, so the flat softmax equals the per-slot softmax;
* causality/validity masks arrive as n_kv-repeated flat rows
  (``jnp.repeat`` outside the kernel — tiny), sliced per block inside.

Numerics match ops/attention.attention_reference: f32 logits and
accumulation, probabilities cast to v.dtype for the PV matmul (the
reference einsum does the same), absolute-position causality, kv_valid,
sliding window.  MPT's alibi bias is not supported here — its decode
routes through the reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF


def _pick_bs(S: int) -> int:
    for c in (256, 128, 64, 32, 16, 8):
        if S % c == 0:
            return c
    return 0


def _kernel(q_ref, k_ref, v_ref, validf_ref, kvposf_ref, qpos_ref,
            *refs, n_j: int, scale: float, group: int, window,
            kv_int8: bool = False, interpret: bool = False):
    if kv_int8:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    H, Dh = q_ref.shape[1], q_ref.shape[2]
    BS, Hkv = k_ref.shape[1], k_ref.shape[2]
    F = BS * Hkv

    q = q_ref[0].astype(jnp.float32)                       # (H, Dh)
    kf = k_ref[0].reshape(F, Dh)                           # flat kv rows
    if kv_int8:
        # int8 K rows feed the MXU directly (mixed feed); the per-row
        # dequant scale distributes onto the logits as a column vector:
        # sum_d q*k_i8*s == (q @ k_i8^T) * s
        if interpret:
            kf = kf.astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            (q * scale).astype(jnp.bfloat16), kf,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits *= ks_ref[0, 0, pl.ds(j * F, F)][None, :]
    else:
        logits = jax.lax.dot_general(
            q * scale, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (H, F)

    # masks — all elementwise on the flat axis (col // Hkv = slot,
    # col % Hkv = kv head), no gathers
    qpos = qpos_ref[0, 0, 0]
    kvposf = kvposf_ref[0, 0, pl.ds(j * F, F)]             # (F,)
    okf = validf_ref[0, 0, pl.ds(j * F, F)] & (kvposf <= qpos)
    if window is not None:
        okf &= (qpos - kvposf) < window
    row = jax.lax.broadcasted_iota(jnp.int32, (H, F), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, F), 1)
    gqa = (col % Hkv) == (row // group)
    logits = jnp.where(gqa & okf[None, :], logits, NEG_INF)

    # online softmax over the flat axis
    m_prev = m_ref[:, 0:1]                                 # (H, 1)
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                            # (H, F)
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1,
                                                    keepdims=True)
    m_ref[:, 0:1] = m_new

    if kv_int8:
        # fold the per-row V scale into the probabilities.  The PV matmul
        # contracts over the int8 operand's MAJOR dim, which Mosaic's
        # mixed int8 feed can't take directly — convert V to bf16 on the
        # VPU first (int8 in [-127,127] is exact in bf16; the HBM read
        # was still half-width, which is where the savings are)
        vf = v_ref[0].reshape(F, Dh).astype(jnp.bfloat16)
        p_in = (p * vs_ref[0, 0, pl.ds(j * F, F)][None, :]
                ).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p_in, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0].reshape(F, Dh),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == n_j - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sliding_window", "interpret"))
def flash_decode_attention(
    q: jnp.ndarray,             # (B, H, Dh) one query token per row
    k: jnp.ndarray,             # (B, S, n_kv, Dh) cache layout
    v: jnp.ndarray,             # (B, S, n_kv, Dh)
    kv_valid: jnp.ndarray,      # (B, S) bool
    kv_positions: jnp.ndarray,  # (B, S) int32
    q_positions: jnp.ndarray,   # (B,) int32 absolute position of the query
    *,
    sliding_window=None,
    k_scale=None,               # (B, S, n_kv) f32 — int8 KV cache scales
    v_scale=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, H, Dh) attention output in q.dtype."""
    B, H, Dh = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    BS = _pick_bs(S)
    if BS == 0:
        raise ValueError(f"S={S} not divisible into lane-aligned blocks")
    n_j = S // BS
    group = H // Hkv
    kv_int8 = k.dtype == jnp.int8

    # n_kv-repeated flat masks: flat index s*Hkv + j maps to slot s
    valid_flat = jnp.repeat(kv_valid, Hkv, axis=1)             # (B, S*Hkv)
    kvpos_flat = jnp.repeat(kv_positions.astype(jnp.int32), Hkv, axis=1)

    flat_spec = pl.BlockSpec((1, 1, S * Hkv), lambda b, j: (b, 0, 0))
    in_specs = [
        pl.BlockSpec((1, H, Dh), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, BS, Hkv, Dh), lambda b, j: (b, j, 0, 0)),
        pl.BlockSpec((1, BS, Hkv, Dh), lambda b, j: (b, j, 0, 0)),
        # unit middle dim: a (1, N) block on a (B, N) array violates
        # the sublane rule when B > 1; (1, 1, N) blocks always comply
        flat_spec,
        flat_spec,
        pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0)),
    ]
    operands = [q, k, v, valid_flat[:, None, :], kvpos_flat[:, None, :],
                q_positions.astype(jnp.int32).reshape(B, 1, 1)]
    if kv_int8:
        in_specs += [flat_spec, flat_spec]
        operands += [k_scale.reshape(B, 1, S * Hkv).astype(jnp.float32),
                     v_scale.reshape(B, 1, S * Hkv).astype(jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_kernel, n_j=n_j, scale=Dh ** -0.5,
                          group=group, window=sliding_window,
                          kv_int8=kv_int8, interpret=interpret),
        grid=(B, n_j),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, Dh), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),   # running max (col 0)
            pltpu.VMEM((H, 128), jnp.float32),   # running denom (col 0)
            pltpu.VMEM((H, Dh), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return out


@functools.partial(jax.jit,
                   static_argnames=("sliding_window", "interpret"))
def flash_decode_attention_stacked(
    q: jnp.ndarray,             # (B, H, Dh)
    k_all: jnp.ndarray,         # (L, B, S, n_kv, Dh) full stacked cache
    v_all: jnp.ndarray,         # (L, B, S, n_kv, Dh)
    layer_idx: jnp.ndarray,     # scalar i32
    kv_valid: jnp.ndarray,      # (B, S) bool
    kv_positions: jnp.ndarray,  # (B, S) int32
    q_positions: jnp.ndarray,   # (B,) int32
    *,
    sliding_window=None,
    k_scale=None,               # (L, B, S, n_kv) f32 — int8 KV scales
    v_scale=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Layer-indexed variant over the stacked KV cache.

    Slicing ``k_all[l]`` before a pallas_call makes XLA materialize the
    (B, S, n_kv, Dh) slice — a full extra HBM write+read per layer that
    costs more than the attention itself (measured 306 us/token at 7B
    decode).  The scalar-prefetched layer index steers the BlockSpec so
    blocks DMA straight out of layer ``l`` (same design as
    ops/int4_matmul.int4_matmul_stacked)."""
    B, H, Dh = q.shape
    S, Hkv = k_all.shape[2], k_all.shape[3]
    BS = _pick_bs(S)
    if BS == 0:
        raise ValueError(f"S={S} not divisible into lane-aligned blocks")
    n_j = S // BS
    group = H // Hkv

    valid_flat = jnp.repeat(kv_valid, Hkv, axis=1)
    kvpos_flat = jnp.repeat(kv_positions.astype(jnp.int32), Hkv, axis=1)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kv_int8 = k_all.dtype == jnp.int8

    def kernel(idx_ref, q_ref, k_ref, v_ref, validf_ref, kvposf_ref,
               qpos_ref, *refs):
        del idx_ref
        if kv_int8:
            ks_ref, vs_ref = refs[0].at[0], refs[1].at[0]
            rest = (ks_ref, vs_ref) + refs[2:]
        else:
            rest = refs
        _kernel(q_ref, k_ref.at[0], v_ref.at[0], validf_ref, kvposf_ref,
                qpos_ref, *rest, n_j=n_j,
                scale=Dh ** -0.5, group=group, window=sliding_window,
                kv_int8=kv_int8, interpret=interpret)

    flat_spec = pl.BlockSpec((1, 1, S * Hkv), lambda b, j, idx: (b, 0, 0))
    in_specs = [
        pl.BlockSpec((1, H, Dh), lambda b, j, idx: (b, 0, 0)),
        pl.BlockSpec((1, 1, BS, Hkv, Dh),
                     lambda b, j, idx: (idx[0], b, j, 0, 0)),
        pl.BlockSpec((1, 1, BS, Hkv, Dh),
                     lambda b, j, idx: (idx[0], b, j, 0, 0)),
        flat_spec,
        flat_spec,
        pl.BlockSpec((1, 1, 1), lambda b, j, idx: (b, 0, 0)),
    ]
    operands = [q, k_all, v_all, valid_flat[:, None, :],
                kvpos_flat[:, None, :],
                q_positions.astype(jnp.int32).reshape(B, 1, 1)]
    if kv_int8:
        L = k_all.shape[0]
        lflat = pl.BlockSpec((1, 1, 1, S * Hkv),
                             lambda b, j, idx: (idx[0], b, 0, 0))
        in_specs += [lflat, lflat]
        operands += [
            k_scale.reshape(L, B, 1, S * Hkv).astype(jnp.float32),
            v_scale.reshape(L, B, 1, S * Hkv).astype(jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_j),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, Dh), lambda b, j, idx: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(idx, *operands)
    return out
