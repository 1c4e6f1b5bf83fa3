"""Pallas paged-attention decode kernel.

Companion to serve/paged_cache.py: single-token decode attention that reads
each request's KV **pages in place** instead of materializing a gathered
contiguous copy (which doubles HBM traffic).  The page table rides the
grid as a scalar-prefetch operand, so each grid step's BlockSpec index_map
looks up the physical page to DMA — the PrefetchScalarGridSpec pattern.

Grid: (B, n_pages_per_row); the page axis is innermost, so the per-row
online-softmax state (f32 accumulator, running max/sum) lives in VMEM
scratch across a row's pages, exactly like the flash kernel's kv axis.

GQA (Hkv < H, e.g. Mistral) is handled *inside* the kernel: queries are
shaped (B, Hkv, G, Dh) and every dot batches over the kv head with the
group folded into the left matrix — the page pools are never expanded, so
KV HBM traffic stays 1x regardless of the group size (the reference pays
the expansion via torch's repeat_kv; here it would multiply the pool
read per step per layer).

Scope: full causal attention over the row (no sliding-window clipping —
Mistral's 4096 window only matters for rows longer than the window, far
beyond typical paged-pool capacities; the dense path handles those).

int8-KV layout notes (advisor round 3):

* the flat per-slot scale blocks are ``(1, 1, page_size*Hkv)`` — that
  lane dim must fill whole 128-lane registers, so int8 pools require
  ``page_size * Hkv % 128 == 0`` (checked at trace time on TPU; tiny
  interpret-mode test configs are exempt because XLA-CPU accepts any
  lane width);
* the flat int8 QK/PV dots compute ``(Hkv*G*S) x (page*Hkv)`` products —
  an Hkv-fold MXU over-compute versus the batched bf16 path (32x for
  Hkv=32 models).  Decode is HBM-bound, so the extra FLOPs hide under
  the half-width page reads for ``S = 1..k+1`` at serving shapes; if a
  future caller drives large S (long verify blocks) the compute crosses
  over roughly when ``S * Hkv`` approaches ``page_size`` — reshape the
  scales to (page, Hkv) inside the kernel (Mosaic permitting) before
  widening that path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _check_int8_layout(page_size: int, Hkv: int) -> None:
    """int8 pools load their per-slot scales as flat (1, 1, page*Hkv)
    blocks whose lane dim must fill whole 128-lane registers.  Mosaic
    rejects sub-128 lane widths on real TPUs while interpret mode accepts
    them — so a misconfigured pool (small page_size x Hkv) would pass CPU
    tests and die at Mosaic compile on hardware.  Fail loudly at trace
    time instead (interpret-mode tiny test configs stay exempt)."""
    if not _interpret() and (page_size * Hkv) % 128 != 0:
        raise ValueError(
            f"int8 paged KV needs page_size*Hkv divisible by 128, got "
            f"page_size={page_size} x Hkv={Hkv} = {page_size * Hkv}; "
            f"raise page_size (serve --page-size) or use bf16 KV")


def _kernel(tables_ref, row_len_ref,           # scalar prefetch
            q_ref, k_ref, v_ref, *refs, page_size: int, num_pages: int,
            scale: float, kv_int8: bool = False,
            interpret: bool = False):
    if kv_int8:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = refs
    else:
        ks_ref = vs_ref = None
        out_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = row_len_ref[b] + 1               # includes the new token
    # pages beyond the row's length contribute nothing
    run = p * page_size < seq_len

    @pl.when(run)
    def _compute():
        q = q_ref[0]                           # (Hkv, G, Dh)
        k = k_ref[0]                           # (page, Hkv, Dh) — unexpanded
        v = v_ref[0]
        Hkv, GS, Dh = q.shape

        if kv_int8:
            # int8 pages.  The per-(slot, head) f32 scales CANNOT be
            # loaded as a (page, Hkv) block — Hkv (32) is a sub-128 lane
            # dim and Mosaic rejects the memref slice (caught on real
            # hardware by scripts/tpu_kernel_check.py; interpret mode
            # accepts it).  So the int8 path runs FLAT, exactly like
            # ops/decode_attention.py: the page block is viewed as
            # (page*Hkv, Dh) rows, one (R, Dh) x (Dh, page*Hkv) MXU
            # matmul computes every query row against every kv row, the
            # GQA diagonal mask NEG_INFs the cross-head products, and the
            # scales arrive as lane-aligned flat (1, 1, page*Hkv) blocks
            # multiplied onto the flat logits/probabilities.
            R = Hkv * GS
            F = page_size * Hkv
            qf = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            qf = qf.reshape(R, Dh)
            kf = k.reshape(F, Dh)              # int8 rows, slot-major
            vf = v.reshape(F, Dh).astype(jnp.bfloat16)
            if interpret:
                kf = kf.astype(jnp.bfloat16)   # mixed int8 feed is TPU-only
            s = jax.lax.dot_general(
                qf, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (R, F)
            s = s * ks_ref[0, 0][None, :]      # K dequant scale, per column

            # flat col f: slot t = f // Hkv, kv head = f % Hkv;
            # flat row r: kv head = r // GS
            row = jax.lax.broadcasted_iota(jnp.int32, (R, F), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, F), 1)
            pos = p * page_size + col // Hkv
            mask = ((col % Hkv) == (row // GS)) & (pos < seq_len)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[:, :, 0:1].reshape(R, 1)
            l_prev = l_ref[:, :, 0:1].reshape(R, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pexp = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_new = l_prev * alpha + jnp.sum(pexp, axis=1, keepdims=True)
            # fold the V dequant scale into the probabilities (masked
            # entries are exactly 0, so cross-head products drop out and
            # the PV matmul needs no spreading)
            pv = jax.lax.dot_general(
                (pexp * vs_ref[0, 0][None, :]).astype(jnp.bfloat16), vf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (R, Dh)
            acc = acc_ref[:].reshape(R, Dh) * alpha + pv
            acc_ref[:] = acc.reshape(Hkv, GS, Dh)
            m_ref[:] = jnp.broadcast_to(m_new.reshape(Hkv, GS, 1),
                                        m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new.reshape(Hkv, GS, 1),
                                        l_ref.shape)
            return

        # bf16 pages: s[kh, g, t] = q[kh, g] . k[t, kh] — batched over kv
        # heads, the query group rides as the left matrix rows
        # (MXU-friendly, no over-compute)
        s = jax.lax.dot_general(
            q, k.transpose(1, 0, 2),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (Hkv, G*S, page)

        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + p * page_size
        mask = idx < seq_len
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :, 0:1]
        l_prev = l_ref[:, :, 0:1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s - m_new)
        pexp = jnp.where(mask, pexp, 0.0)
        l_new = l_prev * alpha + jnp.sum(pexp, axis=2, keepdims=True)

        # out[kh, g, d] += p[kh, g, t] v[t, kh, d]
        pv = jax.lax.dot_general(
            pexp.astype(v.dtype), v.transpose(1, 0, 2),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (Hkv, G, Dh)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == num_pages - 1)
    def _finalize():
        l = l_ref[:, :, 0:1]
        safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / safe).astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,             # (B, H, Dh) current-token queries
    k_pages: jnp.ndarray,       # (n_pages, page, Hkv, Dh)
    v_pages: jnp.ndarray,
    page_tables: jnp.ndarray,   # (B, P) int32 physical page per logical slot
    row_len: jnp.ndarray,       # (B,) tokens already stored (excl. current)
    k_scale=None,               # (n_pages, page, Hkv) f32 — int8 KV scales
    v_scale=None,
) -> jnp.ndarray:
    """Online-softmax attention over each row's pages; returns (B, H, Dh)."""
    B, H, Dh = q.shape
    n_pages, page_size, Hkv, _ = k_pages.shape
    P = page_tables.shape[1]
    scale = Dh ** -0.5
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, Dh)
    kv_int8 = k_pages.dtype == jnp.int8
    if kv_int8:
        _check_int8_layout(page_size, Hkv)

    page_spec = pl.BlockSpec((1, page_size, Hkv, Dh),
                             lambda b, p, tbl, rl: (tbl[b, p], 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, Hkv, G, Dh), lambda b, p, tbl, rl: (b, 0, 0, 0)),
        page_spec,
        page_spec,
    ]
    operands = [qg, k_pages, v_pages]
    if kv_int8:
        # flat (n_pages, 1, page*Hkv) layout: the kernel multiplies the
        # scales onto flat logits, and the lane dim (page*Hkv) is
        # 128-aligned — a (page, Hkv) block is not loadable on TPU
        sc_spec = pl.BlockSpec((1, 1, page_size * Hkv),
                               lambda b, p, tbl, rl: (tbl[b, p], 0, 0))
        in_specs += [sc_spec, sc_spec]
        operands += [
            k_scale.astype(jnp.float32).reshape(n_pages, 1,
                                                page_size * Hkv),
            v_scale.astype(jnp.float32).reshape(n_pages, 1,
                                                page_size * Hkv)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, P),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, Dh),
                               lambda b, p, tbl, rl: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, Dh), jnp.float32),
            pltpu.VMEM((Hkv, G, 128), jnp.float32),
            pltpu.VMEM((Hkv, G, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, page_size=page_size, num_pages=P,
                               scale=scale, kv_int8=kv_int8,
                               interpret=_interpret())
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dh), q.dtype),
        interpret=_interpret(),
    )(page_tables.astype(jnp.int32), row_len.astype(jnp.int32), *operands)
    return out.reshape(B, H, Dh)


def paged_decode_attention_stacked(
    q: jnp.ndarray,             # (B, H, Dh) current-token queries
    k_all: jnp.ndarray,         # (L, n_pages, page, Hkv, Dh) stacked pools
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,     # scalar i32
    page_tables: jnp.ndarray,   # (B, P) int32
    row_len: jnp.ndarray,       # (B,)
    k_scale=None,               # (L, n_pages, page, Hkv) f32 — int8 KV
    v_scale=None,
) -> jnp.ndarray:
    """Layer-indexed variant over the stacked page pools.

    Slicing ``k_all[l]`` before the pallas_call makes XLA materialize the
    whole per-layer pool (every page, not just this batch's rows) — the
    scalar-prefetched layer index steers the page BlockSpec straight into
    layer ``l`` instead (same rationale as
    ops/decode_attention.flash_decode_attention_stacked)."""
    B, H, Dh = q.shape
    _, n_pages, page_size, Hkv, _ = k_all.shape
    P = page_tables.shape[1]
    scale = Dh ** -0.5
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, Dh)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kv_int8 = k_all.dtype == jnp.int8
    if kv_int8:
        _check_int8_layout(page_size, Hkv)

    def kernel(idx_ref, tables_ref, row_len_ref, q_ref, k_ref, v_ref,
               *refs):
        del idx_ref
        if kv_int8:
            ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = refs
            extra = (ks_ref.at[0], vs_ref.at[0])
        else:
            out_ref, acc_ref, m_ref, l_ref = refs
            extra = ()
        _kernel(tables_ref, row_len_ref, q_ref, k_ref.at[0], v_ref.at[0],
                *extra, out_ref, acc_ref, m_ref, l_ref,
                page_size=page_size, num_pages=P, scale=scale,
                kv_int8=kv_int8, interpret=_interpret())

    page_spec = pl.BlockSpec(
        (1, 1, page_size, Hkv, Dh),
        lambda b, p, idx, tbl, rl: (idx[0], tbl[b, p], 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, Hkv, G, Dh),
                     lambda b, p, idx, tbl, rl: (b, 0, 0, 0)),
        page_spec,
        page_spec,
    ]
    operands = [qg, k_all, v_all]
    if kv_int8:
        # lane-aligned flat scales — see paged_decode_attention
        sc_spec = pl.BlockSpec(
            (1, 1, 1, page_size * Hkv),
            lambda b, p, idx, tbl, rl: (idx[0], tbl[b, p], 0, 0))
        in_specs += [sc_spec, sc_spec]
        L = k_all.shape[0]
        operands += [
            k_scale.astype(jnp.float32).reshape(L, n_pages, 1,
                                                page_size * Hkv),
            v_scale.astype(jnp.float32).reshape(L, n_pages, 1,
                                                page_size * Hkv)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, P),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, Dh),
                               lambda b, p, idx, tbl, rl: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, Dh), jnp.float32),
            pltpu.VMEM((Hkv, G, 128), jnp.float32),
            pltpu.VMEM((Hkv, G, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dh), q.dtype),
        interpret=_interpret(),
    )(idx, page_tables.astype(jnp.int32), row_len.astype(jnp.int32),
      *operands)
    return out.reshape(B, H, Dh)
