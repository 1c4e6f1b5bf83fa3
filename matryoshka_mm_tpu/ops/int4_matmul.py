"""Fused int4 dequant-matmul Pallas kernel.

TPU-native replacement for the "dequantize the layer, then GEMM" int4
decode path (the bitsandbytes ``load_4bit`` analog, reference:
llava/model/builder.py:51-60).  The XLA fallback materializes a bf16 copy
of every weight in HBM before the matmul, so int4 decode pays

    read int4 bytes + write bf16 weights + read bf16 weights  ≈ 5x

the traffic of the packed weights and ends up *slower* than int8.  This
kernel streams only the packed bytes HBM->VMEM, splits the two nibbles on
the VPU, feeds the MXU directly, and applies the per-output-channel scale
to the f32 accumulator — bf16 weights never exist anywhere.  End-to-end
7B b1 decode on one v5e chip: 43.5 tok/s unfused -> 95.5 tok/s fused
(int8: 89).

Packing layout (ops/quant.py split-half convention): a ``(N, K/2)`` int8
byte matrix where byte column ``j`` holds input columns ``j`` (low nibble)
and ``j + K/2`` (high nibble) of the logical ``(N, K)`` weight.  The
kernel reads the activation block twice per byte block — once at column
``j*BK`` and once at ``K/2 + j*BK`` — via two BlockSpecs over the same
array, so no nibble interleave/concat shuffle ever happens.

Nibbles are stored in the mixed "e8m" convention (ops/quant.py): low
nibble excess-8, high nibble two's-complement in place.  The split is
then TWO int32 AND ops over four bytes per lane (~0.5 VPU ops/byte) —
``word & 0x0F0F0F0F`` is the excess-8 low half (its constant -8 bias is
linear in the activations and folds into a per-row ``-8 * rowsum(x_lo)``
correction) and ``word & 0xF0F0F0F0`` bitcast to int8 is exactly
``16 * w_hi``, whose 1/16 folds into one scalar multiply on the hi-dot
result.  Rejected alternatives, measured on v5e: int8 vector shifts
(Mosaic: unsupported), int32-widened shift unpack (156 GB/s), f32
floor/fma arithmetic unpack (371 GB/s), both-nibbles-excess-8 with a
third ``(word >> 4) & mask`` op.  Honest A/B of that last one: op-count
arithmetic predicted the 3-op unpack sat at the VPU/DMA crossover, but
on hardware the 2-op e8m form moved end-to-end b1 decode only ~+1.5
tok/s (~157 -> ~158.5) and per-kernel times barely changed — the stream
was
already effectively DMA/overhead-bound, not VPU-bound.  e8m is kept
because it is strictly fewer ops, bit-exact (validated on chip against
dequantize+matmul), and never worse.

Activations stay bf16 (W4A16): the result is bit-identical to
``dequantize_array`` + matmul up to f32 accumulation order (int4 values
are exact in bf16).  An int8-activation variant was measured slower —
Mosaic's int8 MXU path lost to bf16 on these narrow-M shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target bytes per streamed weight block.  Measured on v5e (22016x2048
# packed, in-scan): 256KB blocks -> 385 GB/s, 2MB (2048, 1024) blocks ->
# ~650 GB/s; quantization pads leaves (ops/quant.py pad_int4_leaf) so the
# big-block divisors exist.  VMEM at (2048, 1024): 2MB packed x2 buffers
# + 4MB bf16 nibble temps — fits the 16MB budget.
_BLOCK_BYTES = 2 * 1024 * 1024
# Decode-narrow (bm <= 32) blocks can afford to be bigger: the activation
# and accumulator footprints are tiny, so the packed double-buffers own
# VMEM.  Long-K shapes need this so BK = K/2 blocks (fully contiguous
# half-row DMA spans) aren't rejected: 7B down_proj at (BK 2816, BN 1024)
# measured 44.3 -> 14.3 us/layer vs the strided (512, 4096) blocks
# (scripts/sweep_int4_variants.py, marginal per-layer slope).
# Env overrides (scripts/sweep_decode_blocks.py): read at import time.
# Round-4 sweep on the chip (7B int4 b1 decode, tok/s): 3MB/bk4096 157.3,
# 6MB/bk4096 153.0, 6MB/bk6144 151.4, 12MB/bk6144 148.2 — BIGGER blocks
# regress monotonically (coarser double-buffer granularity: the first
# block's fill and last block's drain stop hiding under compute), and the
# "contiguous full-K down_proj" theory is disproven (the strided 2816-col
# blocks already stream fine).  The defaults below are the measured
# optimum; the envs remain for future sweeps on other parts.
import os as _os

_BLOCK_BYTES_DECODE = int(_os.environ.get("M3_BLOCK_BYTES_DECODE",
                                          3 * 1024 * 1024))
# Max lanes of a full-row decode BK span (7B down_proj full-K is 5632)
_BK_MAX_DECODE = int(_os.environ.get("M3_BK_MAX_DECODE", 4096))
# Scoped-VMEM budget passed to Mosaic (v5e has 128MB physical; the 16MB
# default rejects block shapes whose double-buffers + nibble temps exceed
# it even though they fit comfortably).
_VMEM_LIMIT = 64 * 1024 * 1024
# "mixed" feeds the int8 nibbles straight to dot_general and lets Mosaic
# convert in the MXU feed pipeline — skips the explicit VPU int8->bf16
# convert over every weight element (measured: 5521 -> 5367 us/token at
# 7B int4 decode, identical output).  "bf16" keeps the explicit convert.
_UNPACK = "mixed"


def _pick_bk(khalf: int, bm: int = 256) -> int:
    """Block width over the packed-K axis.

    For decode-narrow row blocks (bm <= 32) prefer BK = the whole packed
    row (or the largest 128-aligned submultiple <= 4096 lanes): a j step
    whose weight DMA is one fully contiguous span beats strided 512-column
    blocks (measured on v5e decode: full-K 5595 -> 5468 us/token at 7B
    int4; half-K on the long-K down_proj 44.3 -> 14.3 us/layer).  The
    working set (packed double-buffer + nibble temps ~ 6*BN*BK bytes)
    only fits VMEM with small row blocks, so prefill keeps the
    1024-column blocks."""
    if bm <= 32 and khalf % 128 == 0:
        for d in (1, 2, 4):
            if khalf % d == 0 and khalf // d <= _BK_MAX_DECODE \
                    and (khalf // d) % 128 == 0:
                return khalf // d
    for c in (1024, 512, 256, 128):
        if khalf % c == 0:
            return c
    return 0


def _pad_rows(x, bm_cap: int = 256):
    """Round activation rows to the bf16 sublane tile, then to a whole
    number of BM-row grid blocks.  Rows beyond ~one block switch the
    kernel to a 3D grid (weights re-streamed once per row block), which
    beats the unfused dequant path up to ~4 row blocks — see
    int4_matmul_eligible."""
    m = x.shape[0]
    mp = -(-m // 16) * 16
    bm = mp if mp <= bm_cap else bm_cap
    mp = -(-mp // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    return x, mp, bm


def _pick_bn(n: int, bk: int, bm: int = 256) -> int:
    cap = _BLOCK_BYTES_DECODE if bm <= 32 else _BLOCK_BYTES
    for c in (2048, 1024, 512, 256, 128):
        if n % c == 0 and c * bk <= cap:
            return c
    return 128 if n % 128 == 0 else 0


def _unpack_block(p_block, interpret: bool):
    """Packed byte block -> (lo_e8, hi16) dot operands.

    e8m layout (ops/quant.py): ``lo_e8`` is the excess-8 low nibble;
    ``hi16`` is the high nibble read IN PLACE as int8, which equals
    exactly ``16 * w_hi`` because that nibble is stored two's-complement
    in the byte's top bits.  The caller folds the 1/16 into one scalar
    multiply on the hi-dot result."""
    if interpret:
        # Portable unpack for the CPU interpreter (pltpu.bitcast reshaping
        # is TPU-only there): arithmetic in f32 on the signed byte.
        c = p_block.astype(jnp.float32)
        cu = jnp.where(c < 0, c + 256.0, c)        # unsigned byte value
        hi_n = jnp.floor(cu * (1.0 / 16.0))        # raw high nibble
        lo_e = cu - 16.0 * hi_n                    # excess-8 low nibble
        hi16 = 16.0 * jnp.where(hi_n >= 8.0, hi_n - 16.0, hi_n)
        return lo_e.astype(jnp.bfloat16), hi16.astype(jnp.bfloat16)
    # Nibble extraction as TWO int32 AND ops over four bytes per lane
    # (~0.5 VPU ops/byte): no shift, no sign-extension select.  The
    # constant -8 bias of the low half is folded into a per-row
    # correction; the high half needs none (two's-complement is exact).
    # The previous both-excess-8 layout cost a third op per word
    # ((word >> 4) & mask); dropping it measured only ~+1.5 tok/s
    # end-to-end (see module docstring) — kept as strictly cheaper.
    pi = pltpu.bitcast(p_block, jnp.int32)         # (BN, BK/4) words
    lo_b = pltpu.bitcast(pi & 0x0F0F0F0F, jnp.int8)
    hi_b = pltpu.bitcast(pi & (-0x0F0F0F10), jnp.int8)   # 0xF0F0F0F0
    if _UNPACK == "bf16":
        lo_b = lo_b.astype(jnp.bfloat16)
        hi_b = hi_b.astype(jnp.bfloat16)
    return lo_b, hi_b


def excess8_part(x_lo, x_hi, p_block, interpret: bool):
    """One grid step of the split-half e8m product, as a single f32
    expression: the low-half excess-8 dot plus its per-row bias fold-out
    (``-8 * sum_k(x_lo)``) plus the high-half dot scaled by 1/16 (the
    stored operand is ``16 * w_hi``; 0.0625 is exact in f32, and scaling
    the f32 dot RESULT keeps every product bit-identical to an unscaled
    ``x_hi @ w_hi``).  Kept in ONE expression — separate ``acc +=``
    statements cost extra scratch read-modify-writes per step.

    The bias term must join the f32 accumulator (not the bf16 output):
    the biased dot is ~8*sum(x) larger than the result, so a post-cast
    correction would cancel catastrophically in bf16.  Measured on v5e:
    hoisting it OUT of the kernel into XLA-side ops was ~1% slower
    end-to-end (the extra small ops between kernels cost more than the
    in-kernel VPU reduction, which hides under the weight DMA)."""
    lo_b, hi_b = _unpack_block(p_block, interpret)
    dn = (((1,), (1,)), ((), ()))
    return (jax.lax.dot_general(x_lo, lo_b, dn,
                                preferred_element_type=jnp.float32)
            + 0.0625 * jax.lax.dot_general(x_hi, hi_b, dn,
                                           preferred_element_type=jnp.float32)
            - 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1,
                            keepdims=True))


def _kernel(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref, acc_ref, *,
            n_j: int, interpret: bool = False, j_axis: int = 1):
    j = pl.program_id(j_axis)
    part = excess8_part(x_lo_ref[:], x_hi_ref[:], p_ref[:], interpret)
    if n_j == 1:
        # full-K block: no accumulation across steps — write the output
        # directly, the scratch accumulator is never touched
        o_ref[:] = (part * s_ref[:]).astype(o_ref.dtype)
        return

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] += part

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                *, interpret: bool = False) -> jnp.ndarray:
    """``x (M, K) @ dequant(packed (N, K/2), scale (N, 1)).T -> (M, N)``.

    M is padded to the bf16 sublane tile internally; use
    :func:`int4_matmul_eligible` before calling.
    """
    M, K = x.shape
    N, Khalf = packed.shape
    x, Mp, BM = _pad_rows(x.astype(jnp.bfloat16))
    BK = _pick_bk(Khalf, BM)
    BN = _pick_bn(N, BK, BM)
    n_j = Khalf // BK

    out = pl.pallas_call(
        functools.partial(_kernel, n_j=n_j, interpret=interpret, j_axis=2),
        grid=(Mp // BM, N // BN, n_j),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, j: (m, j)),
            pl.BlockSpec((BM, BK), lambda m, n, j, _nj=n_j: (m, j + _nj)),
            pl.BlockSpec((BN, BK), lambda m, n, j: (n, j)),
            pl.BlockSpec((1, BN), lambda m, n, j: (0, n)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, j: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, packed, scale.reshape(1, N).astype(jnp.float32))
    return out[:M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_stacked(x: jnp.ndarray, packed: jnp.ndarray,
                        scale: jnp.ndarray, layer_idx: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """Layer-indexed fused matmul over a stacked ``(L, N, K/2)`` leaf.

    Inside a ``lax.scan`` over decoder layers, slicing the stacked weight
    (``packed[l]``) before a pallas_call makes XLA materialize the slice —
    a full extra HBM read+write per layer that tripled decode traffic
    (measured: 210 GB/s effective vs ~700 isolated).  Instead the whole
    stacked array is bound as one operand and the *scalar-prefetched*
    layer index steers the BlockSpec index_map, so the kernel DMAs blocks
    straight out of layer ``l`` with no intermediate copy.
    """
    M, K = x.shape
    L, N, Khalf = packed.shape
    x, Mp, BM = _pad_rows(x.astype(jnp.bfloat16))
    BK = _pick_bk(Khalf, BM)
    BN = _pick_bn(N, BK, BM)
    n_j = Khalf // BK
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def kernel(idx_ref, x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref, acc_ref):
        del idx_ref
        _kernel(x_lo_ref.at[0], x_hi_ref.at[0], p_ref.at[0], s_ref.at[0],
                o_ref.at[0], acc_ref, n_j=n_j, interpret=interpret,
                j_axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM, N // BN, n_j),
        in_specs=[
            pl.BlockSpec((1, BM, BK), lambda m, n, j, idx: (0, m, j)),
            pl.BlockSpec((1, BM, BK),
                         lambda m, n, j, idx, _nj=n_j: (0, m, j + _nj)),
            pl.BlockSpec((1, BN, BK), lambda m, n, j, idx: (idx[0], n, j)),
            pl.BlockSpec((1, 1, BN), lambda m, n, j, idx: (idx[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((1, BM, BN), lambda m, n, j, idx: (0, m, n)),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Mp, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx, x[None], x[None], packed,
      scale.reshape(L, 1, N).astype(jnp.float32))
    return out[0, :M]


# ---------------------------------------------------------------------------
# int8 variants — same streaming/block design minus the nibble split: one
# int8->bf16 convert per weight (half the convert work of int4 per byte,
# but twice the bytes).  Replaces XLA's unfused dequant+matmul for decode.
# ---------------------------------------------------------------------------

def _kernel8(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_j: int,
             j_axis: int = 1, interpret: bool = False):
    j = pl.program_id(j_axis)

    w = q_ref[:]
    if _UNPACK == "bf16" or interpret:
        # XLA (interpret mode) requires matching dot operand types; Mosaic
        # accepts the int8 operand and converts in the MXU feed (_UNPACK)
        w = w.astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if n_j == 1:
        o_ref[:] = (part * s_ref[:]).astype(o_ref.dtype)
        return

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] += part

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                *, interpret: bool = False) -> jnp.ndarray:
    """``x (M, K) @ (q (N, K) * scale (N, 1)).T -> (M, N)`` fused."""
    M, K = x.shape
    N, _ = q.shape
    x, Mp, BM = _pad_rows(x.astype(jnp.bfloat16))
    BK = _pick_bk(K, BM)
    BN = _pick_bn(N, BK, BM)
    n_j = K // BK

    out = pl.pallas_call(
        functools.partial(_kernel8, n_j=n_j, j_axis=2,
                          interpret=interpret),
        grid=(Mp // BM, N // BN, n_j),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, j: (m, j)),
            pl.BlockSpec((BN, BK), lambda m, n, j: (n, j)),
            pl.BlockSpec((1, BN), lambda m, n, j: (0, n)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, j: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, q, scale.reshape(1, N).astype(jnp.float32))
    return out[:M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul_stacked(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        layer_idx: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """Layer-indexed fused int8 matmul over a stacked ``(L, N, K)`` leaf
    (scalar-prefetched index, same rationale as int4_matmul_stacked)."""
    M, K = x.shape
    L, N, _ = q.shape
    x, Mp, BM = _pad_rows(x.astype(jnp.bfloat16))
    BK = _pick_bk(K, BM)
    BN = _pick_bn(N, BK, BM)
    n_j = K // BK
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def kernel(idx_ref, x_ref, q_ref, s_ref, o_ref, acc_ref):
        del idx_ref
        _kernel8(x_ref.at[0], q_ref.at[0], s_ref.at[0], o_ref.at[0],
                 acc_ref, n_j=n_j, j_axis=2, interpret=interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM, N // BN, n_j),
        in_specs=[
            pl.BlockSpec((1, BM, BK), lambda m, n, j, idx: (0, m, j)),
            pl.BlockSpec((1, BN, BK), lambda m, n, j, idx: (idx[0], n, j)),
            pl.BlockSpec((1, 1, BN), lambda m, n, j, idx: (idx[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((1, BM, BN), lambda m, n, j, idx: (0, m, n)),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Mp, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx, x[None], q, scale.reshape(L, 1, N).astype(jnp.float32))
    return out[0, :M]


def int4_matmul_eligible(x_2d_rows: int, packed_shape, *,
                        max_rows: int = 1024) -> bool:
    """Row blocks beyond the first re-stream the weights once each, so
    the fused path wins until ~4 blocks (1024 rows): int4 prefill traffic
    is n_blocks x packed bytes vs the unfused path's read-packed +
    write-bf16 + read-bf16 (~9x packed bytes).  Beyond that, fall back
    to dequant+GEMM, which amortizes over many rows."""
    if len(packed_shape) != 2:
        return False
    N, Khalf = packed_shape
    bm = min(-(-x_2d_rows // 16) * 16, 256)
    bk = _pick_bk(Khalf, bm)
    return (x_2d_rows <= max_rows and bk > 0 and _pick_bn(N, bk, bm) > 0)
