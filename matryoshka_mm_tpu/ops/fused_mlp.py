"""Single-kernel quantized decode MLP: gate/up -> silu·mul -> down.

The decode loop's per-token cost is dominated by streaming the quantized
weights once per token; profiling the int4 7B b1 decode (64-token chunk,
v5e) shows each of the four per-layer ``pallas_call`` invocations pays a
~6-10us pipeline fill/drain on top of its byte stream — the gate/up and
down projections alone burn ~2x9us x 32 layers ≈ 0.6ms/token of pure
launch overhead, plus the XLA ``silu(gate)*up`` fusion between them.

This kernel runs the whole MLP as ONE grid: phase 1 streams the fused
gate/up packed blocks (``ops/quant.py _fuse_layer_projections`` layout —
gate rows then up rows) and writes f32 strips into a VMEM scratch; at the
phase boundary it forms ``h = silu(gate) * up`` in VMEM (never touching
HBM) laid out in the down-projection's split-half padded geometry; phase
2 streams the down packed blocks against ``h``.  The down weights' first
block is prefetched *during* phase 1 (its BlockSpec index map is constant
until the phase flips, so Mosaic's double-buffering has it resident when
phase 2 starts) — the gate/up -> down boundary costs no DMA bubble.

Replaces (for decode-narrow row counts) the two ``int4_matmul_stacked`` /
``int8_matmul_stacked`` calls + XLA elementwise that ``models/llama.py``
``_layer_forward`` otherwise issues.  Rounding differs from the unfused
pair at ONE point: the unfused path rounds ``gate`` and ``up`` each to
bf16 at its kernel boundary before ``silu(g)*u``, while this kernel keeps
the gate/up strips in f32 scratch and rounds only ``h = silu(g)*u`` to
bf16 before the down dot — strictly tighter numerics, but NOT bit-exact
vs the unfused pair whenever g or u is not bf16-representable.  The
nibble unpack and excess-8 bias correction mirror ops/int4_matmul.py —
a numerics fix there must land here too.

A further phase-fusion (o_proj + residuals + norms folded into the same
grid, plus a norm+qkv companion) was built in round 3, hardware-validated
in round 4, and DELETED: token-exact but zero end-to-end gain in two
measurement rounds — see docs/Architecture.md "negative results".

Reference analog: the CUDA path fuses nothing here — bitsandbytes
dequantizes per-matmul (llava/model/builder.py:51-60); this design is
TPU-native (one sequential grid, scalar-prefetched layer index, VMEM
accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int4_matmul import _VMEM_LIMIT, _pick_bk, _pick_bn

_DN = (((1,), (1,)), ((), ()))


def _unpack4(p_block, interpret: bool):
    """Packed int4 block -> (lo_e8, hi16) operands (e8m layout).

    TPU: TWO int32 AND ops over four bytes per lane, nibbles fed to the
    MXU as int8 ("mixed" feed); the high nibble reads in place as
    ``16 * w_hi`` — see ops/int4_matmul.py.  Interpreter: portable f32
    arithmetic unpack (bitcast reshaping is TPU-only)."""
    if interpret:
        c = p_block.astype(jnp.float32)
        cu = jnp.where(c < 0, c + 256.0, c)
        hi_n = jnp.floor(cu * (1.0 / 16.0))
        hi16 = 16.0 * jnp.where(hi_n >= 8.0, hi_n - 16.0, hi_n)
        return (cu - 16.0 * hi_n).astype(jnp.bfloat16), hi16.astype(jnp.bfloat16)
    pi = pltpu.bitcast(p_block, jnp.int32)
    lo = pltpu.bitcast(pi & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast(pi & (-0x0F0F0F10), jnp.int8)     # 0xF0F0F0F0
    return lo, hi


def _dot4(xl, xh, p_block, interpret: bool):
    """f32 block product of the split-half activations with a packed int4
    block: excess-8 bias of the low half folded as the per-row correction,
    hi dot scaled by the exact 1/16 (see ``ops/int4_matmul.py
    excess8_part`` — hoisting the correction into XLA-side ops measured
    ~1% slower end-to-end; the in-kernel reduction hides under the weight
    DMA)."""
    lo, hi = _unpack4(p_block, interpret)
    return (jax.lax.dot_general(xl, lo, _DN,
                                preferred_element_type=jnp.float32)
            + 0.0625 * jax.lax.dot_general(xh, hi, _DN,
                                           preferred_element_type=jnp.float32)
            - 8.0 * jnp.sum(xl.astype(jnp.float32), axis=1,
                            keepdims=True))


def _dot8(x, q_block, interpret: bool):
    w = q_block.astype(jnp.bfloat16) if interpret else q_block
    return jax.lax.dot_general(x, w, _DN, preferred_element_type=jnp.float32)


def _mlp_kernel(idx_ref, xl_ref, xh_ref, gup_ref, gus_ref, dnp_ref, dns_ref,
                o_ref, gu_ref, h_ref, acc_ref, *,
                bits: int, n_gu: int, bn_gu: int, n_dn_j: int, bk_dn: int,
                i_orig: int, kh_dn: int, kh_dn_orig: int,
                interpret: bool):
    del idx_ref
    t = pl.program_id(0)

    # ---- phase 1: gate/up strip t (full-K, one j step per strip) ----
    @pl.when(t < n_gu)
    def _():
        if bits == 4:
            v = _dot4(xl_ref[0], xh_ref[0], gup_ref[0], interpret)
        else:
            v = _dot8(xl_ref[0], gup_ref[0], interpret)
        gu_ref[:, pl.dslice(t * bn_gu, bn_gu)] = v * gus_ref[0]

    # ---- boundary: h = silu(gate) * up, laid out in the down
    # projection's (possibly padded) split-half input geometry ----
    @pl.when(t == n_gu)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        g = gu_ref[:, :i_orig]
        u = gu_ref[:, i_orig:2 * i_orig]
        h = (jax.nn.silu(g) * u).astype(h_ref.dtype)
        if bits == 4:
            # split-half: byte col j of the down leaf holds logical inputs
            # (j, j + K/2); padded cols decode to 0 so zeros stay exact
            h_ref[:, :kh_dn_orig] = h[:, :kh_dn_orig]
            h_ref[:, kh_dn:kh_dn + kh_dn_orig] = h[:, kh_dn_orig:i_orig]
        else:
            h_ref[:, :i_orig] = h

    # ---- phase 2: down projection, j-accumulated per output block ----
    @pl.when(t >= n_gu)
    def _():
        jd = (t - n_gu) % n_dn_j
        if bits == 4:
            xl = h_ref[:, pl.dslice(jd * bk_dn, bk_dn)]
            xh = h_ref[:, pl.dslice((jd + n_dn_j) * bk_dn, bk_dn)]
            part = _dot4(xl, xh, dnp_ref[0], interpret)
        else:
            part = _dot8(h_ref[:, pl.dslice(jd * bk_dn, bk_dn)],
                         dnp_ref[0], interpret)

        @pl.when(jd == 0)
        def _():
            acc_ref[:] = part

        @pl.when(jd > 0)
        def _():
            acc_ref[:] += part

        @pl.when(jd == n_dn_j - 1)
        def _():
            o_ref[0] = (acc_ref[:] * dns_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bits", "i_orig", "interpret"))
def quant_mlp_stacked(x: jnp.ndarray, gu_packed: jnp.ndarray,
                      gu_scale: jnp.ndarray, dn_packed: jnp.ndarray,
                      dn_scale: jnp.ndarray, layer_idx: jnp.ndarray, *,
                      bits: int, i_orig: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused quantized decode MLP over stacked per-layer leaves.

    ``x (M, D)`` bf16 -> ``(M, N_dn)`` bf16 where
    ``gu_packed (L, N_gu, KhG)`` holds the fused gate/up rows (gate rows
    then up rows, ``i_orig`` of each; N_gu may carry zero-row padding) and
    ``dn_packed (L, N_dn, KhD)`` the down projection.  int4 leaves use the
    split-half excess-8 packing; int8 leaves are plain bytes.  Check
    :func:`quant_mlp_eligible` first.
    """
    M, D = x.shape
    L, n_gu_rows, khg = gu_packed.shape
    _, n_dn, kh_dn = dn_packed.shape
    x = x.astype(jnp.bfloat16)
    mp = -(-M // 16) * 16
    if mp != M:
        x = jnp.pad(x, ((0, mp - M), (0, 0)))
    bm = mp

    bn_gu = _pick_bn(n_gu_rows, khg, bm)
    n_gu = n_gu_rows // bn_gu
    bk_dn = _pick_bk(kh_dn, bm)
    bn_dn = _pick_bn(n_dn, bk_dn, bm)
    n_dn_j = kh_dn // bk_dn
    n_steps = n_gu + (n_dn // bn_dn) * n_dn_j
    # down's logical input width: split-half pairs for int4, plain for int8
    kh_dn_orig = i_orig // 2 if bits == 4 else i_orig
    h_w = 2 * kh_dn if bits == 4 else kh_dn
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def gu_n(t):
        return jnp.minimum(t, n_gu - 1)

    def dn_n(t):
        return jnp.maximum(t - n_gu, 0) // n_dn_j

    def dn_j(t):
        return jnp.maximum(t - n_gu, 0) % n_dn_j

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            # gate/up reads the activation full-K in (lo, hi) halves for
            # int4 (same array bound twice) or whole for int8
            pl.BlockSpec((1, bm, khg), lambda t, idx: (0, 0, 0)),
            pl.BlockSpec((1, bm, khg),
                         lambda t, idx: (0, 0, 1 if bits == 4 else 0)),
            pl.BlockSpec((1, bn_gu, khg),
                         lambda t, idx: (idx[0], gu_n(t), 0)),
            pl.BlockSpec((1, 1, bn_gu),
                         lambda t, idx: (idx[0], 0, gu_n(t))),
            # constant index map during phase 1 => the first down block is
            # DMA'd while gate/up strips are still streaming
            pl.BlockSpec((1, bn_dn, bk_dn),
                         lambda t, idx: (idx[0], dn_n(t), dn_j(t))),
            pl.BlockSpec((1, 1, bn_dn),
                         lambda t, idx: (idx[0], 0, dn_n(t))),
        ],
        out_specs=pl.BlockSpec((1, bm, bn_dn),
                               lambda t, idx: (0, 0, dn_n(t))),
        scratch_shapes=[
            pltpu.VMEM((bm, n_gu_rows), jnp.float32),   # gate/up strips
            pltpu.VMEM((bm, h_w), jnp.bfloat16),        # h, down geometry
            pltpu.VMEM((bm, bn_dn), jnp.float32),       # down accumulator
        ],
    )
    x_in = x if bits == 4 else jnp.pad(x, ((0, 0), (0, khg - D))) \
        if khg != D else x
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, bits=bits, n_gu=n_gu, bn_gu=bn_gu, n_dn_j=n_dn_j,
            bk_dn=bk_dn, i_orig=i_orig, kh_dn=kh_dn,
            kh_dn_orig=kh_dn_orig, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, bm, n_dn), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx, x_in[None], x_in[None], gu_packed,
      gu_scale.reshape(L, 1, n_gu_rows).astype(jnp.float32),
      dn_packed,
      dn_scale.reshape(L, 1, n_dn).astype(jnp.float32))
    return out[0, :M]


def quant_mlp_eligible(rows: int, gu_shape, dn_shape, *, bits: int,
                       d_model: int, i_orig: int) -> bool:
    """Static eligibility for the fused MLP kernel (decode-narrow rows,
    full-K gate/up strips, block divisors exist, aligned geometry)."""
    if len(gu_shape) != 3 or len(dn_shape) != 3:
        return False
    _, n_gu_rows, khg = gu_shape
    _, n_dn, kh_dn = dn_shape
    bm = -(-rows // 16) * 16
    if bm > 32:
        return False
    # gate/up activation width must be one full-K block
    want_khg = d_model // 2 if bits == 4 else d_model
    if khg != want_khg or khg > 4096 or khg % 128 != 0:
        return False
    kh_dn_orig = i_orig // 2 if bits == 4 else i_orig
    if kh_dn_orig % 128 != 0 or kh_dn % 128 != 0 or i_orig % 128 != 0:
        return False
    if n_gu_rows < 2 * i_orig:
        return False
    bn_gu = _pick_bn(n_gu_rows, khg, bm)
    bk_dn = _pick_bk(kh_dn, bm)
    if bn_gu <= 0 or bk_dn <= 0:
        return False
    return _pick_bn(n_dn, bk_dn, bm) > 0
