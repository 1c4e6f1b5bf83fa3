"""HBM bandwidth calibration probes (Pallas).

Independent check of the "~640 GB/s practical DMA ceiling" that the
round-4 device trace attributed to this chip (docs/Architecture.md): the
weight-streaming decode kernels all sustain ~620-640 GB/s, and their
isolated microbenches top out at 637-642 GB/s regardless of blocking.
If that number were a *kernel* deficiency rather than the chip's
sustained-DMA ceiling, a bare read/copy kernel with no compute at all
would beat it.  These probes are that bare kernel:

* :func:`hbm_read_gb_s` — stream an int8 array block-by-block into VMEM
  and fold it into a tiny accumulator (the compiler cannot elide the
  loads; the write traffic is one VMEM-resident block).  This is the
  weight-streaming access pattern (read-dominated, sequential blocks).
* :func:`hbm_copy_gb_s` — block-wise HBM->VMEM->HBM copy; counts
  read+write bytes (a different, store-heavy pattern, reported for
  completeness).

Both use the same block geometry family as the fused decode kernels
(ops/int4_matmul.py: row-major (BM, BK) int8 blocks, lane dim a multiple
of 128) so the result is comparable with their measured GB/s.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _read_kernel(x_ref, o_ref, acc_ref, *, n_blocks: int, reps: int):
    r, i = pl.program_id(0), pl.program_id(1)

    @pl.when((r == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fold only 8 ROWS of the block into the accumulator: the BlockSpec
    # DMAs the whole (bm, k) window regardless of how much the kernel
    # touches, so this keeps Mosaic honest about the loads while the VPU
    # work stays negligible next to the DMA (a full-block convert+reduce
    # was measured COMPUTE-bound at int8 streaming rates: 230 GB/s)
    blk = x_ref[0:8, :].astype(jnp.float32)        # (8, k)
    acc_ref[:] += jnp.sum(blk, axis=0)[None, :]

    @pl.when((r == reps - 1) & (i == n_blocks - 1))
    def _():
        o_ref[:] = acc_ref[:]


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


# Block geometry: (bm, k) int8 blocks must fit VMEM (~16MB/core) with
# double buffering — bm=256 x k=8192 = 2MB/block leaves room for the
# bf16 conversion temp and the pipeline's second buffer.  The outer
# ``reps`` grid dimension re-streams the whole array inside ONE program:
# a single pass (512MB at ~640GB/s = 0.8ms) would be swamped by the
# ~30ms per-call dispatch+fetch latency of the tunneled platform
# (measured 19 GB/s "bandwidth" — pure round-trip).
@functools.partial(jax.jit, static_argnames=("bm", "reps"))
def _read_once(x, bm: int = 256, reps: int = 16):
    m, k = x.shape
    n_blocks = m // bm
    return pl.pallas_call(
        functools.partial(_read_kernel, n_blocks=n_blocks, reps=reps),
        grid=(reps, n_blocks),
        in_specs=[pl.BlockSpec((bm, k), lambda r, i: (i, 0))],
        out_specs=pl.BlockSpec((1, k), lambda r, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x)


@functools.partial(jax.jit, static_argnames=("bm", "reps"))
def _copy_once(x, bm: int = 256, reps: int = 16):
    m, k = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(reps, m // bm),
        in_specs=[pl.BlockSpec((bm, k), lambda r, i: (i, 0))],
        out_specs=pl.BlockSpec((bm, k), lambda r, i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x)


def _time_fn(fn, *args, iters: int = 8):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jnp.ravel(out)[:4]))   # compile + sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(out)[:4]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _two_point(once_fn, x, bytes_per_pass: int, bm: int, iters: int,
               r_lo: int = 16, r_hi: int = 64) -> float:
    """Marginal GB/s between an ``r_lo``- and an ``r_hi``-pass program.

    The tunneled platform adds a large, VARIABLE per-call constant
    (measured 8-26 ms dispatch+fetch depending on the hour), so a single
    absolute timing under-reports bandwidth by whatever the constant is
    that day.  The difference of two program sizes cancels the constant:
    bw = (r_hi - r_lo) * bytes / (dt_hi - dt_lo)."""
    dt_lo = _time_fn(functools.partial(once_fn, bm=bm, reps=r_lo), x,
                     iters=iters)
    dt_hi = _time_fn(functools.partial(once_fn, bm=bm, reps=r_hi), x,
                     iters=iters)
    return (r_hi - r_lo) * bytes_per_pass / max(dt_hi - dt_lo, 1e-9) / 1e9


def hbm_read_gb_s(mb: int = 512, bm: int = 256, k: int = 8192,
                  iters: int = 4) -> float:
    """Best sustained HBM *read* bandwidth for sequential (bm, k) int8
    blocks, GB/s (two-point marginal fit over an ``mb``-MiB array —
    cancels the tunnel's per-call dispatch constant)."""
    m = mb * 1024 * 1024 // k
    m = (m // bm) * bm
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (m, k), np.int8))
    return _two_point(_read_once, x, m * k, bm, iters)


def hbm_copy_gb_s(mb: int = 256, bm: int = 256, k: int = 8192,
                  iters: int = 4) -> float:
    """HBM block-copy bandwidth, counting read+write bytes, GB/s
    (two-point marginal fit)."""
    m = mb * 1024 * 1024 // k
    m = (m // bm) * bm
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (m, k), np.int8))
    return _two_point(_copy_once, x, 2 * m * k, bm, iters)
