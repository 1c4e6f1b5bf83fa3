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


def _read_kernel(x_ref, o_ref, acc_ref, *, n_blocks: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fold the block into an (8, 128) accumulator: a handful of VPU adds
    # per 128 lanes — orders of magnitude under the DMA time, but enough
    # that Mosaic must actually materialize every block in VMEM
    blk = x_ref[...].astype(jnp.float32)
    acc_ref[:] += blk.reshape(-1, 8, 128).sum(axis=0)

    @pl.when(i == n_blocks - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("bm",))
def _read_once(x, bm: int = 2048):
    m, k = x.shape
    n_blocks = m // bm
    return pl.pallas_call(
        functools.partial(_read_kernel, n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)


@functools.partial(jax.jit, static_argnames=("bm",))
def _copy_once(x, bm: int = 2048):
    m, k = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
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


def hbm_read_gb_s(mb: int = 512, bm: int = 2048, k: int = 8192,
                  iters: int = 8) -> float:
    """Best sustained HBM *read* bandwidth for sequential (bm, k) int8
    blocks, GB/s (median of ``iters`` timed passes over an ``mb``-MiB
    array)."""
    m = mb * 1024 * 1024 // k
    m = (m // bm) * bm
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (m, k), np.int8))
    dt = _time_fn(functools.partial(_read_once, bm=bm), x, iters=iters)
    return m * k / dt / 1e9


def hbm_copy_gb_s(mb: int = 256, bm: int = 2048, k: int = 8192,
                  iters: int = 8) -> float:
    """HBM block-copy bandwidth, counting read+write bytes, GB/s."""
    m = mb * 1024 * 1024 // k
    m = (m // bm) * bm
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (m, k), np.int8))
    dt = _time_fn(functools.partial(_copy_once, bm=bm), x, iters=iters)
    return 2 * m * k / dt / 1e9
