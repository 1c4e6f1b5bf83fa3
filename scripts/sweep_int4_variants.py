"""Kernel-variant sweep for the fused int4 dequant-matmul (ops/int4_matmul.py).

Times parametrized copies of the stacked kernel (block shape, dot fusion,
correction placement) on the real 7B decode weight shapes.  The axon
tunnel adds ~8.5 ms fixed overhead per dispatch, so wall-clocking one
scan is useless; instead each variant is timed at two layer counts and
the MARGINAL per-layer time (slope) is reported — fixed overhead cancels.

Usage: python scripts/sweep_int4_variants.py [--shape gateup|down|qkv|o]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_stacked(BK, BN, BM, fuse_dots=False, ext_corr=False):
    """Build an int4_matmul_stacked variant with explicit block shapes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref, acc_ref,
               *, n_j):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pi = pltpu.bitcast(p_ref[0], jnp.int32)
        lo_b = pltpu.bitcast(pi & 0x0F0F0F0F, jnp.int8).astype(jnp.bfloat16)
        hi_b = pltpu.bitcast((pi >> 4) & 0x0F0F0F0F,
                             jnp.int8).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        xl = x_lo_ref[0]
        xh = x_hi_ref[0]
        if fuse_dots:
            xc = jnp.concatenate([xl, xh], axis=1)
            wc = jnp.concatenate([lo_b, hi_b], axis=1)
            acc_ref[:] += jax.lax.dot_general(
                xc, wc, dn, preferred_element_type=jnp.float32)
        else:
            acc_ref[:] += jax.lax.dot_general(
                xl, lo_b, dn, preferred_element_type=jnp.float32)
            acc_ref[:] += jax.lax.dot_general(
                xh, hi_b, dn, preferred_element_type=jnp.float32)
        if not ext_corr:
            acc_ref[:] -= 8.0 * jnp.sum(xl.astype(jnp.float32)
                                        + xh.astype(jnp.float32), axis=1,
                                        keepdims=True)

        @pl.when(j == n_j - 1)
        def _():
            o_ref[0] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)

    @jax.jit
    def mm(x, packed, scale, layer_idx):
        M, K = x.shape
        L, N, Khalf = packed.shape
        n_j = Khalf // BK
        mp = -(-M // BM) * BM
        if mp != M:
            x = jnp.pad(x, ((0, mp - M), (0, 0)))
        idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // BM, N // BN, n_j),
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
            functools.partial(kernel, n_j=n_j),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, mp, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "arbitrary")),
        )(idx, x[None], x[None], packed,
          scale.reshape(L, 1, N).astype(jnp.float32))
        y = out[0, :M]
        if ext_corr:
            # every x column feeds exactly one nibble dot (lo covers
            # [0, K/2), hi covers [K/2, K)), so the bias is -8*sum(x) once,
            # scaled by THIS layer's per-channel scale
            corr = -8.0 * jnp.sum(x[:M].astype(jnp.float32), axis=1,
                                  keepdims=True)
            layer_scale = scale.reshape(L, N)[jnp.asarray(layer_idx,
                                                          jnp.int32)]
            y = (y.astype(jnp.float32)
                 + corr * layer_scale[None, :]).astype(jnp.bfloat16)
        return y

    return mm


def time_marginal(mm, N, Khalf, rows, L_small=16, L_big=128, n_iter=6):
    """Marginal per-layer seconds via two-point slope of min-times."""
    import jax
    import jax.numpy as jnp

    times = {}
    for L in (L_small, L_big):
        # weights generated ON DEVICE: shipping ~3GB of host-side randoms
        # through the axon tunnel dwarfs the thing being measured
        key = jax.random.PRNGKey(0)
        q = jax.jit(lambda k: jax.random.randint(
            k, (L, N, Khalf), -128, 128, jnp.int32).astype(jnp.int8))(key)
        s = jax.jit(lambda k: 0.01 * jax.random.normal(
            k, (L, N, 1), jnp.float32))(key)
        x = jax.jit(lambda k: jax.random.normal(
            k, (rows, Khalf * 2), jnp.bfloat16))(key)
        q.block_until_ready()

        @jax.jit
        def scan_fn(x, q, s):
            def body(carry, l):
                y = mm(x, q, s, l)
                return carry + y[:, :1].astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.zeros((x.shape[0], 1),
                                                  jnp.float32),
                                  jnp.arange(q.shape[0]))
            return out

        out = scan_fn(x, q, s)
        np.asarray(jax.device_get(out))
        best = float("inf")
        for _ in range(n_iter):
            t0 = time.perf_counter()
            out = scan_fn(x, q, s)
            np.asarray(jax.device_get(out))
            best = min(best, time.perf_counter() - t0)
        times[L] = best
        del q, s
    return (times[L_big] - times[L_small]) / (L_big - L_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="gateup",
                    choices=("qkv", "o", "gateup", "down"))
    ap.add_argument("--rows", type=int, default=1)
    args = ap.parse_args()

    shapes = {
        "qkv": (12288, 2048),
        "o": (4096, 2048),
        "gateup": (22528, 2048),
        "down": (4096, 5632),
    }
    N, Khalf = shapes[args.shape]

    # auto-generate block candidates: BK | Khalf, BN | N, both lane/tile
    # aligned, block size 1.5-6MB, biggest first (bigger DMAs win on v5e)
    bks = [d for d in range(512, Khalf + 1, 128) if Khalf % d == 0]
    bns = [d for d in range(512, min(N, 8192) + 1, 512) if N % d == 0]
    cands = sorted(
        ((bk, bn) for bk in bks for bn in bns
         if (0.75 if bk == Khalf else 1.5) * 2**20 <= bk * bn <= 5 * 2**20),
        key=lambda t: (t[0] != Khalf, -(t[0] * t[1])))
    variants = [(f"BK{bk}_BN{bn}", dict(BK=bk, BN=bn, BM=16))
                for bk, bn in cands[:7]]

    print(f"shape={args.shape} N={N} Khalf={Khalf} rows={args.rows}")
    bytes_per_layer = N * Khalf
    for name, kw in variants:
        try:
            mm = make_stacked(**kw)
            dt = time_marginal(mm, N, Khalf, args.rows)
            print(f"{name:<28} {dt*1e6:8.1f} us/layer  "
                  f"{bytes_per_layer/dt/1e9:6.1f} GB/s")
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"{name:<28} FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
