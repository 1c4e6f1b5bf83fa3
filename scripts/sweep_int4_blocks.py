"""Sweep fused-kernel block shapes on the real decode weight shapes.

Times ``int4_matmul_stacked`` / ``int8_matmul_stacked`` inside a
32-iteration ``lax.scan`` (the decode-loop situation: weights stream from
HBM every layer) for each 7B projection shape, reporting effective packed
GB/s per variant.  Used to pick _BLOCK_BYTES / BN / BK in
ops/int4_matmul.py; run standalone on the chip, never concurrently with
bench.py.

Usage: python scripts/sweep_int4_blocks.py [--bits 4|8] [--rows 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_scan(fn, params_args, n_iter=3):
    import jax

    out = fn(*params_args)
    np.asarray(jax.device_get(out))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*params_args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / n_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--rows", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.ops import int4_matmul as K

    L = 32
    shapes = {
        # logical (N, K) of the padded fused 7B leaves
        "qkv": (12288, 4096),
        "o": (4096, 4096),
        "gateup": (22528, 4096),
        "down": (4096, 11264),
    }
    rows = args.rows
    print(f"bits={args.bits} rows={rows} scan={L} layers")
    for name, (N, Kdim) in shapes.items():
        Kh = Kdim // 2 if args.bits == 4 else Kdim
        nbytes = L * N * Kh
        q = jnp.zeros((L, N, Kh), jnp.int8)
        s = jnp.ones((L, N, 1), jnp.float32)
        x = jnp.ones((rows, Kdim), jnp.bfloat16)
        mm = K.int4_matmul_stacked if args.bits == 4 else K.int8_matmul_stacked

        @jax.jit
        def scan_fn(x, q, s, _mm=mm):
            def body(carry, l):
                y = _mm(x, q, s, l)
                return carry + y[:, :1], None

            out, _ = jax.lax.scan(body, jnp.zeros((rows, 1), jnp.bfloat16),
                                  jnp.arange(L))
            return out

        dt = time_scan(scan_fn, (x, q, s))
        print(f"{name:<8} N={N:<6} Kh={Kh:<6} "
              f"{nbytes/1e6:7.1f} MB  {dt*1e3:7.2f} ms  "
              f"{nbytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
