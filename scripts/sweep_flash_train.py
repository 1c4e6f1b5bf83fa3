"""Round-4 train-MFU probe: time the flash-attention fwd and fwd+bwd at
the K=5/T=2048 bench shape (scales folded: B_eff=10, H=16, Dh=128) across
block sizes, against the XLA dot-attention reference.

The bench step spends ~35-40%% of its time in attention (flops audit in
docs/Architecture.md); ops/flash_attention.py's 512x512 default was tuned
on the fwd only.  Each variant runs ITERS chained iterations inside one
jit (output feeds the next input) so the ~30ms axon-tunnel dispatch
latency amortizes away — single-call timings here are pure noise.

Usage: python scripts/sweep_flash_train.py [S] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.ops.flash_attention import flash_attention

    B, H, Dh = 10, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.bfloat16)

    fwd_gf = 4 * S * S * Dh * B * H / 2 / 1e9   # causal-counted
    bwd_gf = 2.5 * fwd_gf

    def sync(x):
        return np.asarray(jax.device_get(
            jnp.sum(x[0, 0, :1, :8].astype(jnp.float32))))

    def chain(one):
        """Run `one(q,k,v) -> (B,H,S,Dh)` iters times, feeding the output
        back into q so XLA cannot CSE or reorder the iterations."""
        @jax.jit
        def run(q, k, v):
            def body(qc, _):
                o = one(qc, k, v)
                return qc + 1e-6 * o.astype(qc.dtype), None
            qf, _ = jax.lax.scan(body, q, None, length=iters)
            return qf
        return run

    def timeit(fn, *args, reps=3):
        sync(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    def xla_one(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask, s.astype(jnp.float32), -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def grad_one(one):
        def g(q, k, v):
            def loss(q):
                return jnp.sum(one(q, k, v).astype(jnp.float32) ** 2)
            return jax.grad(loss)(q)
        return g

    variants = [("xla", xla_one)]
    for bq, bk in ((512, 512), (1024, 1024), (1024, 512), (512, 1024),
                   (2048, 1024), (1024, 2048), (2048, 2048), (256, 1024)):
        if bq > S or bk > S:
            continue

        def one(q, k, v, bq=bq, bk=bk):
            return flash_attention(q, k, v, causal=True, block_q=bq,
                                   block_k=bk)

        variants.append((f"{bq}x{bk}", one))

    for name, one in variants:
        try:
            dt_f = timeit(chain(one), q, k, v)
            dt_b = timeit(chain(grad_one(one)), q, k, v)
            # the grad chain also runs the fwd each iteration
            print(f"{name:<10} fwd {dt_f*1e3:7.2f} ms {fwd_gf/dt_f/1e3:6.1f}"
                  f" TF/s | fwd+bwd {dt_b*1e3:7.2f} ms "
                  f"{(fwd_gf+bwd_gf)/dt_b/1e3:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed:", str(e)[:100], flush=True)


if __name__ == "__main__":
    main()
