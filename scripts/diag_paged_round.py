"""Isolate the paged decode round's cost vs the dense decode roof.

The sustained serving bench runs ~25 ms/step (b8, chunk 16, int8 weights
+ int8 KV paged pool, ~520-token rows) while the dense-cache roof does
14.2 ms/step at the same batch — this script times the two decode bodies
at MATCHED shapes to show where the paged round spends the difference,
optionally under the device profiler.

    python scripts/diag_paged_round.py [--profile] [--ctx 512] [--steps 16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--no-kernel", action="store_true",
                    help="gather path instead of the paged Pallas kernel")
    args = ap.parse_args()

    import dataclasses

    from matryoshka_mm_tpu.generate import GenerationConfig, _decode_chunk_fn
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.models.llama import init_kv_cache
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace
    from matryoshka_mm_tpu.serve.paged_cache import (
        PageAllocator, _paged_pool_decode_fn, init_paged_cache)

    t0 = time.perf_counter()
    cfg = LlavaConfig.llava_v15_7b_m3()
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params_inplace(params["llama"])
    params = jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, params)
    print(f"setup {time.perf_counter() - t0:.1f}s", flush=True)

    B, ctx, steps, page = args.batch, args.ctx, args.steps, args.page_size
    gen_cfg = GenerationConfig(max_new_tokens=steps * 4, decode_chunk=steps,
                               eos_token_id=-1)

    def sync(x):
        return np.asarray(jax.device_get(jnp.ravel(x)[:2]))

    # ---- dense round at the same context ----
    capacity = ctx + steps * 7
    capacity = -(-capacity // 64) * 64
    cache = init_kv_cache(cfg.llama, B, capacity)
    cache = cache._replace(
        write_idx=jnp.asarray(ctx, jnp.int32),
        valid=jnp.asarray(np.arange(capacity)[None] < ctx).repeat(B, 0),
        positions=jnp.asarray(
            np.tile(np.arange(capacity, dtype=np.int32), (B, 1))))
    dense = _decode_chunk_fn(cfg, gen_cfg, steps)
    tok = jnp.zeros((B,), jnp.int32)
    lens = jnp.full((B,), ctx, jnp.int32)
    fin = jnp.zeros((B,), bool)
    key = jax.random.PRNGKey(0)
    c, t, l, f, toks = dense(params, cache, tok, lens, fin, key)
    sync(toks)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        c, t, l, f, toks = dense(params, c, t, l, f, key)
        sync(toks)
        times.append((time.perf_counter() - t0) / steps * 1e3)
    dense_ms = float(np.median(times))
    print(f"dense  round: {dense_ms:.2f} ms/step  "
          f"({B / dense_ms * 1e3:.0f} tok/s)", flush=True)
    del c, cache

    # ---- paged round, same rows ----
    pages_per_row = -(-capacity // page)
    n_pages = B * pages_per_row + 1
    paged = init_paged_cache(cfg.llama, n_pages, page)
    alloc = PageAllocator(n_pages, page, B, pages_per_row)
    for r in range(B):
        assert alloc.allocate_row(r, ctx, headroom=steps * 7)
    tables = jnp.asarray(alloc.tables)
    use_kernel = not args.no_kernel
    decode = _paged_pool_decode_fn(cfg, gen_cfg, steps, pages_per_row,
                                   page, use_kernel, fsm=False)
    row_len = jnp.full((B,), ctx, jnp.int32)
    budget = jnp.full((B,), 10 ** 6, jnp.int32)
    active = jnp.ones((B,), bool)
    out = decode(params["llama"], paged, tables, row_len, tok, budget, active, key)
    paged_new, tok2, row_len, budget, active, toks, _, _ = out
    sync(toks)
    times = []
    for i in range(5):
        # keep row_len fixed-ish: reset not needed for timing (rows grow
        # by `steps` per call; capacity has headroom for 5 calls)
        t0 = time.perf_counter()
        (paged_new, tok2, row_len, budget, active, toks, _, _) = decode(
            params["llama"], paged_new, tables, row_len, tok2, budget,
            active, key)
        sync(toks)
        times.append((time.perf_counter() - t0) / steps * 1e3)
    paged_ms = float(np.median(times))
    kind = "kernel" if use_kernel else "gather"
    print(f"paged ({kind}) round: {paged_ms:.2f} ms/step  "
          f"({B / paged_ms * 1e3:.0f} tok/s)  "
          f"overhead vs dense: {paged_ms - dense_ms:+.2f} ms/step",
          flush=True)

    if args.profile:
        outdir = "/tmp/paged_round_trace"
        with jax.profiler.trace(outdir):
            for _ in range(2):
                (paged_new, tok2, row_len, budget, active, toks, _, _) = \
                    decode(params["llama"], paged_new, tables, row_len,
                           tok2, budget, active, key)
            sync(toks)
        print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
