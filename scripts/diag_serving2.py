"""Round-4 serving diagnosis, part 2: profile the batcher under load.

Runs the bench serving load (18 requests / concurrency 6) with the event
log AND a jax.profiler trace, then prints:
  * per-request TTFTs + scheduler events (as diag_serving.py), and
  * the device-op time breakdown (profile_decode.parse_trace), to
    attribute steady-state admission cost (group prefill vs import vs
    ViT) and the paged decode round cost (27ms/step vs the dense roof's
    14ms/step).

    python scripts/diag_serving2.py 2>&1 | tee /tmp/diag_serving2.log
"""
import dataclasses
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from profile_decode import parse_trace


def main():
    t_setup = time.perf_counter()
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params_inplace(params["llama"])
    params = jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, params)
    print(f"setup {time.perf_counter() - t_setup:.1f}s", flush=True)

    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    n_requests, concurrency, max_new = 18, 6, 64
    batcher = ContinuousBatcher(
        params, cfg, max_batch=8, prefill_len=256, max_new_tokens=96,
        chunk=8, backend="paged", prefix_cache=True,
        gen_cfg=GenerationConfig(max_new_tokens=max_new, decode_chunk=8,
                                 eos_token_id=-1))
    t_w = time.perf_counter()
    batcher.warmup(with_image=True, numtoks=144)
    print(f"warmup {time.perf_counter() - t_w:.1f}s", flush=True)

    batcher.events = []
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 31000, (1, 64)).astype(np.int32)
        ids[0, 3] = IMAGE_TOKEN_INDEX
        px = rng.standard_normal((1, 3, 336, 336)).astype(np.float32)
        reqs.append((ids, px))

    results = [None] * n_requests
    rids = [None] * n_requests
    sem = threading.Semaphore(concurrency)
    t_base = time.perf_counter()

    def worker(i):
        with sem:
            t0 = time.perf_counter()
            req = batcher.submit(reqs[i][0], reqs[i][1], numtoks=144,
                                 max_new_tokens=max_new)
            rids[i] = req.rid
            ttft, n_tok = None, 0
            for chunk in batcher.stream(req):
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n_tok += int(np.asarray(chunk).size)
            results[i] = {"t_submit": t0 - t_base, "ttft_s": ttft,
                          "n_tok": n_tok,
                          "t_end": time.perf_counter() - t_base}

    trace_dir = tempfile.mkdtemp(prefix="serve_trace_")
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    with jax.profiler.trace(trace_dir):
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    wall = time.perf_counter() - t_base
    events = batcher.events
    batcher.events = None
    stats = dict(getattr(batcher, "stats", {}) or {})
    admit_stats = dict(batcher.admit_stats)
    batcher.shutdown()

    print(f"\nwall {wall:.2f}s")
    ttfts = sorted(r["ttft_s"] for r in results if r)
    print("ttft sorted:", [round(t, 2) for t in ttfts])
    print("\n-- scheduler events (condensed) --")
    for t, kind, d in events:
        if kind in ("admit_group", "admit_solo", "admit_prefix",
                    "retry_pages", "requeue"):
            print(f"{t - t_base:8.3f}  {kind:<12} "
                  f"{ {k: (round(v, 1) if isinstance(v, float) else v) for k, v in d.items()} }")
    rounds = [d["ms"] for t, k, d in events if k == "decode_round"]
    print(f"decode rounds: n={len(rounds)} "
          f"p50={np.percentile(rounds, 50):.1f}ms max={max(rounds):.1f}ms")
    print("admit_stats", admit_stats, "stats", stats)

    buckets, total = parse_trace(trace_dir, 1)
    print(f"\ndevice-op total {total/1e3:.1f} ms over the {wall:.1f}s run "
          f"(device busy {total/1e3/wall/10:.1f}%)")
    print(f"{'op':<58} {'ms':>9} {'%':>6}")
    for name, dur in buckets.most_common(40):
        print(f"{name[:58]:<58} {dur/1e3:>9.2f} {100*dur/total:>6.1f}")


if __name__ == "__main__":
    main()
