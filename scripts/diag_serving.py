"""Diagnose the serving-bench TTFT staircase on the real chip.

Replicates bench.py's ``_serving_bench`` load (18 requests, concurrency 6,
64 new tokens, int8 weights + int8 KV pool + prefix cache) with the
batcher's opt-in event log enabled, then prints a merged timeline:
per-request submit/first-token times against scheduler-side admission and
decode-round events.  Run on the real chip:

    python scripts/diag_serving.py 2>&1 | tee /tmp/diag_serving.log
"""
import dataclasses
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

def main():
    t_setup = time.perf_counter()
    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace

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
            ttft = None
            n_tok = 0
            for chunk in batcher.stream(req):
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n_tok += int(np.asarray(chunk).size)
            results[i] = {"t_submit": t0 - t_base, "ttft_s": ttft,
                          "n_tok": n_tok,
                          "t_end": time.perf_counter() - t_base}

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_base
    events = batcher.events
    batcher.events = None
    batcher.shutdown()

    print(f"\nwall {wall:.2f}s")
    print("\n-- per-request (by rid) --")
    order = sorted(range(n_requests), key=lambda i: results[i]["t_submit"])
    for i in order:
        r = results[i]
        print(f"rid {rids[i]:>3}  submit {r['t_submit']:7.2f}  "
              f"ttft {r['ttft_s']:6.2f}  end {r['t_end']:7.2f}  "
              f"tok {r['n_tok']}")

    print("\n-- scheduler events --")
    prev = None
    for t, kind, d in events:
        rel = t - t_base
        gap = f"  (+{(t - prev) * 1e3:7.1f}ms)" if prev is not None else ""
        prev = t
        print(f"{rel:8.3f}  {kind:<12} {d}{gap}")

    rounds = [d["ms"] for t, k, d in events if k == "decode_round"]
    if rounds:
        print(f"\ndecode rounds: n={len(rounds)} "
              f"p50={np.percentile(rounds, 50):.1f}ms "
              f"p95={np.percentile(rounds, 95):.1f}ms "
              f"max={max(rounds):.1f}ms")
    solos = [d["ms"] for t, k, d in events if k == "admit_solo"]
    if solos:
        print(f"solo admits: n={len(solos)} "
              f"p50={np.percentile(solos, 50):.1f}ms max={max(solos):.1f}ms")
    groups = [(len(d["rids"]), d["ms"]) for t, k, d in events
              if k == "admit_group"]
    for g, ms in groups:
        print(f"group admit: size={g} {ms:.1f}ms")
    print("admit_stats", batcher.admit_stats, "stats",
          getattr(batcher, "stats", None))


if __name__ == "__main__":
    main()
