"""Account every ms of a sustained-load serving run (VERDICT r4 #1).

Replicates bench.py's ``_serving_sustained_bench`` (64 requests, Poisson
arrivals at 1.2x the roof-implied rate, 256 new tokens, int8 weights +
int8 KV + prefix cache, chunk=16) with the batcher event log on, then
prints a steady-state time budget: where each second of wall clock went
(decode rounds / admissions / scheduler gaps) and the implied ceiling.

    python scripts/diag_sustained.py [--requests 64] [--chunk 16]
"""
import argparse
import dataclasses
import faulthandler
import signal
import sys
import threading
import time

# SIGUSR1 -> all-thread stack dump (diagnose tunnel wedges / deadlocks)
faulthandler.register(signal.SIGUSR1)
# hard backstop: dump every 300s so a silent hang self-documents
faulthandler.dump_traceback_later(300, repeat=True)

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.serve.batching import ContinuousBatcher


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--roof", type=float, default=562.0,
                    help="int8+kv8 b8 roof tok/s (sets the arrival rate)")
    ap.add_argument("--rate-mult", type=float, default=1.2)
    args = ap.parse_args()

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
    n_requests, max_new = args.requests, args.max_new
    lam = args.rate_mult * args.roof / max_new
    batcher = ContinuousBatcher(
        params, cfg, max_batch=args.max_batch, prefill_len=256,
        max_new_tokens=max_new, chunk=args.chunk, backend="paged",
        prefix_cache=True,
        gen_cfg=GenerationConfig(max_new_tokens=max_new,
                                 decode_chunk=args.chunk, eos_token_id=-1))
    t_w = time.perf_counter()
    batcher.warmup(with_image=True, numtoks=144)
    print(f"warmup {time.perf_counter() - t_w:.1f}s", flush=True)

    batcher.events = []
    rng = np.random.default_rng(0)
    arrivals = np.cumsum(rng.exponential(1.0 / lam, n_requests))
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 31000, (1, 64)).astype(np.int32)
        ids[0, 3] = IMAGE_TOKEN_INDEX
        px = rng.standard_normal((1, 3, 336, 336)).astype(np.float32)
        reqs.append((ids, px))

    results = [None] * n_requests
    t_base = time.perf_counter()

    def worker(i):
        t0 = time.perf_counter()
        req = batcher.submit(reqs[i][0], reqs[i][1], numtoks=144,
                             max_new_tokens=max_new)
        ttft, n_tok = None, 0
        for chunk in batcher.stream(req):
            if ttft is None:
                ttft = time.perf_counter() - t0
            n_tok += int(np.asarray(chunk).size)
        results[i] = {"t_submit": t0 - t_base, "ttft_s": ttft,
                      "n_tok": n_tok,
                      "t_end": time.perf_counter() - t_base}

    threads = []
    for i in range(n_requests):
        dt = arrivals[i] - (time.perf_counter() - t_base)
        if dt > 0:
            time.sleep(dt)
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t_base
    events = batcher.events
    batcher.events = None
    occ = batcher.occupancy
    stats = dict(getattr(batcher, "stats", {}) or {})
    admit_stats = dict(batcher.admit_stats)
    batcher.shutdown()

    total_tok = sum(r["n_tok"] for r in results)
    print(f"\nwall {wall:.2f}s  tokens {total_tok}  "
          f"agg {total_tok / wall:.1f} tok/s  "
          f"fraction_of_roof {total_tok / wall / args.roof:.3f}")
    occupancy = (occ["active_rows"] / (occ["rounds"] * args.max_batch)
                 if occ["rounds"] else 0.0)
    print(f"occupancy {occupancy:.3f} over {occ['rounds']} rounds")
    print("admit_stats", admit_stats, "stats", stats)

    # ---- time budget over the steady-state window ----
    # steady state: from the first decode round after 25% of requests
    # ended, to the last round before the drain (75% ended)
    ends = sorted(r["t_end"] for r in results)
    w0, w1 = ends[len(ends) // 4], ends[3 * len(ends) // 4]
    evs = [(t - t_base, k, d) for t, k, d in events]
    win = [(t, k, d) for t, k, d in evs if w0 <= t <= w1]
    span = w1 - w0

    rounds = [(t, d) for t, k, d in win if k == "decode_round"]
    round_ms = sum(d["ms"] for _, d in rounds)
    row_rounds = sum(d["rows"] for _, d in rounds)
    solo_ms = sum(d["ms"] for t, k, d in win if k == "admit_solo")
    grp_ms = sum(d["ms"] for t, k, d in win if k == "admit_group")
    n_solo = sum(1 for t, k, d in win if k == "admit_solo")
    n_grp = sum(1 for t, k, d in win if k == "admit_group")
    n_pref = sum(1 for t, k, d in win if k == "admit_prefix")
    print(f"\n-- steady-state window {w0:.1f}..{w1:.1f}s ({span:.1f}s) --")
    print(f"decode rounds: n={len(rounds)}  sum(ms)={round_ms:.0f}  "
          f"({round_ms / 1e3 / span * 100:.0f}% of wall)  "
          f"mean_rows={row_rounds / max(len(rounds), 1):.2f}")
    if rounds:
        ms = [d["ms"] for _, d in rounds]
        print(f"  round ms: p10={np.percentile(ms, 10):.0f} "
              f"p50={np.percentile(ms, 50):.0f} "
              f"p90={np.percentile(ms, 90):.0f} max={max(ms):.0f}")
        toks_win = sum(d["rows"] for _, d in rounds) * args.chunk
        print(f"  tokens decoded in window ~{toks_win}  "
              f"-> {toks_win / span:.0f} tok/s in-window")
    print(f"admissions: solo n={n_solo} sum={solo_ms:.0f}ms  "
          f"group n={n_grp} sum={grp_ms:.0f}ms  prefix n={n_pref}")

    # gaps between consecutive decode_round events not explained by the
    # round itself (the demux+dispatch+admission cost between rounds)
    gaps = []
    for (t_prev, d_prev), (t_cur, d_cur) in zip(rounds, rounds[1:]):
        gap = (t_cur - t_prev) * 1e3 - d_cur["ms"]
        gaps.append(gap)
    if gaps:
        print(f"inter-round non-decode time: sum={sum(gaps) / 1e3:.1f}s "
              f"({sum(gaps) / 1e3 / span * 100:.0f}% of window)  "
              f"p50={np.percentile(gaps, 50):.0f}ms "
              f"p90={np.percentile(gaps, 90):.0f}ms max={max(gaps):.0f}ms")

    # event-kind histogram in window
    from collections import Counter

    print("event counts:", dict(Counter(k for _, k, _ in win)))

    # per-request TTFT
    ttfts = sorted(r["ttft_s"] for r in results)
    print(f"\nttft p50={np.percentile(ttfts, 50):.2f}s "
          f"p95={np.percentile(ttfts, 95):.2f}s max={max(ttfts):.2f}s")


if __name__ == "__main__":
    main()
