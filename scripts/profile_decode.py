"""Profile one quantized b1 decode chunk and print the per-op time
breakdown (the roofline-gap diagnosis tool for ops/int4_matmul.py).

Runs the 7B decode under ``jax.profiler.trace`` and aggregates TPU-side
op durations from the trace protobuf's trace.json.gz, grouping by op
name prefix.  Per the verify notes, ``block_until_ready`` through the
axon tunnel under-reports — the profiler's device timeline is the only
trustworthy per-op signal.

Usage:
    python scripts/profile_decode.py [--bits 4|8|16] [--batch 1] [--steps 32]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_decode(bits: int, batch: int, steps: int):
    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import (GenerationConfig,
                                            _decode_chunk_fn, _prefill_fn)
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import (quantize_llama_params_inplace,
                                             quantize_llama_params_int4)

    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    if bits == 4:
        params["llama"] = quantize_llama_params_int4(params["llama"],
                                                     inplace=True)
    elif bits == 8:
        params["llama"] = quantize_llama_params_inplace(params["llama"])

    T, numtoks = 64, 144
    L = -(-(T - 1 + numtoks) // 64) * 64
    gen_cfg = GenerationConfig(max_new_tokens=64, decode_chunk=steps)
    capacity = L + gen_cfg.max_new_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (1, T)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    ids = jnp.tile(jnp.asarray(ids), (batch, 1))
    px = jnp.tile(jnp.asarray(rng.standard_normal((1, 3, 336, 336)),
                              jnp.float32), (batch, 1, 1, 1))
    prefill = _prefill_fn(cfg, numtoks, L, capacity)
    logits, cache, lengths, _ = prefill(params, ids, px)
    decode = _decode_chunk_fn(cfg, gen_cfg, steps)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    fin = jnp.zeros((batch,), bool)
    key = jax.random.PRNGKey(0)

    def run():
        nonlocal cache, first, lengths, fin
        cache, first, lengths, fin, toks = decode(params, cache, first,
                                                  lengths, fin, key)
        return np.asarray(jax.device_get(toks))

    return run


def parse_trace(trace_dir: str, steps: int, collapse: bool = True):
    """Aggregate device-op durations from the profiler dump."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device pids: process_name metadata containing 'TPU' and an XLA Ops tid
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    buckets = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "?")
        # collapse fusion instances: strip trailing .N / numeric suffixes
        key = re.sub(r"[.\d]+$", "", name) if collapse else name
        buckets[key] += dur
        total += dur
    return buckets, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8, 16))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--top", type=int, default=24)
    ap.add_argument("--no-collapse", action="store_true",
                    help="keep per-call-site op name suffixes")
    args = ap.parse_args()

    import jax

    run = build_decode(args.bits, args.batch, args.steps)
    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"wall per chunk: {wall*1e3:.1f} ms  "
          f"({args.batch * args.steps / wall:.1f} tok/s)")

    trace_dir = tempfile.mkdtemp(prefix="decode_trace_")
    with jax.profiler.trace(trace_dir):
        run()
    buckets, total = parse_trace(trace_dir, args.steps,
                                 collapse=not args.no_collapse)
    per_step = total / args.steps
    print(f"device-op total: {total/1e3:.2f} ms for {args.steps} steps "
          f"({per_step:.0f} us/token)")
    print(f"{'op':<58} {'ms':>8} {'%':>6} {'us/step':>8}")
    for name, dur in buckets.most_common(args.top):
        print(f"{name[:58]:<58} {dur/1e3:>8.2f} {100*dur/total:>6.1f} "
              f"{dur/args.steps:>8.1f}")
    print(f"trace dir: {trace_dir}")


if __name__ == "__main__":
    main()
