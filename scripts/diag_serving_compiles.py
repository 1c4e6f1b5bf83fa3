"""Diagnose post-warmup jit compiles in the serving path.

Replays bench.py's _serving_bench load shape (burst arrivals through a
concurrency semaphore into the ContinuousBatcher) on the CPU backend with
a tiny model and `jax_log_compiles` enabled, and prints every trace that
compiled AFTER ContinuousBatcher.warmup() returned.  The set of trace
signatures is backend-independent (shapes differ, the *which-functions-
with-which-static-args* structure does not), so anything listed here is a
compile a cold TPU serving run pays in user-visible TTFT (VERDICT round 3
weak #1: 12.2s/25.7s TTFT staircase).

Usage: python scripts/diag_serving_compiles.py
"""

import logging
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _CompileLog(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []
        self.phase = ["init"]

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg:
            self.records.append((self.phase[0], msg))


def main():
    import dataclasses

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    handler = _CompileLog()
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                 "jax._src.compiler", "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(handler)
        lg.setLevel(logging.DEBUG)

    cfg = LlavaConfig.tiny_debug()
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)

    n_requests, concurrency, max_new = 18, 6, 16
    batcher = ContinuousBatcher(
        params, cfg, max_batch=8, prefill_len=64, max_new_tokens=32,
        chunk=8, backend="paged", prefix_cache=True,
        gen_cfg=GenerationConfig(max_new_tokens=max_new, decode_chunk=8,
                                 eos_token_id=-1))
    handler.phase[0] = "warmup"
    batcher.warmup(with_image=True, numtoks=4)
    time.sleep(0.3)
    handler.phase[0] = "load"

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 250, (1, 12)).astype(np.int32)
        ids[0, 3] = IMAGE_TOKEN_INDEX
        s = cfg.vision.image_size
        px = rng.standard_normal((1, 3, s, s)).astype(np.float32)
        reqs.append((ids, px))

    sem = threading.Semaphore(concurrency)
    done = []

    def worker(i):
        with sem:
            req = batcher.submit(reqs[i][0], reqs[i][1], numtoks=4,
                                 max_new_tokens=max_new)
            n = 0
            for chunk in batcher.stream(req):
                n += int(np.asarray(chunk).size)
            done.append((i, n))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.shutdown()

    print(f"\n=== {len(done)} requests completed ===")
    n_load = 0
    for phase, msg in handler.records:
        if phase == "load":
            n_load += 1
            print(f"[{phase}] {msg[:300]}")
    print(f"\npost-warmup compiles: {n_load}")
    by_phase = {}
    for phase, _ in handler.records:
        by_phase[phase] = by_phase.get(phase, 0) + 1
    print("compile counts by phase:", by_phase)


if __name__ == "__main__":
    main()
