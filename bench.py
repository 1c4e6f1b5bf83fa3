"""Benchmark: llava-v1.5-7b-m3 on one TPU chip.

Measures the BASELINE.json north-star metrics — images/sec ViT-L/14-336
encode, p50 TTFT and decode tokens/sec as a function of
``matryoshka_vis_token_scale`` — plus batched/quantized decode, serving
throughput under concurrency, and M3 train-step MFU at the reference
recipe shape (K=5 scales, ctx up to 2048) — and prints ONE JSON line.

Weights are random-init (no network egress for checkpoints); throughput is
weight-value independent.

Measurement protocol (pinned so consecutive runs agree within ~3%):
fixed seeds/prompts, every decode number is the median of N>=5 timed
samples (each sample = 64 generated tokens), synced by a host fetch of the
result (block_until_ready alone under-reports through the tunnel), with
the max-min spread and the kernel path recorded per number.
"""

import json
import os
import threading
import time

import numpy as np

N_DECODE_SAMPLES = 5

# ---- stall watchdog ------------------------------------------------
# The tunneled TPU backend can wedge indefinitely mid-run (device calls
# block forever, no exception).  Every section write bumps _BEAT; a
# daemon thread emits the final JSON line with whatever partial results
# exist and exits if no section completes within _STALL_S.  _STALL_S is
# sized to the longest legitimate silent stretch (a cold 7B QLoRA remat
# compile); sections that legitimately run longer raise it in place.
_BEAT = [time.time()]
_STALL_S = [1200.0]


class _Heartbeat(dict):
    """dict that timestamps every write so the watchdog sees progress."""

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        _BEAT[0] = time.time()


def _emit(results, error=None):
    """Print the one bench JSON line (partial if `error`).

    The full structured output is ALSO written to BENCH_DETAIL.json next
    to this file: the driver's artifact keeps only a tail of stdout, which
    round 4 showed can truncate the sections the verdict needs (ADVICE
    r4) — the detail file preserves the whole record for the repo."""
    scales = results.get("scales") or {}
    headline = (scales.get("144") or {}).get("decode_tok_s")
    cpu = results.get("cpu_reference_decode_tok_s")
    line = {
        "metric": "decode_tokens_per_sec (llava-v1.5-7b-m3, scale=144, 1 chip)",
        "value": headline,
        "unit": "tok/s",
        "vs_baseline": round(headline / cpu, 2) if headline and cpu else None,
        "detail": dict(results),
    }
    if error:
        line["error"] = error
    try:
        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json")
        with open(detail_path, "w") as f:
            json.dump(line, f, indent=1)
    except OSError:
        pass
    print(json.dumps(line), flush=True)


def _start_watchdog(results):
    def run():
        while True:
            time.sleep(30)
            idle = time.time() - _BEAT[0]
            if idle > _STALL_S[0]:
                _emit(results, error=(
                    f"stalled: no section completed for {idle:.0f}s "
                    "(tpu tunnel wedge?) — partial results"))
                os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def _probe_devices(timeout_s=240.0):
    """jax.devices() against a wedged tunnel blocks forever — probe it
    on a side thread so a dead tunnel yields a structured failure line
    instead of a hang."""
    box = {}

    def probe():
        import jax
        box["dev"] = jax.devices()[0]

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "dev" not in box:
        _emit({}, error=f"device probe did not answer within {timeout_s:.0f}s "
                        "(tpu tunnel unavailable)")
        os._exit(0)
    return box["dev"]


def _median(xs):
    return float(np.median(np.asarray(xs)))


def _spread_pct(xs):
    xs = np.asarray(xs, np.float64)
    return float((xs.max() - xs.min()) / np.median(xs) * 100.0)


def _train_bench(scales, T, B, label, lora_7b=False, uniform_buffer=False):
    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.models.clip import ClipVisionConfig
    from matryoshka_mm_tpu.models.llama import LlamaConfig
    from matryoshka_mm_tpu.models.llava import (LlavaConfig, M3Preset,
                                                init_llava_params)
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
    from matryoshka_mm_tpu.train.train_step import M3Batch
    from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step

    scale_str = "[" + ",".join(str(s) for s in scales) + "]"
    if lora_7b:
        # 7B QLoRA feasibility (reference claims 7B LoRA trains on 24GB
        # GPUs, README.md:253): int8 frozen base + LoRA adapters on a
        # single 16GB v5e chip
        import dataclasses

        from matryoshka_mm_tpu.ops.lora import add_lora
        from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace

        cfg = LlavaConfig.llava_v15_7b_m3()   # K=5 scales by default
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, remat=True),
            tokenizer_model_max_length=T + 64)
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        params["llama"] = quantize_llama_params_inplace(params["llama"],
                                                        fuse=False)
        params = add_lora(params, jax.random.PRNGKey(1), r=16, alpha=32.0)
        opt_cfg = OptimizerConfig(total_steps=10, lora_enable=True)
    else:
        # ~1.1B decoder (2048 hidden, 16 layers) + ViT-L tower
        # remat policy: save the flash-attention outputs (out + lse) so
        # the backward skips re-running the flash fwd kernel — together
        # with frozen_vision (which pays for the saved buffers) this is
        # the round-5 train-MFU win: T=2048 0.400 -> 0.439, T=1024
        # 0.437 -> 0.474 measured.  Every richer save set (names:attn,
        # dots) OOMs at these shapes; attn_o fits but measures slower.
        cfg = LlavaConfig(
            llama=LlamaConfig(hidden_size=2048, intermediate_size=5504,
                              num_hidden_layers=16, num_attention_heads=16,
                              num_key_value_heads=16, vocab_size=32000,
                              dtype="bfloat16", remat=True,
                              remat_policy="names:flash_out,flash_lse"),
            vision=ClipVisionConfig.vit_l_14_336(dtype="bfloat16"),
            preset=M3Preset(
                matryoshka_vis_token_scale=f"ver=v0_numtoks={scale_str}",
                moe="t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count"),
            router_feature_types=("cls",),
            tokenizer_model_max_length=T + 64,
        )
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        opt_cfg = OptimizerConfig(total_steps=10)
    state, tx = create_train_state(params, opt_cfg)
    # the CLIP tower is frozen in every bench recipe (reference default):
    # frozen_vision skips its backward instead of zeroing its grads
    step = make_train_step(cfg, tx, donate=True, uniform_buffer=uniform_buffer,
                           frozen_vision=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (B, T)).astype(np.int32)
    ids[:, 3] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :T // 2] = IGNORE_INDEX
    px = rng.standard_normal((B, 3, 336, 336)).astype(np.float32)
    batch = M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                    jnp.ones((B, T), bool))

    state, metrics = step(state, batch)   # compile
    _ = float(metrics["loss"])
    n_steps = 2 if (lora_7b or T >= 2048) else 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])            # host pull = sync
    dt = (time.perf_counter() - t0) / n_steps
    # tokens processed per optimizer step: K scale-sequences per sample
    seq_lens = [T - 1 + s for s in cfg.tokscale_list]
    toks = B * sum(seq_lens)

    # MFU: decoder matmuls 6*P*tokens (fwd+bwd) over all scale-sequences,
    # causal attention 6*h*L_layers*sum(S_k^2) per sample (2*S^2*h fwd per
    # layer after the causal 1/2, x3 for fwd+bwd), and the vision tower
    # encoding each image once — FORWARD-ONLY (2*P_vit): the tower is
    # frozen and frozen_vision skips its backward, exactly like the
    # reference's requires_grad=False CLIP.  Remat recompute flops are
    # NOT counted (standard model-flops MFU).  v5e bf16 peak: 197 TFLOP/s.
    def _count(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "dtype")
                   and not jnp.issubdtype(x.dtype, jnp.integer))

    base = params.get("llama", params)
    p_llm = _count(base)
    if lora_7b:
        # int8 leaves hold the same logical param count as bf16
        p_llm = 6_738_415_616
    p_vit = _count(params.get("vision_tower", {}))
    n_patches = (cfg.vision.image_size // cfg.vision.patch_size) ** 2 + 1
    h = cfg.llama.hidden_size
    n_layers = cfg.llama.num_hidden_layers
    attn_flops = 6.0 * h * n_layers * B * sum(s * s for s in seq_lens)
    flops = 6.0 * p_llm * toks + attn_flops + 2.0 * p_vit * n_patches * B
    peak = 197e12
    return {
        "config": label,
        "step_time_s": round(dt, 3),
        "train_tokens_per_sec": round(toks / dt, 1),
        "mfu": round(flops / dt / peak, 3),
    }


def _train_bench_safe(scales, T, B, label, lora_7b=False, note=None,
                      uniform_buffer=False):
    """Run a train config, halving B on failure (the 16GB single chip
    cannot fit the reference's per-device B=4 at T>=1024 — measured
    18.3GB HBM vs 15.75GB — and the tunneled runtime surfaces that OOM
    as an opaque HTTP 500, so ANY failure at B>1 falls back to B//2 and
    records what happened)."""
    errors = []
    while B >= 1:
        try:
            full = f"{label}, B={B}, remat"
            if uniform_buffer:
                full += ", uniform-buffer"
            out = _train_bench(scales, T, B, full, lora_7b=lora_7b,
                               uniform_buffer=uniform_buffer)
            if errors:
                out["fallback"] = errors
            if note:
                out["note"] = note
            return out
        except Exception as e:  # noqa: BLE001
            errors.append(f"B={B}: {str(e)[:120]}")
            if B == 1:
                return {"config": label, "error": errors}
            B //= 2
    return {"config": label, "error": errors}


def _mk_serving_batcher(params, cfg, speculative_k: int = 0,
                        chunk: int = 16, max_new_pool: int = 256):
    """Build + fully warm the serving batcher (paged, int8 KV, prefix
    cache).  The burst/sustained/SLA sections share ONE batcher so the
    5-minute trace warmup is paid once per bench run.  Round-3 context:
    the warmup covers the FULL admission/decode trace set (solo + every
    group size + prefix-hit path) because cold compiles mid-load land in
    user-visible TTFT (the round-3 12s/25s staircase)."""
    import dataclasses

    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    # int8 KV pools: KV reads scale with B x context (weights are shared),
    # and 2x pages per byte budget is the capacity story under load
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    batcher = ContinuousBatcher(
        params, cfg, max_batch=8, prefill_len=256,
        max_new_tokens=max_new_pool, chunk=chunk, backend="paged",
        prefix_cache=True, speculative_k=speculative_k,
        gen_cfg=GenerationConfig(max_new_tokens=max_new_pool,
                                 decode_chunk=chunk, eos_token_id=-1))
    batcher.warmup(with_image=True, numtoks=144)
    return batcher


def _serving_bench(batcher, n_requests: int = 48, concurrency: int = 6,
                   max_new: int = 96, seed: int = 0):
    """Burst serving throughput under bounded concurrency (reference
    worker default: 5 concurrent generations,
    llava/serve/model_worker.py:268).  Round 5 lengthened the burst
    (18x64 -> 48x96, ~4.6k tokens) so the measured region dominates
    ramp/drain and two cold runs agree within ~10% (round-4 verdict
    found 24% spread on the short burst).  aiohttp transport excluded."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX

    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 31000, (1, 64)).astype(np.int32)
        ids[0, 3] = IMAGE_TOKEN_INDEX
        px = rng.standard_normal((1, 3, 336, 336)).astype(np.float32)
        reqs.append((ids, px))

    results = [None] * n_requests
    sem = threading.Semaphore(concurrency)

    def worker(i):
        with sem:
            t0 = time.perf_counter()
            req = batcher.submit(reqs[i][0], reqs[i][1], numtoks=144,
                                 max_new_tokens=max_new)
            ttft = None
            n_tok = 0
            for chunk in batcher.stream(req):
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n_tok += int(np.asarray(chunk).size)
            results[i] = {"ttft_s": ttft, "n_tok": n_tok,
                          "latency_s": time.perf_counter() - t0}

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    ok = [r for r in results if r is not None]
    ttfts = [r["ttft_s"] for r in ok]
    total_tok = sum(r["n_tok"] for r in ok)
    out = {
        "requests": n_requests, "concurrency": concurrency,
        "ok": len(ok), "max_new_tokens": max_new,
        "wall_s": round(wall, 2),
        "requests_per_s": round(len(ok) / wall, 2),
        "throughput_tok_s": round(total_tok / wall, 1),
        "ttft_s_p50": round(float(np.percentile(ttfts, 50)), 3),
        "ttft_s_p95": round(float(np.percentile(ttfts, 95)), 3),
        # the tail shape (one-off compile vs systematic wait) is only
        # diagnosable from raw values
        "ttft_s_sorted": [round(t, 2) for t in sorted(ttfts)],
        "note": "paged int8-KV pool + prefix cache + int8 fused "
                "decode, batcher-level (HTTP transport excluded)",
    }
    if batcher.spec_k:
        st = batcher.spec_stats
        acc = (st["tokens_emitted"] / st["verify_steps"]
               if st["verify_steps"] else 0.0)
        out["speculative_k"] = batcher.spec_k
        out["tokens_per_verify"] = round(acc, 2)
        out["note"] = (
            "prompt-lookup speculative batching (greedy). CAVEAT: "
            "random-init weights loop, so draft acceptance here is an "
            "upper bound — real-text acceptance tracks output "
            "repetitiveness (copy-heavy VQA answers accept well)")
    return out


def _serving_sustained_bench(batcher, roof_tok_s=None, rate_mult=1.2,
                             n_requests: int = 64, max_new: int = 256,
                             seed: int = 0):
    """Poisson-arrival serving: measures steady-state continuous
    batching (occupancy, aggregate tok/s, fraction of the raw batched
    decode roof).  ``rate_mult`` scales the roof-implied service rate:
    1.2 saturates the pool (throughput + occupancy point), 0.8 is the
    sub-saturation SLA point where steady-state TTFT is system quality,
    not arrival-rate queueing math (round-4 verdict #6)."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX

    lam = rate_mult * (roof_tok_s or 600.0) / max_new
    batcher.occupancy = {"rounds": 0, "active_rows": 0}

    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / lam, n_requests))
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 31000, (1, 64)).astype(np.int32)
        ids[0, 3] = IMAGE_TOKEN_INDEX
        px = rng.standard_normal((1, 3, 336, 336)).astype(np.float32)
        reqs.append((ids, px))

    results = [None] * n_requests

    def worker(i):
        t0 = time.perf_counter()
        req = batcher.submit(reqs[i][0], reqs[i][1], numtoks=144,
                             max_new_tokens=max_new)
        ttft, n_tok = None, 0
        for chunk in batcher.stream(req):
            if ttft is None:
                ttft = time.perf_counter() - t0
            n_tok += int(np.asarray(chunk).size)
        results[i] = {"ttft_s": ttft, "n_tok": n_tok,
                      "latency_s": time.perf_counter() - t0}

    threads = []
    t0 = time.perf_counter()
    for i in range(n_requests):
        dt = arrivals[i] - (time.perf_counter() - t0)
        if dt > 0:
            time.sleep(dt)
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
        _BEAT[0] = time.time()
    for th in threads:
        th.join()
        _BEAT[0] = time.time()
    wall = time.perf_counter() - t0
    ok = [r for r in results if r is not None]
    total_tok = sum(r["n_tok"] for r in ok)
    occ = batcher.occupancy
    occupancy = (occ["active_rows"] / (occ["rounds"] * batcher.max_batch)
                 if occ["rounds"] else 0.0)
    ttfts = sorted(r["ttft_s"] for r in ok)
    agg = total_tok / wall
    out = {
        "requests": n_requests, "max_new_tokens": max_new,
        "rate_mult": rate_mult,
        "arrival_rate_req_s": round(lam, 2),
        "wall_s": round(wall, 1), "ok": len(ok),
        "throughput_tok_s": round(agg, 1),
        "occupancy": round(occupancy, 3),
        "ttft_s_p50": round(float(np.percentile(ttfts, 50)), 2),
        "ttft_s_p95": round(float(np.percentile(ttfts, 95)), 2),
        "note": f"Poisson arrivals at {rate_mult}x the roof-implied "
                "service rate; paged int8-KV pool + prefix cache + int8 "
                "fused decode; occupancy = mean active rows / max_batch "
                "over decode rounds",
    }
    if roof_tok_s:
        out["roof_tok_s_b8"] = roof_tok_s
        out["fraction_of_roof"] = round(agg / roof_tok_s, 3)
    return out


def _cpu_reference_tok_s(cfg, n_steps: int = 2):
    """Measured CPU-host reference: the IDENTICAL jitted decode graph
    (embed -> stacked-layer scan -> lm_head, _decode_chunk_fn) run on the
    CPU backend with the same 7B shapes, extrapolated from ``n_steps``
    decode steps.  This replaces the earlier hand-estimated 3.5 tok/s
    figure — BASELINE.md's north-star is >=5x *measured* CPU-reference
    throughput per chip.

    Two deliberate choices that both FAVOR the CPU baseline (i.e. make the
    reported ratio conservative):
    * f32 weights: XLA-CPU bf16 matvecs are emulated (~0.7GB/s measured on
      this host vs 8.4GB/s for f32), so f32 is the CPU deployment a user
      would actually run;
    * zero-init weights (timing is weight-value independent; 27GB of f32
      PRNG on one core would dominate the bench wall-clock).

    Weights live on the CPU backend (cross-backend device transfers are
    unsupported on the tunneled-TPU platform, so nothing is reused from
    the TPU run)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.generate import GenerationConfig, _decode_chunk_fn
    from matryoshka_mm_tpu.models.llama import init_kv_cache, init_llama_params

    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, dtype="float32"))
    cpu = jax.devices("cpu")[0]
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=n_steps)
    with jax.default_device(cpu):
        shapes = jax.eval_shape(lambda k: init_llama_params(k, cfg.llama),
                                jax.random.PRNGKey(0))
        params = {"llama": jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)}
        cache = init_kv_cache(cfg.llama, 1, 320)
        cache = cache._replace(write_idx=jnp.asarray(256, jnp.int32))
        decode = _decode_chunk_fn(cfg, gen_cfg, n_steps)
        # donated cache: keep a second copy for the timed call (dtype-
        # preserving — `x + 0` would promote the bool validity mask)
        cache2 = jax.tree.map(jnp.array, cache)
        out = decode(params, cache, jnp.zeros((1,), jnp.int32),
                     jnp.full((1,), 256, jnp.int32), jnp.zeros((1,), bool),
                     jax.random.PRNGKey(0))         # compile + warm
        _ = np.asarray(jax.device_get(out[1]))
        t0 = time.perf_counter()
        out = decode(params, cache2, jnp.zeros((1,), jnp.int32),
                     jnp.full((1,), 256, jnp.int32), jnp.zeros((1,), bool),
                     jax.random.PRNGKey(0))
        _ = np.asarray(jax.device_get(out[1]))
        dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    dev = _probe_devices()
    results = _Heartbeat({"device": str(dev), "platform": dev.platform})
    _start_watchdog(results)
    try:
        _main_sections(dev.platform, results)
    except Exception as e:  # noqa: BLE001
        # one crashed section must not cost the whole round's record:
        # emit everything measured so far plus the error
        _emit(results, error=f"{type(e).__name__}: {str(e)[:300]}")
        raise


def _main_sections(platform, results):
    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, _decode_chunk_fn, _prefill_fn
    from matryoshka_mm_tpu.models.clip import ClipVisionConfig, clip_vision_forward, init_clip_params
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

    # --------------------------------------------------------------
    # 0) HBM bandwidth calibration: a bare Pallas read/copy kernel with
    # no compute (ops/hbm_probe.py).  Independent check of the ~640 GB/s
    # "practical DMA ceiling" the int4-at-92%-of-light claim rests on
    # (docs/Architecture.md): if the bare kernel matched the 819 GB/s
    # nameplate, the decode kernels would have headroom after all.
    # --------------------------------------------------------------
    if platform != "cpu":
        try:
            from matryoshka_mm_tpu.ops.hbm_probe import (hbm_copy_gb_s,
                                                         hbm_read_gb_s)

            results["hbm_read_gb_s"] = round(hbm_read_gb_s(), 1)
            results["hbm_copy_gb_s"] = round(hbm_copy_gb_s(), 1)
        except Exception as e:  # noqa: BLE001
            results["hbm_probe_error"] = str(e)[:200]

    # --------------------------------------------------------------
    # 1) ViT-L/14-336 encode throughput (images/sec)
    # --------------------------------------------------------------
    vis_cfg = ClipVisionConfig.vit_l_14_336(dtype="bfloat16")
    vis_params = init_clip_params(jax.random.PRNGKey(0), vis_cfg)
    B_enc = 16
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((B_enc, 3, 336, 336)),
        jnp.bfloat16)

    @jax.jit
    def encode(p, x):
        return clip_vision_forward(p, x, vis_cfg)["patch"]

    def sync(x):
        # this platform's block_until_ready is asynchronous; a host pull of a
        # tiny slice is the only reliable completion barrier
        return np.asarray(jax.device_get(jnp.sum(x[0, :1, :1]).astype(jnp.float32)))

    sync(encode(vis_params, px))  # compile
    times = []
    for _ in range(N_DECODE_SAMPLES):
        t0 = time.perf_counter()
        sync(encode(vis_params, px))
        times.append(time.perf_counter() - t0)
    vit_imgs_per_sec = B_enc / _median(times)
    results["vit_encode_images_per_sec"] = round(vit_imgs_per_sec, 2)
    del vis_params

    # --------------------------------------------------------------
    # 2) 7B M3: TTFT + decode tok/s per token scale
    # --------------------------------------------------------------
    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, params)

    T = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (1, T)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    px1 = jnp.asarray(rng.standard_normal((1, 3, 336, 336)), jnp.float32)
    ids = jnp.asarray(ids)

    gen_cfg = GenerationConfig(max_new_tokens=64, decode_chunk=32)
    decode_meta = _Heartbeat()

    def _timed_decode(decode, params, cache, first, lengths, B):
        """Median decode tok/s over N samples of 2x32-token chunks, each
        synced by a host fetch."""
        finished = jnp.zeros((B,), bool)
        key = jax.random.PRNGKey(0)
        c, tok, lens, fin, toks = decode(params, cache, first, lengths,
                                         finished, key)
        _ = np.asarray(jax.device_get(tok))  # compile+sync
        rates = []
        for _ in range(N_DECODE_SAMPLES):
            t0 = time.perf_counter()
            for _ in range(2):
                c, tok, lens, fin, toks = decode(params, c, tok, lens, fin, key)
            _ = np.asarray(jax.device_get(tok))
            rates.append(B * 64 / (time.perf_counter() - t0))
        return rates, c

    scale_metrics = _Heartbeat()
    for numtoks in cfg.tokscale_list:
        L = -(-(T - 1 + numtoks) // 64) * 64
        capacity = L + gen_cfg.max_new_tokens
        prefill = _prefill_fn(cfg, numtoks, L, capacity)
        logits, cache, lengths, _ = prefill(params, ids, px1)
        _ = np.asarray(jax.device_get(logits[0, :2]))  # compile+sync
        ttfts = []
        for _ in range(N_DECODE_SAMPLES):
            t0 = time.perf_counter()
            logits, cache, lengths, _ = prefill(params, ids, px1)
            _ = np.asarray(jax.device_get(logits[0, :2]))
            ttfts.append(time.perf_counter() - t0)
        ttft = _median(ttfts)

        decode = _decode_chunk_fn(cfg, gen_cfg, 32)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        rates, c = _timed_decode(decode, params, cache, first, lengths, 1)
        scale_metrics[str(numtoks)] = {
            "ttft_ms_p50": round(ttft * 1e3, 2),
            "decode_tok_s": round(_median(rates), 2),
            "spread_pct": round(_spread_pct(rates), 1),
        }
        del cache, c

    # --------------------------------------------------------------
    # 3) batched decode (continuous-batching serving config).
    # bf16 at B>=2 works since weights moved to (out, in) storage (the
    # (in, out) layout made XLA hoist ~3GB of layout-converted stacked
    # weight copies out of the steps loop — models/llama.py docstring);
    # int8 (load_8bit) remains the high-throughput deployment.
    # --------------------------------------------------------------
    import dataclasses

    cfg_kv8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))

    def _batched_decode(tag, B, kernel, bcfg=None):
        bcfg = bcfg or cfg
        numtoks = 144
        L = -(-(T - 1 + numtoks) // 64) * 64
        capacity = L + gen_cfg.max_new_tokens
        ids_b = jnp.tile(ids, (B, 1))
        px_b = jnp.tile(px1, (B, 1, 1, 1))
        prefill = _prefill_fn(bcfg, numtoks, L, capacity)
        logits, cache, lengths, _ = prefill(params, ids_b, px_b)
        _ = np.asarray(jax.device_get(logits[0, :2]))
        decode = _decode_chunk_fn(bcfg, gen_cfg, 32)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        rates, _c = _timed_decode(decode, params, cache, first, lengths, B)
        results[tag] = round(_median(rates), 2)
        decode_meta[tag] = {"spread_pct": round(_spread_pct(rates), 1),
                            "kernel": kernel,
                            "samples": N_DECODE_SAMPLES}

    _batched_decode("bf16_decode_tok_s_b4", 4, "xla_bf16_dot")

    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace

    params["llama"] = quantize_llama_params_inplace(params["llama"])

    k8 = "pallas_fused_int8 (stacked scalar-prefetch, ops/int4_matmul.py)"
    for B, tag in ((1, "int8_decode_tok_s_b1"), (4, "int8_decode_tok_s_b4"),
                   (8, "int8_decode_tok_s_b8")):
        _batched_decode(tag, B, k8)
    # int8 KV (per-slot scales, in-kernel dequant): KV reads scale with
    # B x context while weight reads stay constant, so the win grows with
    # batch; int8 KV also doubles page capacity under the paged backend
    _batched_decode("int8_kv8_decode_tok_s_b8", 8, k8 + " + int8 KV",
                    bcfg=cfg_kv8)

    # --------------------------------------------------------------
    # 3a) serving: continuous batching under concurrency, int8 weights.
    # ONE warmed batcher serves the burst, burst-repeat, sustained, and
    # SLA sections (same pool config as the int8+kv8 roof row above).
    # --------------------------------------------------------------
    roof = results.get("int8_kv8_decode_tok_s_b8")
    _STALL_S[0] = max(_STALL_S[0], 2400.0)
    try:
        batcher = _mk_serving_batcher(params, cfg)
        try:
            results["serving"] = _serving_bench(batcher)
            # in-process repeat with fresh prompts: the spread between
            # these two is the run-to-run noise floor of the burst number
            results["serving_repeat"] = _serving_bench(batcher, seed=1)
            # steady state at saturation: occupancy + fraction-of-roof
            results["serving_sustained"] = _serving_sustained_bench(
                batcher, roof_tok_s=roof, rate_mult=1.2)
            # sub-saturation SLA point: steady-state TTFT is system
            # quality here, not arrival-rate queueing math.  "0.8x load"
            # means 80% of the MEASURED sustained capacity (the queueing
            # utilization rho=0.8), not 80% of the raw decode roof — the
            # roof excludes prefill work, so 0.8x roof can still exceed
            # real capacity and measure pure queue growth.
            cap = (results["serving_sustained"].get("throughput_tok_s")
                   or roof)
            results["serving_sla"] = _serving_sustained_bench(
                batcher, roof_tok_s=roof, rate_mult=0.8 * cap / roof,
                n_requests=48)
            results["serving_sla"]["note"] = (
                "Poisson arrivals at 0.8x the MEASURED sustained "
                "capacity (rho=0.8); roof_tok_s/fraction kept for "
                "reference only")
        finally:
            batcher.shutdown()
            batcher = None
    except Exception as e:  # noqa: BLE001
        results.setdefault("serving", {"error": str(e)[:200]})
        results["serving_error"] = str(e)[:200]
    try:
        spec = _mk_serving_batcher(params, cfg, speculative_k=4, chunk=8,
                                   max_new_pool=96)
        try:
            # kept at the round-4 shape (18 x 64) for cross-round
            # comparability of tokens_per_verify
            results["serving_speculative"] = _serving_bench(
                spec, n_requests=18, max_new=64)
        finally:
            spec.shutdown()
            spec = None
    except Exception as e:  # noqa: BLE001
        results["serving_speculative"] = {"error": str(e)[:200]}
    del params

    # --------------------------------------------------------------
    # 3b) int4 weights (split-half e8m packed): the fused Pallas
    # dequant-matmul (ops/int4_matmul.py) streams packed bytes straight
    # to the MXU — fastest single-stream decode AND smallest footprint
    # (3.6GB for the 7B LM frees HBM for bigger KV pools / batch)
    # --------------------------------------------------------------
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_int4

    def _init_quant_int4():
        p = init_llava_params(jax.random.PRNGKey(0), cfg)
        p["llama"] = quantize_llama_params_int4(p["llama"], inplace=True)
        return p

    # the `del params` above frees the serving-section weights through
    # the tunnel ASYNCHRONOUSLY; a fresh 13.5GB bf16 init can race the
    # deallocation and land on a still-occupied device (observed as a
    # runtime ResourceExhausted mid-quantize) — settle and retry
    params = None
    for attempt in range(4):
        try:
            params = _init_quant_int4()
            break
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 3:
                raise
            results[f"int4_init_retry_{attempt}"] = str(e)[:80]
            time.sleep(20.0 * (attempt + 1))
    k4 = "pallas_fused_int4 (split-half e8m, ops/int4_matmul.py)"
    for B, tag in ((1, "int4_decode_tok_s_b1"), (4, "int4_decode_tok_s_b4"),
                   (8, "int4_decode_tok_s_b8")):
        _batched_decode(tag, B, k4)
    for B, tag in ((1, "int4_kv8_decode_tok_s_b1"),
                   (8, "int4_kv8_decode_tok_s_b8")):
        _batched_decode(tag, B, k4 + " + int8 KV", bcfg=cfg_kv8)

    del params

    results["scales"] = scale_metrics
    results["decode_meta"] = decode_meta

    # --------------------------------------------------------------
    # 4) M3 training-step throughput.  K=3/T=256 kept for cross-round
    # comparability; K=5 at T=1024/2048 measures the reference recipe
    # shape (scripts/v1_5/finetune.sh:33,36 — K=5 scales, ctx 2048; the
    # reference's per-device B=4 is halved on OOM for the 16GB chip);
    # plus a 7B QLoRA on-chip feasibility step (README.md:253).
    # --------------------------------------------------------------
    # uniform_buffer: the capacity-bucketed forward's heterogeneous temps
    # fragment the TPU allocator 44% at this shape and OOM at B=4 (the
    # round-4 `remote_compile HTTP 500` fallback, root-caused round 5 —
    # deterministic 17.98G>15.75G compile OOM); the uniform single-bucket
    # forward fits B=4 and restores the round-3 comparability config.
    results["train"] = _train_bench_safe(
        [1, 36, 144], 256, 4, "1.1B llama + ViT-L, K=3 scales, T=256",
        uniform_buffer=True)
    # B pinned to 2 at K=5: the reference per-device B=4 needs 18.3GB HBM
    # at T=1024 (measured via the memory probe) vs 15.75GB on this chip,
    # and the failed compile costs minutes per bench run — the halving
    # backstop in _train_bench_safe still covers regressions.
    oom_note = "reference per-device B=4 OOMs on 16GB (18.3GB HBM needed)"
    results["train_k5_t1024"] = _train_bench_safe(
        [1, 9, 36, 144, 576], 1024, 2, "1.1B llama + ViT-L, K=5 scales, T=1024",
        note=oom_note)
    results["train_k5_t2048"] = _train_bench_safe(
        [1, 9, 36, 144, 576], 2048, 2, "1.1B llama + ViT-L, K=5 scales, T=2048",
        note=oom_note)
    results["train_lora_7b"] = _train_bench_safe(
        [1, 9, 36, 144, 576], 1024, 1,
        "7B QLoRA (int8 base + LoRA r16), K=5 scales, T=1024", lora_7b=True)

    headline = scale_metrics["144"]["decode_tok_s"]
    # BASELINE north-star: >=5x MEASURED CPU-reference throughput per chip.
    # The CPU reference is the identical jitted decode graph on the host
    # CPU backend (few steps, extrapolated).
    if platform == "cpu":
        cpu_tok_s = headline  # bench itself ran on CPU; ratio is 1 by def.
    else:
        # the measurement costs ~50 min of single-core wall clock (XLA-CPU
        # compile + two 27GB f32 decode steps), so it is cached on disk;
        # delete CPU_REFERENCE.json to re-measure
        cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "CPU_REFERENCE.json")
        cpu_tok_s = None
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                cpu_tok_s = json.load(f)["cpu_tok_s"]
            results["cpu_reference_cached"] = True
        else:
            try:
                # ~50 min of single-core wall clock with no section
                # writes — not a tunnel stall
                _STALL_S[0] = 4500.0
                cpu_tok_s = _cpu_reference_tok_s(cfg)
                with open(cache_path, "w") as f:
                    json.dump({"cpu_tok_s": cpu_tok_s,
                               "cores": os.cpu_count(),
                               "note": "same jitted decode graph, f32 "
                                       "weights, single-host CPU backend"},
                              f)
            except Exception as e:
                results["cpu_reference_error"] = str(e)[:200]
    if cpu_tok_s:
        results["cpu_reference_decode_tok_s"] = round(cpu_tok_s, 4)
        results["cpu_reference_cores"] = os.cpu_count()
    results["baseline_note"] = (
        "vs_baseline = tpu tok/s / measured cpu tok/s (identical jitted "
        "decode graph on this host's single-core CPU backend; north-star "
        "target is >= 5.0). The box has 1 core — scale by ~bandwidth for "
        "a full CPU server estimate.")
    _emit(results)


if __name__ == "__main__":
    main()
