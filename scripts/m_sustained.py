"""Round-5 targeted measurement: sustained serving fraction-of-roof.

Measures the int8+kv8 b8 raw decode roof, then drives the warmed paged
batcher with the Poisson sustained bench at 1.2x (saturation) — the
round-4 verdict's #1 ask is fraction_of_roof >= 0.6.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, _decode_chunk_fn, _prefill_fn
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace
    import dataclasses

    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params_inplace(params["llama"])
    print("params ready", flush=True)

    cfg_kv8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))

    # roof: int8 weights + int8 KV, B=8 batched decode
    T = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (1, T)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    px1 = jnp.asarray(rng.standard_normal((1, 3, 336, 336)), jnp.float32)
    ids = jnp.asarray(ids)
    gen_cfg = GenerationConfig(max_new_tokens=64, decode_chunk=32)
    numtoks = 144
    L = -(-(T - 1 + numtoks) // 64) * 64
    capacity = L + gen_cfg.max_new_tokens
    B = 8
    ids_b = jnp.tile(ids, (B, 1))
    px_b = jnp.tile(px1, (B, 1, 1, 1))
    prefill = _prefill_fn(cfg_kv8, numtoks, L, capacity)
    logits, cache, lengths, _ = prefill(params, ids_b, px_b)
    _ = np.asarray(jax.device_get(logits[0, :2]))
    decode = _decode_chunk_fn(cfg_kv8, gen_cfg, 32)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    fin = jnp.zeros((B,), bool)
    key = jax.random.PRNGKey(0)
    c, tok, lens, f2, toks = decode(params, cache, first, lengths, fin, key)
    _ = np.asarray(jax.device_get(tok))
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            c, tok, lens, f2, toks = decode(params, c, tok, lens, f2, key)
        _ = np.asarray(jax.device_get(tok))
        rates.append(B * 64 / (time.perf_counter() - t0))
    roof = float(np.median(rates))
    print(json.dumps({"roof_int8_kv8_b8": round(roof, 1)}), flush=True)
    del cache, c

    batcher = bench._mk_serving_batcher(params, cfg)
    print("batcher warmed", flush=True)
    try:
        out = bench._serving_sustained_bench(batcher, roof_tok_s=roof,
                                             rate_mult=1.2)
        print(json.dumps({"serving_sustained": out}), flush=True)
        out2 = bench._serving_sustained_bench(batcher, roof_tok_s=roof,
                                              rate_mult=1.2, seed=1)
        print(json.dumps({"serving_sustained_repeat": out2}), flush=True)
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()
