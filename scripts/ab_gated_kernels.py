"""A/B the env-gated decode kernel paths on the real chip.

Round-3 landed two opt-in decode paths pending hardware validation:

- ``M3_TAIL_KERNEL=1``  — phase-fused layer-tail + norm+qkv kernels
  (ops/fused_mlp.py), claimed token-exact vs the unfused path;
- ``M3_W4A8=1``         — int4 weights with int8 activations on the
  s8xs8->s32 MXU path (ops/int4_matmul.py), approximate (per-row
  activation quantization).

This script times the 7B b1 (and b8) decode under each gate combo and
checks greedy-token agreement vs the ungated baseline, so the flip-the-
default decision is one command.  Run scripts/tpu_kernel_check.py FIRST
(numerical validation at op level); this is the end-to-end half.

The env gates are read at trace time (ops/quant.py), so each combo gets
a freshly built ``_decode_chunk_fn`` and pays one compile.

Usage: python scripts/ab_gated_kernels.py [--bits 4|8|all] [--steps 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = ("M3_TAIL_KERNEL", "M3_W4A8")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _set_gates(tail: bool, w4a8: bool):
    for name, on in zip(GATES, (tail, w4a8)):
        if on:
            os.environ[name] = "1"
        else:
            os.environ.pop(name, None)


def run_bits(bits: int, steps: int, samples: int):
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
    else:
        params["llama"] = quantize_llama_params_inplace(params["llama"])

    T, numtoks = 64, 144
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (1, T)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids)
    px = jnp.asarray(rng.standard_normal((1, 3, 336, 336)), jnp.float32)
    L = -(-(T - 1 + numtoks) // 64) * 64
    gen_cfg = GenerationConfig(max_new_tokens=steps, decode_chunk=32)

    combos = [("baseline", False, False), ("tail", True, False)]
    if bits == 4:
        combos += [("w4a8", False, True), ("tail+w4a8", True, True)]

    out = {}
    base_tokens = {}
    for name, tail, w4a8 in combos:
        _set_gates(tail, w4a8)
        # _decode_chunk_fn is lru_cached on (cfg, shapes) and the env
        # gates are read at TRACE time, so a cached jitted fn from the
        # previous combo would silently re-measure that combo's graph —
        # drop the cache so every combo traces (and compiles) fresh.
        # _prefill_fn stays cached: both gates require decode-narrow rows
        # (<= 32, ops/fused_mlp.py *_eligible), so prefill graphs are
        # gate-independent and recompiling them would waste tunnel time.
        _decode_chunk_fn.cache_clear()
        for B in (1, 8):
            prefill = _prefill_fn(cfg, numtoks, L, L + steps)
            ids_b = jnp.tile(ids, (B, 1))
            px_b = jnp.tile(px, (B, 1, 1, 1))
            logits, cache, lengths, _ = prefill(params, ids_b, px_b)
            decode = _decode_chunk_fn(cfg, gen_cfg, 32)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            finished = jnp.zeros((B,), bool)
            key = jax.random.PRNGKey(0)

            # one greedy pass for the token-agreement check
            c, tok, lens, fin, toks = decode(params, cache, first, lengths,
                                             finished, key)
            c, tok, lens, fin, toks2 = decode(params, c, tok, lens, fin, key)
            got = np.concatenate([np.asarray(toks), np.asarray(toks2)],
                                 axis=1)[0]
            if name == "baseline":
                base_tokens[B] = got
                agree = len(got)
            else:
                agree = int((got == base_tokens[B]).sum())

            rates = []
            for _ in range(samples):
                t0 = time.perf_counter()
                c2, tok2, l2, f2, _t = decode(params, cache, first, lengths,
                                              finished, key)
                c2, tok2, l2, f2, _t = decode(params, c2, tok2, l2, f2, key)
                _ = np.asarray(jax.device_get(tok2))
                rates.append(B * 64 / (time.perf_counter() - t0))
            out[f"int{bits}_{name}_b{B}"] = {
                "tok_s": round(_median(rates), 2),
                "greedy_agree": f"{agree}/{len(got)}",
            }
            print(json.dumps({f"int{bits}_{name}_b{B}":
                              out[f"int{bits}_{name}_b{B}"]}), flush=True)
            del cache, c, c2
    _set_gates(False, False)
    _decode_chunk_fn.cache_clear()
    del params
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", default="all", choices=["4", "8", "all"])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    results = {}
    for bits in ([4, 8] if args.bits == "all" else [int(args.bits)]):
        results.update(run_bits(bits, args.steps, args.samples))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
