"""Sweep the decode-kernel block geometry on the real chip.

The int4 b1 profile (scripts/profile_decode.py) shows the in-scan fused
kernels streaming at ~590-610 GB/s vs ~680 isolated — the suspects are
(a) the strided down-projection blocks (bk 2816 of a 5632-wide padded
row) and (b) the 2-3MB block cap forcing more, shorter grid steps than
VMEM requires.  This driver re-runs the full 7B int4 b1 decode chunk
under combinations of

    M3_BLOCK_BYTES_DECODE   decode-narrow weight-block byte cap
    M3_BK_MAX_DECODE        max lanes of a full-row BK span

(read at import time by ops/int4_matmul.py, hence one subprocess per
combo) and prints tok/s per combo.  Run with nothing else on the chip
or the single host core.

Usage: python scripts/sweep_decode_blocks.py
"""

import json
import os
import subprocess
import sys

COMBOS = [
    ("baseline_3MB_bk4096", {}),
    ("6MB_bk4096", {"M3_BLOCK_BYTES_DECODE": str(6 << 20)}),
    ("6MB_bk6144", {"M3_BLOCK_BYTES_DECODE": str(6 << 20),
                    "M3_BK_MAX_DECODE": "6144"}),
    ("12MB_bk6144", {"M3_BLOCK_BYTES_DECODE": str(12 << 20),
                     "M3_BK_MAX_DECODE": "6144"}),
]

CHILD = r"""
import time, sys
import numpy as np
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, _decode_chunk_fn, _prefill_fn
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.ops.quant import quantize_llama_params_int4

cfg = LlavaConfig.llava_v15_7b_m3()
params = init_llava_params(jax.random.PRNGKey(0), cfg)
params["llama"] = quantize_llama_params_int4(params["llama"], inplace=True)
T, numtoks = 64, 144
L = -(-(T - 1 + numtoks) // 64) * 64
gen_cfg = GenerationConfig(max_new_tokens=64, decode_chunk=32)
capacity = L + gen_cfg.max_new_tokens
rng = np.random.default_rng(0)
ids = rng.integers(5, 31000, (1, T)).astype(np.int32); ids[0, 3] = IMAGE_TOKEN_INDEX
px = jnp.asarray(rng.standard_normal((1, 3, 336, 336)), jnp.float32)
logits, cache, lengths, _ = _prefill_fn(cfg, numtoks, L, capacity)(
    params, jnp.asarray(ids), px)
_ = np.asarray(jax.device_get(logits[0, :2]))
decode = _decode_chunk_fn(cfg, gen_cfg, 32)
first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
fin = jnp.zeros((1,), bool); key = jax.random.PRNGKey(0)
c, tok, lens, fin2, toks = decode(params, cache, first, lengths, fin, key)
_ = np.asarray(jax.device_get(tok))
rates = []
for _i in range(5):
    t1 = time.perf_counter()
    for _j in range(2):
        c, tok, lens, fin2, toks = decode(params, c, tok, lens, fin2, key)
    _ = np.asarray(jax.device_get(tok))
    rates.append(64 / (time.perf_counter() - t1))
print("RESULT", sorted(rates)[len(rates)//2], flush=True)
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name, env in COMBOS:
        child_env = dict(os.environ, **env)
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": repo}],
                env=child_env, capture_output=True, text=True,
                timeout=1500)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("RESULT")]
            results[name] = (round(float(line[0].split()[1]), 1) if line
                             else f"no result: {out.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
