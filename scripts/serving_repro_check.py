"""Round-4 'done' check for the serving TTFT fix (VERDICT #1).

Runs bench.py's serving section COLD (fresh process state per run is the
caller's job — invoke this script twice in separate processes) and prints
the block as JSON.  Done-criterion: two consecutive cold runs agree
within ~10% on throughput AND p95 TTFT < 1.5s, independent of run
ordering.  Also runs the sustained-load block once (occupancy +
fraction-of-roof).

Usage: python scripts/serving_repro_check.py [--sustained]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sustained", action="store_true")
    ap.add_argument("--roof", type=float, default=None,
                    help="b8 int8+kv8 decode roof tok/s for the "
                         "fraction-of-roof metric")
    args = ap.parse_args()

    import jax

    from bench import (_mk_serving_batcher, _serving_bench,
                       _serving_sustained_bench)
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace

    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params_inplace(params["llama"])

    batcher = _mk_serving_batcher(params, cfg)
    try:
        if args.sustained:
            out = _serving_sustained_bench(batcher, roof_tok_s=args.roof)
            print(json.dumps({"serving_sustained": out}, indent=1),
                  flush=True)
        else:
            out = _serving_bench(batcher)
            print(json.dumps({"serving": out}, indent=1), flush=True)
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()
