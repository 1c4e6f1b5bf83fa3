"""Round-5: sweep the paged batcher's decode chunk under sustained load.

The diag accounting shows a ~160ms/round fixed cost (prefill work +
host demux/dispatch) on top of the 226ms of pure b8 decode per
16-token round; a bigger chunk amortizes the fixed cost over more
tokens per round.  Reports fraction-of-roof per chunk.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_inplace

    roof = float(sys.argv[1]) if len(sys.argv) > 1 else 565.0
    chunks = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else (24, 32))]

    cfg = LlavaConfig.llava_v15_7b_m3()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params_inplace(params["llama"])
    print("params ready", flush=True)

    for chunk in chunks:
        t0 = time.perf_counter()
        batcher = bench._mk_serving_batcher(params, cfg, chunk=chunk)
        print(f"chunk={chunk} warmed in {time.perf_counter() - t0:.0f}s",
              flush=True)
        try:
            out = bench._serving_sustained_bench(batcher, roof_tok_s=roof,
                                                 rate_mult=1.2)
            print(json.dumps({f"sustained_chunk{chunk}": out}), flush=True)
        finally:
            batcher.shutdown()


if __name__ == "__main__":
    main()
