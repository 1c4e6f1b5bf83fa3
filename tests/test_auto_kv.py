"""--kv-cache-dtype auto: pool-pressure KV dtype selection.

int8 KV is a capacity/speed tradeoff (measured round 3: b8 674 -> 562
tok/s for 2x pages per byte); "auto" must pick it only when the bf16
pool won't fit next to the weights (serve/model_worker.py
resolve_auto_kv_dtype).
"""

import numpy as np


def _cfg():
    from matryoshka_mm_tpu.models.llava import LlavaConfig

    return LlavaConfig.llava_v15_7b_m3()


def test_resolve_auto_kv_dtype_policy():
    from matryoshka_mm_tpu.serve.model_worker import resolve_auto_kv_dtype

    cfg = _cfg()
    w7b_int4 = int(3.6e9)
    # 7B int4 on a 16GB chip: a 4-row x 1.2k-token pool (~2.5GB bf16)
    # fits -> bf16; a 16-row x 4k pool (~33GB) cannot -> int8
    assert resolve_auto_kv_dtype(cfg, w7b_int4, 4, 1280,
                                 hbm_bytes=16 << 30) == ""
    assert resolve_auto_kv_dtype(cfg, w7b_int4, 16, 4096,
                                 hbm_bytes=16 << 30) == "int8"
    # bf16 weights (13.5GB) leave no room for even a small pool
    assert resolve_auto_kv_dtype(cfg, int(13.5e9), 4, 1280,
                                 hbm_bytes=16 << 30) == "int8"


def test_worker_auto_kv_resolves():
    """A tiny-model worker with kv_cache_dtype='auto' resolves to bf16
    (tiny pool, tiny weights) and still serves."""
    import json

    from matryoshka_mm_tpu.serve.model_worker import ModelWorker

    w = ModelWorker("http://localhost:1", "http://localhost:2", "t", True,
                    "debug://tiny", None, "tiny", continuous_batching=True,
                    max_batch=2, kv_backend="paged", kv_cache_dtype="auto")
    assert w.model.cfg.llama.kv_cache_dtype == ""
    gen = w.generate_stream_gate({"prompt": "USER: hi ASSISTANT:",
                                  "temperature": 0.0, "max_new_tokens": 4})
    last = None
    for chunk in gen:
        last = json.loads(chunk[:-1])
    assert last["error_code"] == 0
    w.batcher.shutdown()
