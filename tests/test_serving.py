"""SGLang-style worker: param mapping + in-process HTTP drive."""

import json

import numpy as np
import pytest


def test_sglang_param_mapping():
    from matryoshka_mm_tpu.serve.sglang_worker import _params_from_sglang

    p = _params_from_sglang({
        "text": "USER: <image> hi ASSISTANT:", "image_data": "b64str",
        "sampling_params": {"temperature": 0.7, "max_new_tokens": 32,
                            "top_p": 0.9, "stop": "</s>"},
        "matryoshka_vis_token_scale": "ver=v0_numtoks=4"})
    assert p["prompt"].startswith("USER:")
    assert p["images"] == ["b64str"]        # scalar image wrapped in a list
    assert p["temperature"] == 0.7 and p["top_p"] == 0.9
    assert p["max_new_tokens"] == 32 and p["stop"] == "</s>"
    assert p["matryoshka_vis_token_scale"] == "ver=v0_numtoks=4"
    # no image, defaults
    p2 = _params_from_sglang({"text": "hi"})
    assert p2["images"] is None and p2["temperature"] == 0.0


def test_sglang_app_http():
    """Drive the local-mode SGLang app through aiohttp's in-process client:
    /generate (json + SSE + 400), /get_model_info, /worker_generate_stream."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from matryoshka_mm_tpu.serve.model_worker import ModelWorker
    from matryoshka_mm_tpu.serve.sglang_worker import build_sglang_app

    worker = ModelWorker("http://localhost:1", "http://localhost:2", "t",
                         True, "debug://tiny", None, None,
                         continuous_batching=True, max_batch=2,
                         kv_backend="paged", prefix_cache=True)
    app = build_sglang_app(worker)

    async def drive():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/generate", json={
                "text": "USER: say something ASSISTANT:",
                "sampling_params": {"temperature": 0.0, "max_new_tokens": 6}})
            assert r.status == 200
            body = await r.json()
            assert body["meta_info"]["error_code"] == 0
            assert body["text"] and "ASSISTANT" not in body["text"]

            r = await client.post("/generate", json={
                "text": "USER: stream me ASSISTANT:", "stream": True,
                "sampling_params": {"temperature": 0.0, "max_new_tokens": 6}})
            raw = await r.read()
            events = [e for e in raw.split(b"\n\n") if e.startswith(b"data: ")]
            assert events[-1] == b"data: [DONE]"
            assert len(events) >= 2

            r = await client.post("/generate", json={"sampling_params": {}})
            assert r.status == 400

            r = await client.get("/get_model_info")
            assert (await r.json())["is_generation"] is True

            r = await client.post("/worker_generate_stream", json={
                "prompt": "USER: proto ASSISTANT:", "temperature": 0.0,
                "max_new_tokens": 4})
            raw = await r.read()
            last = [json.loads(c) for c in raw.split(b"\x00") if c.strip()][-1]
            assert last["error_code"] == 0
        finally:
            await client.close()

    try:
        asyncio.run(drive())
    finally:
        worker.batcher.shutdown()
