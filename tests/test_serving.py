"""SGLang-style worker: param mapping + in-process HTTP drive."""

import json
import os

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


def test_web_server_logging_votes_moderation(tmp_path, monkeypatch):
    """Web UI observability (reference: gradio_web_server.py:106-110,
    316-323, 377-385): daily conversation jsonl + hashed image archive,
    vote/flag endpoints, and the moderation gate that blocks flagged
    input before it reaches a worker."""
    import asyncio
    import base64

    from aiohttp.test_utils import TestClient, TestServer

    from matryoshka_mm_tpu.serve import web_server as W

    log_dir = str(tmp_path / "weblogs")
    app = W.build_app("http://localhost:1", log_dir=log_dir,
                      moderate=True,
                      moderate_fn=lambda t: "NAUGHTY" in t)

    # fake worker stream: chat_stream consults the controller then the
    # worker; patch both HTTP hops
    class FakeResp:
        def __init__(self, payload):
            self._p = payload

        def json(self):
            return self._p

        def iter_lines(self, decode_unicode=False, delimiter=b"\0"):
            yield json.dumps({"text": "PROMPT a red square",
                              "error_code": 0}).encode()

    def fake_post(url, *a, **k):
        if url.endswith("/get_worker_address"):
            return FakeResp({"address": "http://fake-worker"})
        return FakeResp({})

    monkeypatch.setattr(W.requests, "post", fake_post)

    img_b64 = base64.b64encode(b"not-really-an-image").decode()

    async def drive():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # 1) normal chat -> logged with archived image hash
            r = await client.post("/chat_stream", json={
                "message": "what is this?", "model": "m", "scale": 4,
                "history": [], "image_b64": img_b64})
            raw = await r.read()
            rows = [json.loads(c) for c in raw.split(b"\x00") if c.strip()]
            assert rows[-1]["error_code"] == 0

            # 2) moderation gate: flagged text never reaches the worker
            r = await client.post("/chat_stream", json={
                "message": "NAUGHTY text", "model": "m", "scale": 4,
                "history": []})
            raw = await r.read()
            rows = [json.loads(c) for c in raw.split(b"\x00") if c.strip()]
            assert rows[0]["error_code"] == 1
            assert "MODERATION" in rows[0]["text"].upper()

            # 3) votes
            for vtype in ("upvote", "downvote", "flag"):
                r = await client.post("/vote", json={
                    "type": vtype, "model": "m", "history": [["q", "a"]]})
                assert (await r.json())["ok"] is True
            r = await client.post("/vote", json={"type": "nonsense"})
            assert r.status == 400
        finally:
            await client.close()

    asyncio.run(drive())

    import glob
    logs = glob.glob(os.path.join(log_dir, "*-conv.json"))
    assert len(logs) == 1
    rows = [json.loads(l) for l in open(logs[0])]
    types = [r["type"] for r in rows]
    assert types == ["chat", "flagged", "upvote", "downvote", "flag"]
    chat = rows[0]
    assert chat["model"] == "m" and chat["scale"] == 144
    assert chat["response"]        # streamed text made it into the log
    # image archived once, content-hashed
    assert len(chat["images"]) == 1
    archived = os.path.join(log_dir, "serve_images",
                            chat["images"][0] + ".img")
    assert os.path.exists(archived)
    assert open(archived, "rb").read() == b"not-really-an-image"


def test_sglang_stop_list_and_json_schema():
    """Two regressions through the SGLang-native route: (1) a list-valued
    "stop" (standard for SGLang clients) crashed str.endswith with a
    TypeError; (2) any json_schema containing a string field compiled to
    a 260-state DFA that blew the per-request FSM quota and was rejected
    at submit."""
    import asyncio
    import re as _re

    from aiohttp.test_utils import TestClient, TestServer

    from matryoshka_mm_tpu.serve.model_worker import ModelWorker
    from matryoshka_mm_tpu.serve.sglang_worker import build_sglang_app

    worker = ModelWorker("http://localhost:1", "http://localhost:2", "t",
                         True, "debug://tiny", None, None,
                         continuous_batching=True, max_batch=2,
                         kv_backend="paged")
    app = build_sglang_app(worker)

    async def drive():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/generate", json={
                "text": "USER: hi ASSISTANT:",
                "sampling_params": {"temperature": 0.0, "max_new_tokens": 5,
                                    "stop": ["\n###", "</s>"]}})
            assert r.status == 200
            assert (await r.json())["meta_info"]["error_code"] == 0

            # a string-typed field proves the DFA fits the 64-state quota
            # (the {0,256} bound compiled to 260 states and was rejected
            # at submit); the property name/value must be spellable by
            # the debug vocab ( ",.0123:ABCDx{} + yes/no/true/false)
            from matryoshka_mm_tpu.serve.constrained import (
                regex_for_json_schema)

            # string-valued field: previously REJECTED at submit (260-
            # state DFA > quota); now admitted and visibly masked.  An
            # unbounded string value can eat the whole budget, so assert
            # the output is a valid prefix, not a full match.
            schema = {"type": "object", "properties": {
                "A": {"type": "string"}, "B": {"type": "boolean"}}}
            r = await client.post("/generate", json={
                "text": "USER: emit json ASSISTANT:",
                "sampling_params": {"temperature": 0.0,
                                    "max_new_tokens": 48,
                                    "json_schema": schema}})
            assert r.status == 200
            body = await r.json()
            assert body["meta_info"]["error_code"] == 0
            assert _re.match(r'\{ ?"A" ?: ?"', body["text"]), body["text"]

            # bounded value space: the full match fits the budget
            schema2 = {"type": "object",
                       "properties": {"B": {"type": "boolean"}}}
            r = await client.post("/generate", json={
                "text": "USER: emit json ASSISTANT:",
                "sampling_params": {"temperature": 0.0,
                                    "max_new_tokens": 48,
                                    "json_schema": schema2}})
            body = await r.json()
            assert body["meta_info"]["error_code"] == 0
            assert _re.fullmatch(regex_for_json_schema(schema2),
                                 body["text"]), body["text"]
        finally:
            await client.close()

    try:
        asyncio.run(drive())
    finally:
        worker.batcher.shutdown()
