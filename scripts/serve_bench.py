"""Serving load-test harness (the vLLM ``benchmark_serving`` analog).

Drives a running model_worker / sglang_worker with concurrent multimodal
requests and reports TTFT / per-request latency / aggregate-throughput
percentiles.  Works against the worker protocol directly so it measures
the full HTTP + scheduler + device path.

Example:
    python -m matryoshka_mm_tpu.serve.model_worker --no-register \\
        --model-path debug://7b --load-8bit --continuous-batching \\
        --kv-backend paged --prefix-cache --warmup \\
        --pool-prefill-len 832 --pool-max-new 192 &
    python scripts/serve_bench.py --url http://localhost:21002 \\
        --concurrency 4 --requests 16 --max-new-tokens 64
"""

import argparse
import base64
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def make_image(seed: int, size: int) -> str:
    from PIL import Image

    arr = np.random.default_rng(seed).integers(0, 255, (size, size, 3),
                                               dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def one_request(url: str, body: dict, out: list, idx: int):
    req = urllib.request.Request(f"{url}/worker_generate_stream",
                                 json.dumps(body).encode(),
                                 {"Content-Type": "application/json"})
    t0 = time.time()
    ttft = None
    chunks = []
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            buf = b""
            while True:
                piece = r.read(65536)
                if not piece:
                    break
                if ttft is None:
                    ttft = time.time() - t0
                buf += piece
            chunks = [json.loads(c) for c in buf.split(b"\x00") if c.strip()]
    except Exception as e:  # noqa: BLE001
        out[idx] = {"error": str(e)}
        return
    last = chunks[-1] if chunks else {"error_code": -1, "text": ""}
    out[idx] = {
        "latency_s": time.time() - t0,
        "ttft_s": ttft,
        "error_code": last.get("error_code", -1),
        "n_words": len(last.get("text", "").split()),
    }


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:21002")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=336)
    ap.add_argument("--shared-image", action="store_true",
                    help="same image for every request (prefix-cache case)")
    ap.add_argument("--matryoshka_vis_token_scale", default="ver=v0_numtoks=144")
    ap.add_argument("--prompt", default="USER: <image> describe what you "
                                        "see, request {i} ASSISTANT:")
    args = ap.parse_args()

    bodies = []
    for i in range(args.requests):
        img = make_image(0 if args.shared_image else i, args.image_size)
        bodies.append({
            "prompt": args.prompt.format(i=i), "images": [img],
            "temperature": 0.0, "max_new_tokens": args.max_new_tokens,
            "matryoshka_vis_token_scale": args.matryoshka_vis_token_scale,
        })

    # warm the shapes with one request before timing
    warm = [None]
    one_request(args.url, bodies[0], warm, 0)
    if "error" in (warm[0] or {}):
        print(f"warmup request failed: {warm[0]}", file=sys.stderr)
        sys.exit(1)

    out = [None] * args.requests
    sem = threading.Semaphore(args.concurrency)

    def worker(i):
        with sem:
            one_request(args.url, bodies[i], out, i)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(args.requests)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    ok = [r for r in out if r and r.get("error_code") == 0]
    errs = len(out) - len(ok)
    lat = [r["latency_s"] for r in ok]
    ttft = [r["ttft_s"] for r in ok if r["ttft_s"] is not None]
    total_tok = args.max_new_tokens * len(ok)
    print(json.dumps({
        "requests": args.requests, "concurrency": args.concurrency,
        "ok": len(ok), "errors": errs, "wall_s": round(wall, 2),
        "throughput_tok_s": round(total_tok / wall, 1),
        "requests_per_s": round(len(ok) / wall, 2),
        "latency_s": {"p50": round(pct(lat, 50), 2),
                      "p90": round(pct(lat, 90), 2),
                      "p99": round(pct(lat, 99), 2)},
        "ttft_s": {"p50": round(pct(ttft, 50), 2),
                   "p90": round(pct(ttft, 90), 2)},
    }))


if __name__ == "__main__":
    main()
