"""One-command checkpoint-fidelity harness: convert a real torch
checkpoint and compare temperature-0 generations against golden tokens
across all five matryoshka scales.

BASELINE.md's north-star is temperature-0 answer match vs the PyTorch
reference at every scale.  Real llava-v1.5-7b-m3 weights are not
available in this environment (no egress), so this harness makes the
claim *checkable the moment weights exist*, with no code changes:

Protocol (mirrors the reference single-image eval,
/root/reference/llava/eval/run_llava.py:50 ``eval_model``):
  * image: the deterministic 336x336 RGB gradient from
    :func:`fidelity_image` (both sides must generate it with the same
    formula — no image file needs to ship);
  * prompt: "<image>\\nWhat is shown in the image?" rendered through the
    model's auto-selected conversation template;
  * decoding: greedy (temperature 0), 64 new tokens, once per scale in
    {1, 9, 36, 144, 576} via ``matryoshka_vis_token_scale=ver=v0_numtoks=N``.

Capture golden tokens from the reference implementation by running the
same protocol there (load with llava.model.builder.load_pretrained_model,
generate with the kwargs above) and saving
``{"<scale>": [token ids...]}`` to a JSON file.

Usage:
  # capture mode (writes fixtures from THIS framework — e.g. to diff two
  # of our own builds, or to seed a reference run):
  python scripts/check_fidelity.py --model-path <ckpt> --capture out.json
  # verify mode (exit 0 iff every scale matches):
  python scripts/check_fidelity.py --model-path <ckpt> --fixtures golden.json
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

SCALES = (1, 9, 36, 144, 576)
QUERY = "What is shown in the image?"
MAX_NEW_TOKENS = 64


def fidelity_image(size: int = 336):
    """Deterministic RGB test image: horizontal/vertical gradients plus a
    centered square — reproducible from this formula alone."""
    from PIL import Image

    y, x = np.mgrid[0:size, 0:size]
    r = (x * 255 // (size - 1)).astype(np.uint8)
    g = (y * 255 // (size - 1)).astype(np.uint8)
    b = np.zeros((size, size), np.uint8)
    b[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 200
    return Image.fromarray(np.stack([r, g, b], axis=-1), "RGB")


def run_model(model_path, model_base, scales=SCALES):
    from matryoshka_mm_tpu.constants import DEFAULT_IMAGE_TOKEN
    from matryoshka_mm_tpu.conversation import SeparatorStyle, conv_templates
    from matryoshka_mm_tpu.eval.run_llava import pick_conv_mode
    from matryoshka_mm_tpu.image_processing import process_images
    from matryoshka_mm_tpu.mm_utils import (get_model_name_from_path,
                                            tokenizer_image_token)
    from matryoshka_mm_tpu.models.builder import load_pretrained_model

    model_name = get_model_name_from_path(model_path)
    tokenizer, model, image_processor, _ = load_pretrained_model(
        model_path, model_base, model_name)

    conv = conv_templates[pick_conv_mode(model_name)].copy()
    conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + QUERY)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    image = fidelity_image(getattr(model.cfg.vision, "image_size", 336))
    px = process_images([image], image_processor, model.config)
    input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer),
                           np.int32)[None, :]

    out = {}
    for scale in scales:
        ids = model.generate(
            input_ids, images=np.asarray(px, np.float32),
            image_sizes=[image.size],
            matryoshka_vis_token_scale=f"ver=v0_numtoks={scale}",
            do_sample=False, temperature=0.0,
            max_new_tokens=MAX_NEW_TOKENS,
            eos_token_id=getattr(tokenizer, "eos_token_id", 2),
            pad_token_id=getattr(tokenizer, "pad_token_id", 0) or 0)
        toks = [int(t) for t in np.asarray(ids)[0]]
        eos = getattr(tokenizer, "eos_token_id", 2)
        if eos in toks:
            toks = toks[: toks.index(eos) + 1]
        out[str(scale)] = toks
    return out, tokenizer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--model-base", default=None)
    ap.add_argument("--fixtures", default=None,
                    help="golden-token JSON to verify against")
    ap.add_argument("--capture", default=None,
                    help="write this run's tokens to a fixtures JSON")
    ap.add_argument("--scales", default=None,
                    help="comma-separated scale subset (default: all five)")
    args = ap.parse_args(argv)

    scales = tuple(int(s) for s in args.scales.split(",")) if args.scales \
        else SCALES
    got, tokenizer = run_model(args.model_path, args.model_base, scales)

    if args.capture:
        with open(args.capture, "w") as f:
            json.dump(got, f)
        print(f"captured {len(got)} scales -> {args.capture}")
        return 0

    if not args.fixtures:
        for k, v in got.items():
            text = tokenizer.decode(v, skip_special_tokens=True) \
                if hasattr(tokenizer, "decode") else v
            print(f"scale {k}: {text}")
        return 0

    with open(args.fixtures) as f:
        want = json.load(f)
    failed = []
    for k in got:
        if k not in want:
            continue
        if got[k] != [int(t) for t in want[k]]:
            failed.append(k)
            print(f"scale {k}: MISMATCH\n  want {want[k][:16]}...\n"
                  f"  got  {got[k][:16]}...")
        else:
            print(f"scale {k}: match ({len(got[k])} tokens)")
    if failed:
        print(f"FAIL: {len(failed)}/{len(got)} scales mismatched")
        return 1
    print("OK: temperature-0 token match at every checked scale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
