"""Batched VQA generation must match per-sample generation exactly
(greedy), including padded batches with uneven prompt lengths."""

import json

import numpy as np
import pytest


def test_batched_generate_matches_single():
    import jax

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, generate
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    rows = []
    for n_text in (4, 7):
        ids = rng.integers(5, 100, (1, n_text)).astype(np.int32)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
        rows.append((ids, px))

    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1)
    singles = [generate(params, cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v0_numtoks=4",
                        gen_cfg=gen_cfg)[0] for ids, px in rows]

    # left-pad into one batch
    T = 8
    B = len(rows)
    ids_b = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), bool)
    px_b = np.concatenate([px for _, px in rows], axis=0)
    for b, (ids, _) in enumerate(rows):
        n = ids.shape[1]
        ids_b[b, T - n:] = ids[0]
        mask[b, T - n:] = True
    batched = generate(params, cfg, ids_b, px_b, attention_mask=mask,
                       matryoshka_vis_token_scale="ver=v0_numtoks=4",
                       gen_cfg=gen_cfg)
    for b in range(B):
        np.testing.assert_array_equal(batched[b], singles[b])


def test_loader_batched_mode(tmp_path):
    from PIL import Image

    from matryoshka_mm_tpu.eval.model_vqa_loader import build_parser, eval_model

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 48), (120, 50, 50)).save(img_dir / "x.jpg")
    Image.new("RGB", (48, 64), (50, 120, 50)).save(img_dir / "y.jpg")
    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question_id": 1, "image": "x.jpg",
                            "text": "What is this?"}) + "\n")
        f.write(json.dumps({"question_id": 2, "image": "y.jpg",
                            "text": "Describe the photo in detail please."}) + "\n")
        f.write(json.dumps({"question_id": 3, "image": "x.jpg",
                            "text": "Any dogs?"}) + "\n")

    outs = {}
    for bs in (1, 2):
        afile = tmp_path / f"answers_bs{bs}.jsonl"
        args = build_parser().parse_args([
            "--model-path", "debug://tiny",
            "--image-folder", str(img_dir),
            "--question-file", str(qfile),
            "--answers-file", str(afile),
            "--max_new_tokens", "4",
            "--batch-size", str(bs),
            "--matryoshka_vis_token_scale", "ver=v0_numtoks=4",
        ])
        eval_model(args)
        outs[bs] = {json.loads(l)["question_id"]: json.loads(l)["text"]
                    for l in open(afile)}
    assert outs[1] == outs[2]
