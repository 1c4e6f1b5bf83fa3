import json
import os

import numpy as np
import pytest

from matryoshka_mm_tpu.eval.eval_pope import eval_pope, normalize_answer
from matryoshka_mm_tpu.eval.eval_science_qa import get_pred_idx, parse_answer
from matryoshka_mm_tpu.eval.m4c_evaluator import (
    EvalAIAnswerProcessor,
    STVQAANLSEvaluator,
    TextVQAAccuracyEvaluator,
)
from matryoshka_mm_tpu.eval.model_vqa_loader import get_chunk
from matryoshka_mm_tpu.eval.converters import (
    convert_gqa_for_eval,
    convert_mmvet_for_eval,
)


def test_get_chunk_deterministic_partition():
    lst = list(range(103))
    chunks = [get_chunk(lst, 4, k) for k in range(4)]
    combined = sorted(x for c in chunks for x in c)
    assert combined == lst  # full cover, no dupes
    assert get_chunk(lst, 4, 1) == get_chunk(lst, 4, 1)  # deterministic


def test_pope_normalize():
    assert normalize_answer("No, there is not.") == "no"
    assert normalize_answer("Yes, I can see it.") == "yes"
    assert normalize_answer("There is not a dog") == "no"


def test_eval_pope_f1(tmp_path):
    labels = [{"label": "yes"}, {"label": "no"}, {"label": "yes"}, {"label": "no"}]
    lf = tmp_path / "labels.json"
    with open(lf, "w") as f:
        for l in labels:
            f.write(json.dumps(l) + "\n")
    answers = [{"text": "Yes."}, {"text": "No."}, {"text": "Yes."}, {"text": "Yes."}]
    m = eval_pope(answers, str(lf))
    assert m["accuracy"] == 0.75
    assert m["recall"] == 1.0


def test_evalai_processor():
    p = EvalAIAnswerProcessor()
    assert p("The  Cat!") == "cat"
    assert p("two") == "2"
    assert p("a dog's toy") == "dog 's toy"
    assert p("dont") == "don't"


def test_textvqa_consensus():
    ev = TextVQAAccuracyEvaluator()
    # 10 annotators: 5 say 'cat', 5 say 'dog' -> either answer gets ~1.0
    # (leave-one-out: 4 or 5 matches, both >= 3)
    preds = [{"pred_answer": "cat", "gt_answers": ["cat"] * 5 + ["dog"] * 5}]
    acc = ev.eval_pred_list(preds)
    assert acc == 1.0
    preds = [{"pred_answer": "bird", "gt_answers": ["cat"] * 10}]
    assert ev.eval_pred_list(preds) == 0.0


def test_anls():
    ev = STVQAANLSEvaluator()
    assert ev.eval_pred_list(
        [{"pred_answer": "hello", "gt_answers": ["hello"]}]) == 1.0
    assert ev.eval_pred_list(
        [{"pred_answer": "xyz", "gt_answers": ["hello"]}]) == 0.0


def test_science_qa_parse():
    assert parse_answer("B", ["A", "B", "C", "D", "E"]) == "B"
    assert parse_answer("C. Because of gravity", ["A", "B", "C", "D", "E"]) == "C"
    assert parse_answer("The answer is D.", ["A", "B", "C", "D", "E"]) == "D"
    assert parse_answer("I think maybe", ["A", "B", "C", "D", "E"]) == "FAILED"
    assert get_pred_idx("B", ["x", "y", "z"], ["A", "B", "C", "D", "E"]) == 1
    assert get_pred_idx("E", ["x", "y"], ["A", "B", "C", "D", "E"]) == -1


def test_gqa_converter(tmp_path):
    src = tmp_path / "src.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"question_id": "q1", "text": "A cat."}) + "\n")
    dst = tmp_path / "dst.json"
    convert_gqa_for_eval(str(src), str(dst))
    out = json.load(open(dst))
    assert out == [{"questionId": "q1", "prediction": "a cat"}]


def test_mmvet_converter(tmp_path):
    src = tmp_path / "src.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"question_id": 0, "text": "hi"}) + "\n")
    dst = tmp_path / "dst.json"
    convert_mmvet_for_eval(str(src), str(dst))
    assert json.load(open(dst)) == {"v1_0": "hi"}


def test_model_vqa_loader_end_to_end(tmp_path):
    """Run the full answer-generation path with the debug model."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 48), (120, 50, 50)).save(img_dir / "x.jpg")
    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question_id": 1, "image": "x.jpg",
                            "text": "What is this?"}) + "\n")
    afile = tmp_path / "answers.jsonl"

    from matryoshka_mm_tpu.eval.model_vqa_loader import build_parser, eval_model

    args = build_parser().parse_args([
        "--model-path", "debug://tiny",
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answers-file", str(afile),
        "--max_new_tokens", "4",
        "--matryoshka_vis_token_scale", "ver=v0_numtoks=4",
    ])
    eval_model(args)
    answers = [json.loads(l) for l in open(afile)]
    assert len(answers) == 1
    assert answers[0]["question_id"] == 1
    assert isinstance(answers[0]["text"], str)


def test_textvqa_scorer_end_to_end(tmp_path):
    """eval_textvqa: question recovery across all three prompt layouts +
    the annotation join + consensus scoring (behavior contract with
    reference llava/eval/eval_textvqa.py)."""
    import json

    from matryoshka_mm_tpu.eval.eval_textvqa import (eval_single,
                                                     question_from_prompt,
                                                     score_textvqa)

    # prompt layouts
    assert question_from_prompt(
        "OCR tokens: a b\nQuestion: What Brand? Short answer:"
    ) == "what brand?"
    assert question_from_prompt(
        "Reference OCR token: xyz\nWhat is shown?\nAnswer briefly."
    ) == "what is shown?"
    assert question_from_prompt(
        "What is shown?\nReference OCR token: xyz\nAnswer briefly."
    ) == "what is shown?"
    assert question_from_prompt("What color?\nAnswer briefly.") == "what color?"
    try:
        question_from_prompt("one-liner with no structure")
        raise AssertionError("should reject")
    except ValueError:
        pass

    annotations = [
        {"image_id": "im1", "question": "What Color?",
         "answers": ["red"] * 10},
        {"image_id": "im2", "question": "What brand?",
         "answers": ["acme"] * 5 + ["other"] * 5},
    ]
    answers = [
        {"question_id": "im1", "prompt": "What color?\nAnswer briefly.",
         "text": "red"},
        {"question_id": "im2",
         "prompt": "OCR tokens: acme co\nQuestion: What brand? Short answer:",
         "text": "nothing"},
    ]
    scores = score_textvqa(annotations, answers)
    assert scores["samples"] == 2
    assert scores["accuracy"] == 0.5

    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({"data": annotations}))
    res_path = tmp_path / "res.jsonl"
    res_path.write_text("\n".join(json.dumps(a) for a in answers))
    assert eval_single(str(ann_path), str(res_path)) == 0.5
