"""Eval webpage report + submission collector (reference:
llava/eval/generate_webpage_data_from_table.py, copy_predictions.py)."""

import json
import os

import pytest

from matryoshka_mm_tpu.eval.copy_predictions import collect
from matryoshka_mm_tpu.eval.webpage_report import (build_records, read_jsonl,
                                                   render_html, split_review)

pytestmark = pytest.mark.quick


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_split_review_strips_score_line():
    scores, text = split_review("8 6\nAssistant 1 was better.")
    assert scores == [8.0, 6.0]
    assert text == "Assistant 1 was better."
    scores, text = split_review("no scores here\nbody")
    assert scores is None and text.startswith("no scores")


def test_report_end_to_end(tmp_path):
    q = tmp_path / "q.jsonl"
    a1 = tmp_path / "a1.jsonl"
    a2 = tmp_path / "a2.jsonl"
    rv = tmp_path / "rv.jsonl"
    _write_jsonl(q, [{"question_id": 1, "category": "generic",
                      "text": "What is <b>2+2</b>?"},
                     {"question_id": 2, "category": "math",
                      "text": "Square root of 16?"}])
    _write_jsonl(a1, [{"question_id": 1, "text": "4"},
                      {"question_id": 2, "text": "4"}])
    _write_jsonl(a2, [{"question_id": 1, "text": "five"},
                      {"question_id": 2, "text": "4"}])
    _write_jsonl(rv, [{"question_id": 1, "content": "10 2\nA1 correct."},
                      {"question_id": 2, "content": "7 7\nTie."}])

    records = build_records(
        read_jsonl(str(q), key="question_id"),
        {"base": read_jsonl(str(a1), key="question_id"),
         "ours": read_jsonl(str(a2), key="question_id")},
        {"base_vs_ours": read_jsonl(str(rv), key="question_id")})
    assert len(records) == 2
    assert records[0]["scores"]["base_vs_ours"] == [10.0, 2.0]
    assert records[0]["reviews"]["base_vs_ours"] == "A1 correct."

    page = render_html(records, title="t")
    # escaped question text, both models, score badge present
    assert "&lt;b&gt;2+2&lt;/b&gt;" in page
    assert "base" in page and "ours" in page
    assert "10 / 2" in page


def test_copy_predictions_collects_all_formats(tmp_path):
    ckpt = tmp_path / "ckpt"
    for rel in ("eval/mmbench/answers_upload/exp1.xlsx",
                "eval/vqav2/answers_upload/sub.json",
                "eval/vizwiz/answers_upload/sub.json"):
        p = ckpt / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("x")
    upload = tmp_path / "up"
    copied = collect(str(ckpt), str(upload))
    tasks = sorted(os.path.relpath(d, upload).split(os.sep)[0]
                   for _, d in copied)
    assert tasks == ["mmbench", "vizwiz", "vqav2"]
    for _, dst in copied:
        assert os.path.exists(dst)
