"""End-to-end lmms-eval harness with a local task + debug model."""

import json

import pytest

from matryoshka_mm_tpu.lmms_eval.api.metrics import (
    bootstrap_stderr,
    multiple_choice_letter,
    pope_yes_no,
    vqa_accuracy,
)


def test_metrics():
    assert vqa_accuracy(["cat"] * 10, "cat") == 1.0
    assert vqa_accuracy(["cat", "dog", "cat"] + ["fish"] * 7, "cat") == pytest.approx(2 / 3)
    assert pope_yes_no("no", "No, there is not.") == 1.0
    assert multiple_choice_letter("B", "B. because") == 1.0
    assert multiple_choice_letter("B", "(A) something") == 0.0
    s = bootstrap_stderr([0.0, 1.0] * 50)
    assert 0.02 < s < 0.08


def test_new_metrics():
    from matryoshka_mm_tpu.lmms_eval.api.metrics import (
        contains_match, multiple_choice_index, relaxed_accuracy)

    # ChartQA relaxed accuracy: 5% relative numeric tolerance
    assert relaxed_accuracy("100", "104") == 1.0
    assert relaxed_accuracy("100", "106") == 0.0
    assert relaxed_accuracy("12.5%", "12.3") == 1.0
    assert relaxed_accuracy(["blue"], "Blue") == 1.0
    assert relaxed_accuracy("0", "0.01") == 1.0   # zero-gold denominator guard
    # OCRBench contains-match
    assert contains_match("hello world", "it says  Hello   World!") == 1.0
    assert contains_match(["foo", "bar"], "has bar in it") == 1.0
    assert contains_match("baz", "nothing here") == 0.0
    # AI2D index-form multiple choice
    assert multiple_choice_index("2", "C") == 1.0
    assert multiple_choice_index(1, "(B) since") == 1.0
    assert multiple_choice_index("0", "D.") == 0.0


def test_local_task_end_to_end(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 64), (200, 0, 0)).save(img_dir / "r.jpg")
    docs = [
        {"question": "What color?", "answer": "red", "image": "r.jpg"},
        {"question": "Is there a dog?", "answer": "no", "image": "r.jpg"},
    ]
    dpath = tmp_path / "docs.json"
    with open(dpath, "w") as f:
        json.dump(docs, f)

    from matryoshka_mm_tpu.lmms_eval.api.registry import register_task
    from matryoshka_mm_tpu.lmms_eval.evaluator import make_table, simple_evaluate

    register_task("toy_vqa", {
        "task": "toy_vqa",
        "dataset_path": str(dpath),
        "doc_to_visual": "image",
        "doc_to_text": "{question}",
        "post_prompt": "\nAnswer briefly.",
        "doc_to_target": "answer",
        "dataset_kwargs": {"image_folder": str(img_dir)},
        "generation_kwargs": {"max_new_tokens": 4, "temperature": 0.0},
        "metric_list": [{"metric": "exact_match"}],
    })

    results = simple_evaluate(
        model="llava",
        model_args="pretrained=debug://tiny",
        tasks=["toy_vqa"],
        matryoshka_vis_token_scale="ver=v0_numtoks=4",
        log_samples=True,
    )
    agg = results["results"]["toy_vqa"]
    assert agg["samples"] == 2
    assert 0.0 <= agg["exact_match"] <= 1.0
    table = make_table(results)
    assert "toy_vqa" in table


def test_batched_adapter_matches_serial(tmp_path):
    """batch_size=2 groups requests into one padded generate call and must
    reproduce the serial outputs."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 64), (0, 0, 200)).save(img_dir / "b.jpg")
    docs = [{"question": f"Describe item {i} please", "answer": "x",
             "image": "b.jpg"} for i in range(4)]
    dpath = tmp_path / "docs.json"
    with open(dpath, "w") as f:
        json.dump(docs, f)

    from matryoshka_mm_tpu.lmms_eval.api.registry import register_task
    from matryoshka_mm_tpu.lmms_eval.evaluator import simple_evaluate

    register_task("toy_batch", {
        "task": "toy_batch",
        "dataset_path": str(dpath),
        "doc_to_visual": "image",
        "doc_to_text": "{question}",
        "doc_to_target": "answer",
        "dataset_kwargs": {"image_folder": str(img_dir)},
        "generation_kwargs": {"max_new_tokens": 6, "temperature": 0.0},
        "metric_list": [{"metric": "exact_match"}],
    })

    kw = dict(tasks=["toy_batch"], log_samples=True,
              matryoshka_vis_token_scale="ver=v0_numtoks=4")
    r1 = simple_evaluate(model="llava",
                         model_args="pretrained=debug://tiny,batch_size=1", **kw)
    r2 = simple_evaluate(model="llava",
                         model_args="pretrained=debug://tiny,batch_size=2", **kw)
    t1 = [s["resp"] for s in r1["samples"]["toy_batch"]]
    t2 = [s["resp"] for s in r2["samples"]["toy_batch"]]
    assert t1 == t2


def test_registered_tasks_load():
    from matryoshka_mm_tpu.lmms_eval.api.registry import list_tasks

    tasks = list_tasks()
    for t in ("gqa", "pope", "textvqa", "scienceqa_img", "mmbench_en",
              "mmmu_val", "ai2d", "chartqa", "infovqa", "ocrbench",
              "realworldqa", "qbench_zh"):
        assert t in tasks
    assert len(tasks) >= 20


def test_check_integrity():
    from matryoshka_mm_tpu.lmms_eval.api.registry import register_task
    from matryoshka_mm_tpu.lmms_eval.evaluator import check_integrity

    assert check_integrity() == []          # shipped corpus is clean
    register_task("broken_task", {
        "task": "broken_task", "dataset_path": "x",
        "doc_to_text": "{q}", "doc_to_target": "a",
        "metric_list": [{"metric": "nope"}]})
    problems = check_integrity(["broken_task"])
    assert problems and "unknown metric" in problems[0]
