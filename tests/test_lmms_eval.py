"""End-to-end lmms-eval harness with a local task + debug model."""

import json
import os

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
    t1 = [s["resps"] for s in r1["samples"]["toy_batch"]]
    t2 = [s["resps"] for s in r2["samples"]["toy_batch"]]
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


def test_filters_registry_and_semantics():
    from matryoshka_mm_tpu.lmms_eval.filters import (
        FILTER_REGISTRY, MajorityVoteFilter, MapFilter,
        MultiChoiceRegexFilter, RegexFilter, TakeFirstFilter, TakeKFilter,
        WhitespaceFilter, build_filter_ensemble)

    for name in ("take_first", "take_first_k", "majority_vote", "regex",
                 "multi_choice_regex", "remove_whitespace", "lowercase",
                 "uppercase", "map"):
        assert name in FILTER_REGISTRY

    docs = [{}, {}]
    assert TakeFirstFilter().apply([["a", "b"], ["c"]], docs) == ["a", "c"]
    assert TakeKFilter(k=2).apply([["a", "b", "c"]], [{}]) == [["a", "b"]]
    assert MajorityVoteFilter().apply([["x", "y", "x"]], [{}]) == [["x"]]
    assert WhitespaceFilter().apply([[" hi", "hi"]], [{}]) == [["hi", "hi"]]
    assert MapFilter(mapping_dict={"yes": 1}, default_value=0).apply(
        [["yes", "nah"]], [{}]) == [[1, 0]]

    # gsm8k-style number extraction
    f = RegexFilter()
    assert f.apply([["blah #### 42"], ["no answer"]], docs) == \
        [["42"], ["[invalid]"]]


def test_multi_choice_regex_fallbacks():
    from matryoshka_mm_tpu.lmms_eval.filters import MultiChoiceRegexFilter

    f = MultiChoiceRegexFilter(regex_pattern=r"(\([A-Z]\))",
                               ignore_case=True, ignore_punctuation=True)
    doc = {"choices": ["red apple", "green pear", "yellow banana"]}
    # 1) direct letter match
    assert f.apply([["The answer is (B)."]], [doc]) == [["(B)"]]
    # 2) verbatim choice text -> mapped to its letter
    assert f.apply([["I think it's a green pear!"]], [doc]) == [["(B)"]]
    # 3) bare trailing letter
    assert f.apply([["Answer: C"]], [doc]) == [["(C)"]]
    # 4) nothing -> fallback
    assert f.apply([["dunno"]], [doc]) == [["[invalid]"]]
    # docs without a choices field still use the base regex
    assert f.apply([["pick (A) ok"]], [{}]) == [["(A)"]]


def test_filter_ensemble_from_yaml_spec(tmp_path):
    """End-to-end: a task with filter_list scores the extracted answer,
    not the raw free-form output (the MMMU mis-scoring case)."""
    import json

    from matryoshka_mm_tpu.lmms_eval.api.registry import register_task
    from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask

    docs = [{"question": "Which?", "answer": "B",
             "choices": ["cat", "dog", "bird"]}]
    dpath = tmp_path / "d.json"
    with open(dpath, "w") as f:
        json.dump(docs, f)
    cfg = {
        "task": "toy_mc", "dataset_path": str(dpath),
        "doc_to_text": "{question}", "doc_to_target": "answer",
        "doc_to_choice": "choices",
        "filter_list": [
            {"name": "flexible-extract",
             "filter": [{"function": "multi_choice_regex",
                         "regex_pattern": r"(\([A-Z]\))",
                         "ignore_case": True}]}],
        "metric_list": [{"metric": "multiple_choice_letter"}],
    }
    task = ConfigurableTask(cfg)
    instances = task.build_instances()
    instances[0].resps = ["I believe the answer is a dog here."]
    names = task.apply_filters(instances)
    assert names == ["flexible-extract"]
    assert instances[0].filtered_resps["flexible-extract"] == ["(B)"]
    scores = task.process_results(
        instances[0].doc, instances[0].filtered_resps["flexible-extract"][0])
    assert scores["multiple_choice_letter"] == 1.0


def test_fewshot_samplers():
    import random

    from matryoshka_mm_tpu.lmms_eval.api.samplers import (
        ContextSampler, FirstNSampler, get_sampler)
    from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask

    docs = [{"q": f"q{i}", "a": f"a{i}"} for i in range(6)]
    task = ConfigurableTask({
        "task": "fs", "dataset_path": "unused", "doc_to_text": "{q}",
        "doc_to_target": "a", "test_split": "test",
        "fewshot_split": "train", "metric_list": [{"metric": "exact_match"}]})
    s = FirstNSampler(docs, task, random.Random(0))
    ctx = s.get_context(docs[5], 2)
    assert ctx == "q0 a0\n\nq1 a1\n\n"
    # random sampler excludes the doc under evaluation when splits match
    task.config["fewshot_split"] = "test"
    r = ContextSampler(docs, task, random.Random(0))
    ctx = r.get_context(docs[0], 3)
    assert "q0 a0" not in ctx and ctx.endswith("\n\n")
    assert get_sampler("first_n") is FirstNSampler


def test_fewshot_in_build_instances(tmp_path):
    import json

    from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask

    data = {"test": [{"q": "Q", "a": "A"}],
            "train": [{"q": f"t{i}", "a": f"x{i}"} for i in range(3)]}
    dpath = tmp_path / "d.json"
    with open(dpath, "w") as f:
        json.dump(data, f)
    task = ConfigurableTask({
        "task": "fs2", "dataset_path": str(dpath), "test_split": "test",
        "fewshot_split": "train", "num_fewshot": 2,
        "fewshot_config": {"sampler": "first_n"},
        "doc_to_text": "{q}", "doc_to_target": "a",
        "metric_list": [{"metric": "exact_match"}]})
    insts = task.build_instances()
    assert insts[0].arguments[0] == "t0 x0\n\nt1 x1\n\nQ"


def test_eval_logger_writes_tables(tmp_path):
    from matryoshka_mm_tpu.lmms_eval.logging_utils import EvalLogger

    results = {"results": {"toy": {
        "exact_match": 0.5, "exact_match_stderr": 0.1,
        "acc,flex": 0.75, "acc_stderr,flex": 0.05,
        "samples": 4, "time_s": 1.0}}}
    logger = EvalLogger(project="t", name="r", output_dir=str(tmp_path))
    logger.post_init(results)
    rows = logger.log_eval_result()
    logger.log_eval_samples({"toy": [{"doc_id": 0, "resps": ["a"]}]})
    logger.finish()
    assert {(r["metric"], r["filter"]) for r in rows} == \
        {("exact_match", "none"), ("acc", "flex")}
    assert (tmp_path / "results.jsonl").exists()
    assert (tmp_path / "results.tsv").exists()
    assert (tmp_path / "samples_toy.jsonl").exists()


def test_squad_f1_and_bleu4_metrics():
    from matryoshka_mm_tpu.lmms_eval.api.metrics import bleu4, squad_f1

    assert squad_f1("the red cat", "red cat") == pytest.approx(0.8)
    assert squad_f1(["a b", "c"], "c") == 1.0
    assert squad_f1("x", "totally wrong") == 0.0
    assert bleu4("a cat sits on the mat quietly today",
                 "a cat sits on the mat quietly today") == pytest.approx(1.0)
    assert bleu4("a cat sits on the mat", "dog") < 0.1


def test_rec_metrics_and_process_docs(tmp_path):
    """RefCOCO-style REC task: process_docs normalizes/explodes docs and
    the IoU metrics score parsed bboxes (reference:
    lmms-eval/lmms_eval/tasks/refcoco/utils_rec.py)."""
    import json

    from matryoshka_mm_tpu.lmms_eval.api.metrics import (rec_acc05,
                                                         rec_center_acc,
                                                         rec_iou)
    from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask

    assert rec_iou([0.0, 0.0, 0.5, 0.5], "[0.0, 0.0, 0.5, 0.5]") == 1.0
    assert rec_iou([0.0, 0.0, 0.5, 0.5], "no numbers here") == 0.0
    assert rec_acc05([0.0, 0.0, 1.0, 1.0], "[0.0, 0.0, 0.6, 1.0]") == 1.0
    assert rec_acc05([0.0, 0.0, 1.0, 1.0], "[0.0, 0.0, 0.2, 0.2]") == 0.0
    assert rec_center_acc([0.4, 0.4, 0.6, 0.6], "[0.45, 0.45, 0.55, 0.6]") == 1.0

    docs = [{"image": "x.jpg", "image_width": 100, "image_height": 200,
             "bbox": [10, 20, 30, 40], "answer": ["a cat", "the cat"]}]
    p = tmp_path / "docs.json"
    p.write_text(json.dumps(docs))
    task = ConfigurableTask({
        "task": "rec_local", "dataset_path": str(p),
        "process_docs": "task_utils.refcoco_rec_preprocess",
        "doc_to_visual": "image", "doc_to_text": "find: {answer}",
        "doc_to_target": "bbox",
        "metric_list": [{"metric": "rec_iou", "aggregation": "mean"}],
    })
    out = task.docs()
    assert len(out) == 2                      # answers exploded
    import numpy as np
    np.testing.assert_allclose(out[0]["bbox"], [0.1, 0.1, 0.4, 0.3])
    scores = task.process_results(out[0], "[0.1, 0.1, 0.4, 0.3]")
    assert scores["rec_iou"] == 1.0


def test_new_task_yamls_register():
    """All 46 task YAMLs (incl. refcoco/cmmmu/mathverse/olympiadbench/
    ferret/screenspot/multilingual) parse and register."""
    from matryoshka_mm_tpu.lmms_eval.api.registry import TASK_REGISTRY as TASKS
    from matryoshka_mm_tpu.lmms_eval.tasks import load_all_tasks

    load_all_tasks()
    for name in ("refcoco_bbox_rec_val", "refcoco+_bbox_rec_val",
                 "refcocog_bbox_rec_val", "screenspot_rec_test",
                 "cmmmu_val", "mathverse_testmini", "olympiadbench_test_en",
                 "ferret", "llava_in_the_wild_chinese"):
        assert name in TASKS, name


def test_gpt4v_adapter_mock(tmp_path):
    """The API adapter runs a task corpus with an injected endpoint —
    proves the harness is model-agnostic (reference:
    lmms-eval/lmms_eval/models/gpt4v.py)."""
    from PIL import Image

    from matryoshka_mm_tpu.lmms_eval.api.registry import get_model
    from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask

    calls = []

    def fake_post(payload):
        calls.append(payload)
        # first content part is the text, any image arrives as a data URL
        parts = payload["messages"][0]["content"]
        assert parts[0]["type"] == "text"
        has_img = any(p["type"] == "image_url" for p in parts)
        assert not has_img or parts[1]["image_url"]["url"].startswith(
            "data:image/png;base64,")
        return {"choices": [{"message": {"content": "red"}}]}

    GPT4V = get_model("gpt4v")
    lm = GPT4V(model_version="test-model", post_fn=fake_post)

    docs = [{"question": "What color?", "answer": "red", "image": "r.jpg"},
            {"question": "What shape?", "answer": "square", "image": "r.jpg"}]
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (32, 32), (200, 0, 0)).save(img_dir / "r.jpg")
    dpath = tmp_path / "docs.json"
    dpath.write_text(json.dumps(docs))
    task = ConfigurableTask({
        "task": "toy_api", "dataset_path": str(dpath),
        "doc_to_visual": "image", "doc_to_text": "{question}",
        "doc_to_target": "answer",
        "dataset_kwargs": {"image_folder": str(img_dir)},
        "generation_kwargs": {"max_new_tokens": 8, "temperature": 0.0},
        "metric_list": [{"metric": "exact_match"}],
    })
    instances = task.build_instances()
    resps = lm.generate_until(instances)
    assert resps == ["red", "red"]
    assert len(calls) == 2
    assert calls[0]["model"] == "test-model"
    assert calls[0]["max_tokens"] == 8
    scores = [task.process_results(i.doc, r)
              for i, r in zip(instances, resps)]
    assert [s["exact_match"] for s in scores] == [1.0, 0.0]

    with pytest.raises(NotImplementedError):
        lm.loglikelihood(instances)


@pytest.mark.skipif("OPENAI_API_KEY" not in os.environ,
                    reason="live API smoke needs OPENAI_API_KEY")
def test_gpt4v_adapter_live_smoke():
    from matryoshka_mm_tpu.lmms_eval.api.instance import Instance
    from matryoshka_mm_tpu.lmms_eval.api.registry import get_model

    lm = get_model("gpt4v")(model_version=os.environ.get(
        "GPT4V_MODEL", "gpt-4o-mini"))
    inst = Instance(request_type="generate_until", doc={},
                    arguments=("Reply with the single word: ok",
                               {"max_new_tokens": 4}, None),
                    idx=0, task_name="smoke", doc_id=0)
    out = lm.generate_until([inst])
    assert isinstance(out[0], str) and out[0]


def test_llava_sglang_adapter_end_to_end(tmp_path):
    """Evaluate a toy VQA task THROUGH the serving stack: harness ->
    llava_sglang adapter -> HTTP /generate -> sglang_worker (paged
    continuous batcher) -> debug model.  Reference bar:
    lmms-eval/lmms_eval/models/llava_sglang.py (runtime + thread fan-out).
    """
    import json as _json

    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 64), (0, 120, 40)).save(img_dir / "g.jpg")
    docs = [
        {"question": "What color?", "answer": "green", "image": "g.jpg"},
        {"question": "How many dogs?", "answer": "0", "image": "g.jpg"},
        {"question": "Indoors or outdoors?", "answer": "outdoors",
         "image": "g.jpg"},
    ]
    dpath = tmp_path / "docs.json"
    with open(dpath, "w") as f:
        _json.dump(docs, f)

    from matryoshka_mm_tpu.lmms_eval.api.registry import register_task
    from matryoshka_mm_tpu.lmms_eval.evaluator import simple_evaluate

    register_task("toy_vqa_sglang", {
        "task": "toy_vqa_sglang",
        "dataset_path": str(dpath),
        "doc_to_visual": "image",
        "doc_to_text": "{question}",
        "doc_to_target": "answer",
        "dataset_kwargs": {"image_folder": str(img_dir)},
        "generation_kwargs": {"max_new_tokens": 4, "temperature": 0.0},
        "metric_list": [{"metric": "exact_match"}],
    })

    results = simple_evaluate(
        model="llava_sglang",
        model_args="pretrained=debug://tiny,parallel=3,max_batch=2",
        tasks=["toy_vqa_sglang"],
        matryoshka_vis_token_scale="ver=v0_numtoks=4",
        log_samples=True,
    )
    agg = results["results"]["toy_vqa_sglang"]
    assert agg["samples"] == 3
    assert 0.0 <= agg["exact_match"] <= 1.0
    # every sample produced a real (string) response through the wire
    for s in results["samples"]["toy_vqa_sglang"]:
        assert isinstance(s["resps"][0], str)


def test_llava_sglang_adapter_loglikelihood_unsupported():
    from matryoshka_mm_tpu.lmms_eval.api.registry import get_model
    import pytest as _pytest

    cls = get_model("llava_sglang")
    lm = cls.__new__(cls)          # no worker spin-up needed for this
    with _pytest.raises(NotImplementedError):
        lm.loglikelihood([])
