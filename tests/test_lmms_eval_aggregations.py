"""Benchmark-faithful lmms-eval aggregations: MME acc+acc_plus, MMBench
circular consistency + category hit rates, SEED per-question-type
breakdown (golden fixtures hand-computed from the reference protocols:
lmms-eval/lmms_eval/tasks/mme/utils.py:75-120,
mmbench/mmbench_evals.py:184-270, seedbench/utils.py:17-46)."""

import json

import pytest

from matryoshka_mm_tpu.lmms_eval.api.task import ConfigurableTask
from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
    infer_option_letter,
    mmbench_aggregate,
    mmbench_preprocess,
    mmbench_process_results,
    mme_aggregate,
    mme_process_results,
    seedbench_aggregate,
    seedbench_process_results,
)


# ---------------------------------------------------------------------------
# MME
# ---------------------------------------------------------------------------

def _mme_doc(qid, cat, answer):
    return {"question_id": qid, "category": cat, "answer": answer,
            "question": "?"}


def test_mme_parse_and_routing():
    d = _mme_doc("existence/0001.png", "existence", "Yes")
    r = mme_process_results(d, "Yes.")
    assert list(r) == ["mme_perception_score"]
    assert r["mme_perception_score"]["score"] == 1.0
    # 'Nope' -> 'no' via the reference's 4-char prefix rule
    assert mme_process_results(
        _mme_doc("x", "existence", "No"), "Nope")[
            "mme_perception_score"]["score"] == 1.0
    # non-yes/no output is 'other' and always wrong
    assert mme_process_results(
        _mme_doc("x", "existence", "Yes"), "maybe")[
            "mme_perception_score"]["score"] == 0.0
    d = _mme_doc("code_reasoning/0002.png", "code_reasoning", "No")
    assert list(mme_process_results(d, "no")) == ["mme_cognition_score"]


def test_mme_acc_plus_golden():
    """Image I1 both questions right -> acc 100 + acc_plus 100; image I2
    one right -> acc 50 + acc_plus 0; category score = (200 + 50)/2."""
    results = [
        {"question_id": "existence/I1", "category": "existence", "score": 1.0},
        {"question_id": "existence/I1", "category": "existence", "score": 1.0},
        {"question_id": "existence/I2", "category": "existence", "score": 1.0},
        {"question_id": "existence/I2", "category": "existence", "score": 0.0},
    ]
    agg = mme_aggregate(results)
    assert agg["existence"] == pytest.approx(125.0)
    assert agg["total"] == pytest.approx(125.0)


def test_mme_multi_category_total():
    results = []
    for qid, s1, s2 in [("count/A", 1, 1), ("count/B", 0, 0)]:
        results += [{"question_id": qid, "category": "count", "score": s1},
                    {"question_id": qid, "category": "count", "score": s2}]
    results += [{"question_id": "OCR/C", "category": "OCR", "score": 1.0},
                {"question_id": "OCR/C", "category": "OCR", "score": 0.0}]
    agg = mme_aggregate(results)
    assert agg["count"] == pytest.approx(100.0)   # (200 + 0)/2
    assert agg["OCR"] == pytest.approx(50.0)
    assert agg["total"] == pytest.approx(150.0)


def test_mme_task_yaml_wiring(tmp_path):
    """The registered mme task runs the hook pipeline end-to-end over a
    local fixture: per-category scores and perception/cognition totals."""
    from matryoshka_mm_tpu.lmms_eval.api.registry import get_task

    cfg = dict(get_task("mme"))
    docs = [
        _mme_doc("existence/I1", "existence", "Yes"),
        _mme_doc("existence/I1", "existence", "No"),
        _mme_doc("code_reasoning/C1", "code_reasoning", "Yes"),
        _mme_doc("code_reasoning/C1", "code_reasoning", "No"),
    ]
    p = tmp_path / "mme.json"
    p.write_text(json.dumps(docs))
    cfg["dataset_path"] = str(p)
    cfg.pop("doc_to_visual")
    task = ConfigurableTask(cfg)
    preds = ["Yes", "No", "Yes", "Yes"]   # perception perfect, cognition half
    per_doc = [task.process_results(d, r) for d, r in zip(task.docs(), preds)]
    agg = task.aggregate(per_doc)
    assert agg["mme_perception_score/existence"] == pytest.approx(200.0)
    assert agg["mme_perception_score/total"] == pytest.approx(200.0)
    assert agg["mme_cognition_score/code_reasoning"] == pytest.approx(50.0)
    assert agg["mme_cognition_score/total"] == pytest.approx(50.0)


# ---------------------------------------------------------------------------
# MMBench
# ---------------------------------------------------------------------------

OPTS = {"A": "teddy bear", "B": "green pear", "C": "cat", "D": "dog"}


def test_infer_option_letter_prefetch_chain():
    assert infer_option_letter("B", OPTS) == "B"
    assert infer_option_letter("The answer is B.", OPTS) == "B"
    assert infer_option_letter("(C) because cats", OPTS) == "C"
    assert infer_option_letter("D: a dog", OPTS) == "D"
    # 'A' as an article in a long sentence must not match as a letter...
    assert infer_option_letter("A creature that barks loudly", OPTS) is None
    # ...but unique option-text containment still resolves
    assert infer_option_letter("I think it's a green pear!", OPTS) == "B"
    # ambiguous (two letters) -> unmatchable
    assert infer_option_letter("B or C", OPTS) is None
    assert infer_option_letter("", OPTS) is None


def _mmb_doc(index, answer, cat="object", l2="perception", **opts):
    d = {"index": index, "answer": answer, "category": cat,
         "l2-category": l2, "question": "what?", "hint": None}
    d.update(opts or OPTS)
    return d


def test_mmbench_preprocess_options_block():
    docs = mmbench_preprocess([_mmb_doc(1, "A")])
    assert docs[0]["hint"] == ""
    assert docs[0]["options"].startswith("There are several options:\n")
    assert "A. teddy bear" in docs[0]["options"]
    assert "D. dog" in docs[0]["options"]


def test_mmbench_circular_consistency_golden():
    """Q1 (index 1): both rotations inferred correctly -> hit.  Q2 (index
    2): main right but rotation wrong -> miss.  Overall 1/2; categories
    split per main row."""
    rows = [
        mmbench_process_results(_mmb_doc(1, "B", cat="object"), "B."),
        mmbench_process_results(_mmb_doc(1_000_001, "C", cat="object"), "C"),
        mmbench_process_results(_mmb_doc(2, "A", cat="attribute"),
                                "A"),
        mmbench_process_results(_mmb_doc(1_000_002, "D", cat="attribute"),
                                "B"),
    ]
    agg = mmbench_aggregate([r["mmbench_accuracy"] for r in rows])
    assert agg["overall"] == pytest.approx(0.5)
    assert agg["category/object"] == pytest.approx(1.0)
    assert agg["category/attribute"] == pytest.approx(0.0)
    assert agg["l2/perception"] == pytest.approx(0.5)


def test_mmbench_unmatchable_is_deterministic_miss():
    rows = [mmbench_process_results(_mmb_doc(3, "B"), "no idea at all")]
    assert rows[0]["mmbench_accuracy"]["pred"] is None
    agg = mmbench_aggregate([r["mmbench_accuracy"] for r in rows])
    assert agg["overall"] == 0.0


# ---------------------------------------------------------------------------
# SEED-Bench
# ---------------------------------------------------------------------------

def test_seedbench_per_type_golden():
    docs = [
        ({"answer": "A", "data_type": "image"}, "A"),
        ({"answer": "B", "data_type": "image"}, "C"),
        ({"answer": "C", "data_type": "video"}, "C. something"),
        ({"answer": "D", "data_type": "video"}, "D"),
    ]
    per_doc = [seedbench_process_results(d, r) for d, r in docs]
    agg = seedbench_aggregate([p["seed_accuracy"] for p in per_doc])
    assert agg["image"] == pytest.approx(0.5)
    assert agg["video"] == pytest.approx(1.0)
    assert agg["all"] == pytest.approx(0.75)


def test_hallusion_qacc_facc_golden():
    """One 2-question set over 2 figures (reference protocol: qAcc groups
    by question across figure rotations, fAcc by figure across questions;
    a group scores only when every member is correct —
    hallusion_bench/evaluate_hb.py hb_aggregation_result_intern)."""
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        hallusion_aggregate, hallusion_process_results)

    def doc(q, f, gt):
        return {"category": "VD", "subcategory": "illusion", "set_id": "1",
                "question_id": str(q), "figure_id": str(f),
                "gt_answer": gt, "question": "?"}

    cases = [
        (doc(0, 0, "1"), "yes"),     # q0/f0 correct
        (doc(0, 1, "0"), "no"),      # q0/f1 correct  -> q0 hit
        (doc(1, 0, "1"), "no"),      # q1/f0 WRONG    -> q1 miss, f0 miss
        (doc(1, 1, "0"), "no"),      # q1/f1 correct  -> f1 hit
    ]
    per_doc = [hallusion_process_results(d, r) for d, r in cases]
    agg = hallusion_aggregate([p["hallusion_acc"] for p in per_doc])
    assert agg["aAcc"] == pytest.approx(0.75)
    assert agg["qAcc"] == pytest.approx(0.5)    # q0 yes, q1 no
    assert agg["fAcc"] == pytest.approx(0.5)    # f0 no, f1 yes
    # the yes-substring parse (reference intern variant), not equality
    r = hallusion_process_results(doc(9, 9, "1"), "Yes, it is.")
    assert r["hallusion_acc"]["correct"] == 1.0


def test_mmmu_per_subject_golden():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        mmmu_aggregate, mmmu_process_results)

    cases = [
        ({"id": "validation_Art_1", "answer": "A"}, "A"),
        ({"id": "validation_Art_2", "answer": "B"}, "C"),
        ({"id": "validation_Art_Theory_1", "answer": "C"}, "(C)"),
        ({"id": "validation_Math_3", "answer": "D"}, "D."),
    ]
    per_doc = [mmmu_process_results(d, r) for d, r in cases]
    agg = mmmu_aggregate([p["mmmu_acc"] for p in per_doc])
    assert agg["Art"] == pytest.approx(0.5)
    assert agg["Art_Theory"] == pytest.approx(1.0)
    assert agg["Math"] == pytest.approx(1.0)
    # discipline rollups pool instances (reference calculate_ins_level_acc)
    assert agg["Overall-Art and Design"] == pytest.approx(2 / 3, abs=1e-4)
    assert agg["Overall-Science"] == pytest.approx(1.0)
    assert agg["Overall"] == pytest.approx(0.75)


def test_websrc_per_domain_golden():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        websrc_aggregate, websrc_process_results)

    cases = [
        ({"answer": "red car", "domain": "auto"}, "red car"),     # f1 1.0
        ({"answer": "blue", "domain": "auto"}, "green"),          # f1 0.0
        ({"answer": "yes", "domain": "movie"}, "yes"),            # f1 1.0
    ]
    per_doc = [websrc_process_results(d, r) for d, r in cases]
    agg = websrc_aggregate([p["websrc_squad_f1"] for p in per_doc])
    assert agg["auto"] == pytest.approx(0.5)
    assert agg["movie"] == pytest.approx(1.0)
    assert agg["overall"] == pytest.approx(2 / 3, abs=1e-4)


def test_cmmmu_type_parsing_and_rollups():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        cmmmu_aggregate, cmmmu_process_results)

    cases = [
        # MC: parenthesized letter wins over loose letters
        ({"type": "选择", "answer": "B", "subcategory": "艺术"},
         "答案是 (B)。"),
        # MC: bare letter
        ({"type": "选择", "answer": "C", "subcategory": "艺术"}, "C"),
        # TF: 对/错 verdicts
        ({"type": "判断", "answer": "对", "subcategory": "数学"}, "这是正确的"),
        ({"type": "判断", "answer": "错", "subcategory": "数学"}, "不对"),
        # fill-in: normalized containment
        ({"type": "填空", "answer": "42", "subcategory": "数学"},
         "结果等于 42。"),
        ({"type": "填空", "answer": "北京", "subcategory": "历史"}, "上海"),
    ]
    per_doc = [cmmmu_process_results(d, r) for d, r in cases]
    agg = cmmmu_aggregate([p["cmmmu_acc"] for p in per_doc])
    assert agg["艺术"] == pytest.approx(1.0)
    assert agg["数学"] == pytest.approx(1.0)
    assert agg["历史"] == pytest.approx(0.0)
    assert agg["Overall-科学"] == pytest.approx(1.0)       # 数学 ∈ 科学
    assert agg["Overall-人文社会科学"] == pytest.approx(0.0)
    assert agg["Overall"] == pytest.approx(5 / 6, abs=1e-4)


def test_exact_match_any_metric():
    from matryoshka_mm_tpu.lmms_eval.api.metrics import exact_match_any

    assert exact_match_any(["Red Car", "automobile"], " red car ") == 1.0
    assert exact_match_any(["red"], "red car") == 0.0
    assert exact_match_any("single", "SINGLE") == 1.0


def test_pope_full_metrics_golden():
    """2 yes-gt (1 hit), 2 no-gt (1 false 'yes'): precision 1/2,
    recall 1/2, f1 1/2, accuracy 1/2, yes_ratio 1/2 (reference
    pope/utils.py:29-87 definitions)."""
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        pope_aggregate, pope_process_results)

    cases = [
        ({"answer": "yes"}, "Yes"),
        ({"answer": "yes"}, "no"),
        ({"answer": "no"}, "yes, there is"),
        ({"answer": "no"}, "No."),
    ]
    per_doc = [pope_process_results(d, r) for d, r in cases]
    agg = pope_aggregate([p["pope_metrics"] for p in per_doc])
    assert agg["accuracy"] == pytest.approx(0.5)
    assert agg["precision"] == pytest.approx(0.5)
    assert agg["recall"] == pytest.approx(0.5)
    assert agg["f1"] == pytest.approx(0.5)
    assert agg["yes_ratio"] == pytest.approx(0.5)


def test_ocrbench_final_score_golden():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        ocrbench_aggregate, ocrbench_process_results)

    cases = [
        ({"answer": ["HELLO"], "question_type": "Regular Text Recognition",
          "dataset": "x"}, "hello world"),                        # hit
        ({"answer": "42", "question_type": "Digit String Recognition",
          "dataset": "x"}, "41"),                                  # miss
        ({"answer": ["a+b"], "question_type":
          "Handwritten Mathematical Expression Recognition",
          "dataset": "HME100k"}, "a + b"),      # space-stripped containment
        ({"answer": "paris", "question_type": "Scene Text-centric VQA",
          "dataset": "x"}, "It is Paris."),                       # hit
    ]
    per_doc = [ocrbench_process_results(d, r) for d, r in cases]
    agg = ocrbench_aggregate([p["ocrbench_accuracy"] for p in per_doc])
    assert agg["text_recognition_total"] == 1
    assert agg["final_score"] == 3
    assert agg["accuracy"] == pytest.approx(0.75)


def test_screenspot_threshold_ladder():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        screenspot_rec_aggregate, screenspot_rec_process_results)

    # exact box -> IoU 1; shifted box -> IoU 1/7, center outside the gold
    d = {"bbox": [0.0, 0.0, 0.4, 0.4]}
    exact = screenspot_rec_process_results(d, "[0.0, 0.0, 0.4, 0.4]")
    part = screenspot_rec_process_results(d, "[0.3, 0.0, 0.7, 0.4]")
    agg = screenspot_rec_aggregate([exact["screenspot_rec"],
                                    part["screenspot_rec"]])
    assert agg["ACC@0.9"] == pytest.approx(0.5)
    assert agg["ACC@0.1"] == pytest.approx(1.0)
    assert agg["ACC@0.3"] == pytest.approx(0.5)
    assert agg["Center_ACC"] == pytest.approx(0.5)
    assert agg["IoU"] == pytest.approx((1.0 + 1 / 7) / 2, abs=1e-3)


def test_caption_metrics_properties():
    """CIDEr-D / ROUGE-L / corpus-BLEU sanity: exact matches score at the
    ceiling, disjoint captions at the floor, and the known CIDEr
    idf-of-common-ngram behavior (an n-gram in every image's refs gets
    idf 0)."""
    from matryoshka_mm_tpu.eval.caption_metrics import (cider_d,
                                                        corpus_bleu,
                                                        rouge_l)

    preds = ["a red car parked outside", "two dogs play in the park"]
    refs = [["a red car parked outside", "a crimson automobile outdoors"],
            ["two dogs play in the park", "dogs playing at a park"]]
    corpus, per = cider_d(preds, refs)
    assert corpus > 3.0          # exact matches dominate
    assert all(s > 0 for s in per)
    # disjoint prediction scores ~0
    _, per_bad = cider_d(["zebra quantum flux"], [refs[0]])
    assert per_bad[0] < 0.1

    assert rouge_l("a red car", ["a red car"]) == pytest.approx(1.0)
    assert rouge_l("xyz", ["a red car"]) == 0.0
    # F-beta: precision-light candidate still scores via recall weighting
    assert 0.0 < rouge_l("the a red car thing", ["a red car"]) < 1.0

    bleu = corpus_bleu(preds, refs)
    assert bleu[0] == pytest.approx(1.0)     # Bleu_1 on exact matches
    assert bleu[3] == pytest.approx(1.0)     # Bleu_4 too
    bleu_bad = corpus_bleu(["zebra quantum flux"], [refs[0]])
    assert bleu_bad[3] < 0.01


def test_caption_task_hooks():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        caption_aggregate, caption_process_results)

    per_doc = [
        caption_process_results({"answer": ["a cat on a mat"]},
                                "a cat on a mat"),
        caption_process_results({"reference_strs": ["a big dog runs"]},
                                "a big dog runs"),
    ]
    agg = caption_aggregate([p["caption_scores"] for p in per_doc])
    assert agg["Bleu_4"] == pytest.approx(1.0)
    assert agg["ROUGE_L"] == pytest.approx(1.0)
    assert agg["CIDEr"] > 3.0


def test_check_integrity_accepts_hooks():
    from matryoshka_mm_tpu.lmms_eval.api.registry import (TASK_REGISTRY,
                                                          register_task)
    from matryoshka_mm_tpu.lmms_eval.evaluator import check_integrity

    assert check_integrity(["mme", "mmbench_en", "seedbench"]) == []
    register_task("bad_hook_task", {
        "task": "bad_hook_task", "dataset_path": "x",
        "doc_to_text": "{q}", "doc_to_target": "a",
        "process_results": "task_utils.does_not_exist",
        "metric_list": [{"metric": "whatever",
                         "aggregation": "task_utils.also_missing"}]})
    try:
        problems = check_integrity(["bad_hook_task"])
        assert any("aggregation" in p for p in problems)
        assert any("process_results" in p for p in problems)
    finally:
        TASK_REGISTRY.pop("bad_hook_task", None)   # keep the corpus clean
        # for test_check_integrity's no-arg whole-registry scan


# ---------------------------------------------------------------------------
# MathVista (mathvista_evals.py:114-245, utils.py:45-118)
# ---------------------------------------------------------------------------

def test_mathvista_extraction_chain():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import \
        _mathvista_extract

    # verbatim choice passes through
    assert _mathvista_extract("8/11", "multi_choice", "text",
                              ["3/11", "8/11"]) == "8/11"
    # bare integer / float responses parse directly
    assert _mathvista_extract("14", "free_form", "integer", []) == "14"
    assert _mathvista_extract("0.60", "free_form", "float", []) == "0.6"
    # the reference's quick-extract regex
    assert _mathvista_extract('The answer is "blue".', "free_form", "text",
                              []) == "blue"
    # offline heuristics: option letter, trailing number
    assert _mathvista_extract("The correct answer is (B) 8/11.",
                              "multi_choice", "text",
                              ["3/11", "8/11"]) == "B"
    assert _mathvista_extract("Luca needs $1.45 in total.", "free_form",
                              "float", []) == "1.45"


def test_mathvista_normalize_golden():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import \
        _mathvista_normalize

    choices = ["red", "green", "blue"]
    # "(B)" -> letter -> choice text
    assert _mathvista_normalize("(b) green", choices, "multi_choice",
                                "text", 0) == "green"
    # non-letter falls back to Levenshtein nearest choice
    assert _mathvista_normalize("blu", choices, "multi_choice",
                                "text", 0) == "blue"
    # numeric rounding honors the per-question precision
    assert _mathvista_normalize("1.456", [], "free_form", "float", 1) \
        == "1.5"
    assert _mathvista_normalize("3.0", [], "free_form", "integer", 0) == "3"
    assert _mathvista_normalize("oops", [], "free_form", "integer", 0) \
        is None


def test_mathvista_per_key_breakdown_golden():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        mathvista_aggregate, mathvista_process_results)

    docs = [
        {"pid": "1", "question_type": "multi_choice", "answer_type": "text",
         "choices": ["3", "4"], "answer": "4", "query": "q",
         "metadata": {"task": "geometry", "skills": ["algebra", "logic"],
                      "grade": "elem"}},
        {"pid": "2", "question_type": "free_form", "answer_type": "integer",
         "choices": [], "answer": "7", "query": "q", "precision": 0,
         "metadata": {"task": "geometry", "skills": ["logic"],
                      "grade": "high"}},
        {"pid": "3", "question_type": "free_form", "answer_type": "float",
         "choices": [], "answer": "1.2", "query": "q", "precision": 1,
         "metadata": {"task": "statistics", "skills": ["algebra"],
                      "grade": "high"}},
    ]
    preds = ["The correct answer is (B) 4.",   # right
             "The count is 7.",                # right
             "I think it is 3.4"]              # wrong
    recs = [mathvista_process_results(d, p)["mathvista_acc"]
            for d, p in zip(docs, preds)]
    assert [r["score"] for r in recs] == [1.0, 1.0, 0.0]
    agg = mathvista_aggregate(recs)
    assert agg["average"] == round(2 / 3, 4)
    assert agg["task/geometry"] == 1.0
    assert agg["task/statistics"] == 0.0
    # skills explode: algebra sees docs 1 and 3, logic sees 1 and 2
    assert agg["skills/algebra"] == 0.5
    assert agg["skills/logic"] == 1.0
    assert agg["question_type/multi_choice"] == 1.0
    assert agg["grade/high"] == 0.5


# ---------------------------------------------------------------------------
# MathVerse (mathverse_evals.py:155-187, :262-306)
# ---------------------------------------------------------------------------

def test_mathverse_quick_match_and_breakdowns():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        mathverse_aggregate, mathverse_process_results)

    docs = [
        {"question_type": "multi-choice", "answer": "B",
         "problem_version": "Text Dominant",
         "metadata": {"subfield": "Plane Geometry"},
         "question_for_eval": "q1"},
        {"question_type": "free-form", "answer": "12",
         "problem_version": "Vision Only",
         "metadata": {"subfield": "Algebra"},
         "question_for_eval": "q2"},
        {"question_type": "free-form", "answer": "3.5",
         "problem_version": "Text Dominant",
         "metadata": {"subfield": "Algebra"},
         "question_for_eval": "q3"},
    ]
    preds = ["The answer is (B).",      # letter extracted, matches
             "So the result is 12.",    # trailing number, matches
             "I believe it is 4"]       # wrong
    recs = [mathverse_process_results(d, p)["mathverse_acc"]
            for d, p in zip(docs, preds)]
    assert [r["score"] for r in recs] == [1.0, 1.0, 0.0]
    agg = mathverse_aggregate(recs)
    assert agg["average"] == round(2 / 3, 4)
    assert agg["problem_version/Text Dominant"] == 0.5
    assert agg["problem_version/Vision Only"] == 1.0
    assert agg["subfield/Algebra"] == 0.5
    assert agg["subfield/Plane Geometry"] == 1.0


# ---------------------------------------------------------------------------
# OlympiadBench (en_utils.py:51-66 + olympiadbench_evals.py protocol)
# ---------------------------------------------------------------------------

def test_math_judge_protocol():
    from matryoshka_mm_tpu.eval.math_judge import judge

    assert judge(r"\frac{1}{2}", "0.5")
    assert judge(r"2\sqrt{3}", r"\sqrt{12}")
    assert judge("1,2", "2,1")                    # order-free multi-answer
    assert judge(r"\pm 3", "3,-3")                # plus-minus expansion
    assert judge("[1,2]", "[1.0, 2.0]")           # interval
    assert judge("50", "0.5")                     # percentage alias
    assert judge("3.14159", r"\pi", 1e-3)         # pi substitution
    assert judge("1.41", r"\sqrt{2}", 1e-2)       # tolerance honored
    assert not judge("1.41", r"\sqrt{2}", 1e-8)
    assert not judge("7", "8")
    assert not judge("1,2", "1")                  # arity mismatch
    # the dataset's "error" field is a STRING (possibly comma-joined per
    # component) — must parse, not silently disable tolerance matching
    assert judge("0.33", "0.333", "1e-2")
    assert not judge("0.33", "0.4", "1e-2")
    assert judge("0.33,0.66", "0.333,0.667", "1e-2,1e-2")
    # a tolerance list shorter than the component count pads with its
    # last entry — it must never truncate the comparison (a regression
    # here scored unchecked components as correct)
    assert not judge("1,2,3", "1,2,999", [1e-8, 1e-8])
    assert judge("1,2,3", "1,2,3.0000001", [1e-8, 1e-8, 1e-3])
    assert not judge("0.33", "0.4", None)         # None -> 1e-8 default


def test_olympiadbench_process_and_aggregate():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        olympiadbench_aggregate, olympiadbench_doc_to_text,
        olympiadbench_process_results)

    doc = {"source": "OE_MM_maths_en_COMP", "final_answer": [r"\frac{3}{4}"],
           "error": None, "subfield": "Math", "question": "q?",
           "is_multiple_answer": False, "answer_type": "a fraction"}
    good = olympiadbench_process_results(
        doc, r"Therefore... So the final answer is \boxed{\frac{3}{4}}.")
    bad = olympiadbench_process_results(
        doc, r"So the final answer is \boxed{\frac{1}{4}}.")
    proof = olympiadbench_process_results(
        {**doc, "source": "OE_TP_maths_en"}, "Proof: ...")
    recs = [good["olympiadbench_acc"], bad["olympiadbench_acc"],
            proof["olympiadbench_acc"]]
    assert [r["score"] for r in recs] == [1.0, 0.0, None]
    agg = olympiadbench_aggregate(recs)
    assert agg == {"accuracy": 0.5, "scored": 2, "proof_submissions": 1}
    # prompt construction carries the answer-type hint and boxed suffix
    text = olympiadbench_doc_to_text(doc)
    assert "International Math competition" in text
    assert "a fraction" in text and "\\boxed{answer}" in text


def test_refcoco_rec_ladder():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        refcoco_rec_aggregate, refcoco_rec_process_results)

    doc = {"bbox": [0.1, 0.1, 0.5, 0.5]}
    exact = refcoco_rec_process_results(doc, "(0.1, 0.1, 0.5, 0.5)")
    off = refcoco_rec_process_results(doc, "(0.3, 0.3, 0.7, 0.7)")
    recs = [exact["refcoco_rec"], off["refcoco_rec"]]
    agg = refcoco_rec_aggregate(recs)
    assert agg["ACC@0.9"] == 0.5          # only the exact box
    assert agg["ACC@0.1"] == 1.0          # both overlap a little
    assert 0.5 < agg["IoU"] < 1.0
    assert agg["Center_ACC"] == 1.0       # off-box center (0.5,0.5) is on
                                          # the gt corner -> still inside


def test_chartqa_split_means():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        chartqa_aggregate, chartqa_process_results)

    recs = [
        chartqa_process_results({"answer": "42", "type": "human_test"},
                                "42")["relaxed_accuracy"],
        chartqa_process_results({"answer": "10", "type": "human_test"},
                                "10.4")["relaxed_accuracy"],   # within 5%
        chartqa_process_results({"answer": "blue", "type": "aug_test"},
                                "red")["relaxed_accuracy"],
    ]
    agg = chartqa_aggregate(recs)
    assert agg["relaxed_overall"] == round(2 / 3, 4)
    assert agg["relaxed_human_split"] == 1.0
    assert agg["relaxed_augmented_split"] == 0.0


def test_mmvet_capability_rollups():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import mmvet_aggregate

    recs = [
        {"score": 1.0, "capabilities": "ocr,math"},
        {"score": 0.0, "capabilities": "ocr"},
        {"score": 0.5, "capabilities": "rec"},
    ]
    agg = mmvet_aggregate(recs)
    assert agg["overall"] == 50.0
    assert agg["cap/ocr"] == 50.0
    assert agg["cap/math"] == 100.0
    assert agg["cap/rec"] == 50.0
    assert agg["detail/math_ocr"] == 100.0
    assert "detail/ocr" not in agg


def test_llava_wild_relative_score():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import \
        llava_wild_aggregate

    recs = [
        {"gpt4": 8.0, "model": 6.0, "category": "conv"},
        {"gpt4": 10.0, "model": 9.0, "category": "detail"},
        {"gpt4": 5.0, "model": -1.0, "category": "conv"},   # failed parse
    ]
    agg = llava_wild_aggregate(recs)
    assert agg["conv"] == 75.0
    assert agg["detail"] == 90.0
    assert agg["all"] == round(100.0 * (7.5 / 9.0), 1)


# ---------------------------------------------------------------------------
# Review regressions: standalone-letter matching, normalization symmetry,
# case-sensitive HME, CMMMU verdict words, multi-answer OlympiadBench
# ---------------------------------------------------------------------------

def test_multiple_choice_standalone_letter():
    from matryoshka_mm_tpu.lmms_eval.api.metrics import (
        multiple_choice_index, multiple_choice_letter)

    assert multiple_choice_letter("B", "B") == 1.0
    assert multiple_choice_letter("B", "(B) blue") == 1.0
    assert multiple_choice_letter("B", "B. Blue") == 1.0
    assert multiple_choice_letter("C", "the answer is C.") == 1.0
    # a free-form word must not read as its first letter's option
    assert multiple_choice_letter("B", "Blue") == 0.0
    assert multiple_choice_letter("B", "Because of gravity") == 0.0
    assert multiple_choice_index("4", "E") == 1.0
    assert multiple_choice_index("2", "(c)") == 1.0
    assert multiple_choice_index("4", "eight") == 0.0
    assert multiple_choice_index("6", "green") == 0.0


def test_relaxed_accuracy_string_normalization_symmetric():
    from matryoshka_mm_tpu.lmms_eval.api.metrics import relaxed_accuracy

    # verbatim-correct non-numeric answers with ',' or trailing '%'
    assert relaxed_accuracy("1,000 people", "1,000 people") == 1.0
    assert relaxed_accuracy("high%", "high%") == 1.0
    assert relaxed_accuracy("12", "12.5") == 1.0      # within 5%
    assert relaxed_accuracy("12", "14") == 0.0


def test_ocrbench_hme_case_sensitive():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        ocrbench_process_results)

    doc = {"dataset": "HME100k", "answer": ["X=2"],
           "question_type": "Handwritten Mathematical Expression Recognition"}
    assert ocrbench_process_results(doc, "X=2")["ocrbench_accuracy"][
        "score"] == 1.0
    # LaTeX is case-sensitive: x=2 is a different expression
    assert ocrbench_process_results(doc, "x=2")["ocrbench_accuracy"][
        "score"] == 0.0


def test_cmmmu_meicuo_is_affirmative():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import _cmmmu_score

    assert _cmmmu_score({"type": "判断", "answer": "对"}, "没错") == 1.0
    assert _cmmmu_score({"type": "判断", "answer": "错"}, "不对") == 1.0
    assert _cmmmu_score({"type": "判断", "answer": "错"}, "错误") == 1.0
    assert _cmmmu_score({"type": "判断", "answer": "对"}, "正确") == 1.0


def test_olympiadbench_multi_answer_joined():
    from matryoshka_mm_tpu.lmms_eval.tasks.task_utils import (
        olympiadbench_process_results)

    doc = {"source": "OE_MM_maths_en_COMP", "final_answer": ["$1$", "$2$"],
           "error": None, "is_multiple_answer": True, "question": "q?",
           "answer_type": "integers"}
    good = olympiadbench_process_results(
        doc, r"So the final answer is \boxed{1,2}.")
    assert good["olympiadbench_acc"]["score"] == 1.0
    bad = olympiadbench_process_results(
        doc, r"So the final answer is \boxed{1,3}.")
    assert bad["olympiadbench_acc"]["score"] == 0.0
