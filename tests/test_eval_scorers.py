

def test_science_qa_gpt4_scorer(tmp_path):
    import json

    from matryoshka_mm_tpu.eval.eval_science_qa_gpt4 import evaluate

    base = tmp_path
    json.dump({"test": ["p1", "p2", "p3"]}, open(base / "pid_splits.json", "w"))
    json.dump({
        "p1": {"choices": ["x", "y"], "answer": 1},
        "p2": {"choices": ["x", "y", "z"], "answer": 0},
        "p3": {"choices": ["x", "y"], "answer": 0},
    }, open(base / "problems.json", "w"))
    with open(base / "ours.jsonl", "w") as f:
        f.write(json.dumps({"question_id": "p1", "text": "The answer is B."}) + "\n")
        f.write(json.dumps({"question_id": "p2", "text": "no letter here"}) + "\n")
        f.write(json.dumps({"question_id": "p3", "text": "The answer is B."}) + "\n")
    json.dump({"outputs": {
        "p1": "The answer is B.",   # correct
        "p2": "The answer is A.",   # correct
        "p3": "hmm",                # FAILED -> falls back to ours (B, wrong)
    }}, open(base / "gpt4.json", "w"))
    with open(base / "requery.jsonl", "w") as f:
        f.write(json.dumps({"question_id": "p2", "text": "The answer is A."}) + "\n")

    r = evaluate(str(base), str(base / "gpt4.json"), str(base / "ours.jsonl"),
                 requery_result=str(base / "requery.jsonl"))
    assert r["correct"] == 2 and r["incorrect"] == 1
    assert r["gpt4_failed"] == 1 and r["requeried"] == 1
    assert r["correct_upperbound"] == 2
