import json

from matryoshka_mm_tpu.eval.eval_mmvet import grade_mmvet, parse_grade
from matryoshka_mm_tpu.eval.gpt_review import (
    parse_score,
    review_answers,
    summarize_gpt_review,
)


def test_parse_score():
    assert parse_score("7 8\nGood answers") == [7.0, 8.0]
    assert parse_score("7, 8\nGood") == [7.0, 8.0]
    assert parse_score("garbage") == [-1, -1]


def test_parse_grade():
    assert parse_grade("0.5") == 0.5
    assert parse_grade("Correctness: 1.0") == 1.0
    assert parse_grade("no score") == 0.0


def test_review_answers_with_fake_judge(tmp_path):
    qf = tmp_path / "q.jsonl"
    a1 = tmp_path / "a1.jsonl"
    a2 = tmp_path / "a2.jsonl"
    rf = tmp_path / "rule.json"
    out = tmp_path / "review.jsonl"
    with open(qf, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "Describe.",
                            "category": "default"}) + "\n")
    with open(a1, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "A cat.",
                            "answer_id": "x"}) + "\n")
    with open(a2, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "A red cat.",
                            "answer_id": "y"}) + "\n")
    with open(rf, "w") as f:
        json.dump({"default": {"role": "Assistant", "prompt": "rate both"}}, f)

    calls = []

    def fake_judge(system, user):
        calls.append(user)
        return "6 8\nassistant 2 was more detailed"

    reviews = review_answers(str(qf), [str(a1), str(a2)], str(rf), str(out),
                             chat_fn=fake_judge)
    assert reviews[0]["tuple"] == [6.0, 8.0]
    assert "[Assistant 1]\nA cat." in calls[0]

    # resume: second run hits no judge calls
    reviews2 = review_answers(str(qf), [str(a1), str(a2)], str(rf), str(out),
                              chat_fn=fake_judge)
    assert len(calls) == 1
    assert reviews2[0]["tuple"] == [6.0, 8.0]

    summary = summarize_gpt_review([str(out)])
    key = f"{out}:all"
    assert summary[key][:2] == [6.0, 8.0]


def test_grade_mmvet_with_fake_judge(tmp_path):
    results = tmp_path / "res.json"
    meta = tmp_path / "meta.json"
    out = tmp_path / "grades.json"
    with open(results, "w") as f:
        json.dump({"v1_0": "x = -1 or x = -5", "v1_1": "wrong"}, f)
    with open(meta, "w") as f:
        json.dump({
            "v1_0": {"question": "q0", "answer": "-1 <AND> -5",
                     "capability": ["math"]},
            "v1_1": {"question": "q1", "answer": "42", "capability": ["math"]},
        }, f)

    def fake_judge(system, user):
        # grade based on the final (non-few-shot) row only
        last_row = user.strip().rsplit("\n", 1)[-1]
        return "1.0" if "x = -1 or x = -5" in last_row else "0.0"

    summary = grade_mmvet(str(results), str(meta), str(out),
                          chat_fn=fake_judge)
    assert summary["math"] == 50.0
    assert summary["total"] == 50.0
