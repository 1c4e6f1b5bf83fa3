import numpy as np
import pytest

from matryoshka_mm_tpu.igvlm.grid import create_grid_view, default_max_per_row
from matryoshka_mm_tpu.igvlm.evaluation import eval_multiple_choice, extract_answer


def test_grid_layout():
    frames = [np.full((20, 30, 3), i * 40, np.uint8) for i in range(6)]
    grid = create_grid_view(frames)
    # 6 frames -> 3 per row, 2 rows
    assert grid.shape == (40, 90, 3)


def test_grid_white_padding():
    frames = [np.zeros((10, 10, 3), np.uint8) for _ in range(5)]
    grid = create_grid_view(frames)  # 3 per row -> pads to 6
    assert grid.shape == (20, 30, 3)
    assert (grid[10:, 20:] == 255).all()  # last cell is white padding


def test_max_per_row():
    assert default_max_per_row(6) == 3
    assert default_max_per_row(9) == 3
    assert default_max_per_row(10) == 4


def test_extract_answer():
    assert extract_answer("(C) the dog") == "C"
    assert extract_answer("B. running") == "B"
    assert extract_answer("A") == "A"


def test_eval_multiple_choice():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame([
        {"pred": "(A) cat", "answer": "A"},
        {"pred": "B. dog", "answer": "0"},   # gold index 0 == 'A'
        {"pred": "C", "answer": "C"},
    ])
    m = eval_multiple_choice(df)
    assert m["correct"] == 2 and m["total"] == 3


def test_video_frames_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from matryoshka_mm_tpu.igvlm.grid import extract_frames, video_to_grid_image

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for i in range(30):
        frame = np.full((24, 32, 3), i * 8 % 255, np.uint8)
        w.write(frame)
    w.release()

    frames = extract_frames(path, 6)
    assert len(frames) == 6
    img = video_to_grid_image(path, 6)
    assert img.size == (32 * 3, 24 * 2)


def _fake_judge(calls, response="{'pred': 'yes', 'score': 4}"):
    def judge(messages):
        calls.append(messages)
        return response
    return judge


def test_parse_judge_response():
    from matryoshka_mm_tpu.igvlm.evaluation import parse_judge_response

    assert parse_judge_response("{'pred': 'yes', 'score': 4}") == \
        {"pred": "yes", "score": 4}
    # trailing period + doubled quote tolerance
    assert parse_judge_response("{''score': 3}.") == {"score": 3}
    # malformed output salvaged by regex
    out = parse_judge_response("Sure! pred: yes, score: 5")
    assert out == {"pred": "yes", "score": 5.0}


def test_gpt_judge_resume(tmp_path):
    """Interrupted judge runs resume: cached per-question files are not
    re-queried, and an existing result.csv short-circuits entirely."""
    pd = pytest.importorskip("pandas")
    from matryoshka_mm_tpu.igvlm.evaluation import eval_gpt3, summarize_judge

    df = pd.DataFrame([
        {"question_id": i, "question": f"q{i}", "answer": "a cat",
         "pred": "a small cat"} for i in range(4)])
    calls = []
    out_dir = str(tmp_path / "judge")
    df1, path1 = eval_gpt3(df, out_dir, judge=_fake_judge(calls))
    assert len(calls) == 4
    assert (df1["gpt3_pred"] == "yes").all()
    assert summarize_judge(df1) == {"accuracy": 1.0, "score": 4.0}

    # result.csv exists -> no new judge calls at all
    df2, _ = eval_gpt3(df, out_dir, judge=_fake_judge(calls))
    assert len(calls) == 4

    # partial resume: drop result.csv and one cached response
    import os
    os.remove(path1)
    os.remove(os.path.join(out_dir, "2.txt"))
    df3, _ = eval_gpt3(df, out_dir, judge=_fake_judge(calls))
    assert len(calls) == 5          # only the missing row re-queried
    assert df3["gpt3_score"].astype(float).tolist() == [4.0] * 4


def test_gpt_judge_consistency(tmp_path):
    pd = pytest.importorskip("pandas")
    from matryoshka_mm_tpu.igvlm.evaluation import eval_gpt3_consistency

    df1 = pd.DataFrame([{"question_id": 0, "question": "what is shown?",
                         "answer": "a dog", "pred": "a dog runs"}])
    df2 = pd.DataFrame([{"question_id": 0, "question": "describe the scene",
                         "answer": "a dog", "pred": "a running dog"}])
    calls = []
    df, path = eval_gpt3_consistency(df1, df2, str(tmp_path / "co"),
                                     judge=_fake_judge(calls, "{'score': 5}"))
    assert len(calls) == 1
    user = calls[0][1]["content"]
    assert "Question 1: what is shown?" in user
    assert "Question 2: describe the scene" in user
    assert "Predicted Answer to Question 2: a running dog" in user
    assert float(df.loc[0, "gpt3_score"]) == 5.0


def test_judge_rubric_dimensions():
    from matryoshka_mm_tpu.igvlm.evaluation import (EvaluationType,
                                                    make_messages)

    for et, needle in [(EvaluationType.CORRECTNESS, "factual"),
                       (EvaluationType.DETAILED_ORIENTATION, "detail"),
                       (EvaluationType.CONTEXT, "context"),
                       (EvaluationType.TEMPORAL, "temporal")]:
        msgs = make_messages("q", "a", "p", et)
        assert needle in msgs[0]["content"].lower()
        assert "'score'" in msgs[1]["content"]
    default = make_messages("q", "a", "p")
    assert "'pred'" in default[1]["content"]


def test_openended_entry_end_to_end(tmp_path):
    """Full open-ended run: tiny video -> grid -> debug model -> fake judge."""
    pd = pytest.importorskip("pandas")
    cv2 = pytest.importorskip("cv2")
    from matryoshka_mm_tpu.igvlm.eval_llava_openended import build_parser, run

    vdir = tmp_path / "videos"
    vdir.mkdir()
    path = str(vdir / "v0.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for i in range(12):
        w.write(np.full((24, 32, 3), i * 20 % 255, np.uint8))
    w.release()

    qa = tmp_path / "qa.csv"
    pd.DataFrame([{"question_id": 0, "video_name": "v0.mp4",
                   "question": "what happens", "answer": "flicker"}]) \
        .to_csv(qa, index=False)

    args = build_parser().parse_args([
        "--path_qa_pair_csv", str(qa), "--path_video", str(vdir),
        "--path_result", str(tmp_path / "out"),
        "--matryoshka_vis_token_scale", "ver=v0_numtoks=4"])
    calls = []
    df, summary = run(args, judge=_fake_judge(calls))
    assert len(calls) == 1
    assert summary["accuracy"] == 1.0 and summary["score"] == 4.0
    assert "pred" in df.columns


def test_gpt4v_entries_end_to_end(tmp_path):
    """API-backed IG-VLM entries (reference: IG-VLM/eval_gpt4v_*): grid
    preprocessing + mock endpoint + scoring, for both the multiple-choice
    exact-match entry and the open-ended GPT-judge entry."""
    pd = pytest.importorskip("pandas")
    cv2 = pytest.importorskip("cv2")
    from matryoshka_mm_tpu.igvlm import (eval_gpt4v_multiplechoice as mc,
                                         eval_gpt4v_openended as oe)

    vdir = tmp_path / "videos"
    vdir.mkdir()
    path = str(vdir / "v0.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for i in range(12):
        w.write(np.full((24, 32, 3), i * 20 % 255, np.uint8))
    w.release()

    api_calls = []

    def fake_post(payload):
        api_calls.append(payload)
        parts = payload["messages"][0]["content"]
        assert parts[1]["image_url"]["url"].startswith("data:image/png")
        return {"choices": [{"message": {"content": "A"}}]}

    # multiple-choice: prediction 'A' matches the gold answer
    qa = tmp_path / "qa_mc.csv"
    pd.DataFrame([{"question_id": 0, "video_name": "v0.mp4",
                   "question": "what happens",
                   "options": "A. flicker\nB. nothing",
                   "answer": "A"}]).to_csv(qa, index=False)
    args = mc.build_parser().parse_args([
        "--path_qa_pair_csv", str(qa), "--path_video", str(vdir),
        "--path_result", str(tmp_path / "mc.csv")])
    acc = mc.run(args, post_fn=fake_post)
    assert len(api_calls) == 1
    assert "what happens" in api_calls[0]["messages"][0]["content"][0]["text"]
    assert acc["accuracy"] == 1.0

    # open-ended: same transport, judged by the fake GPT judge
    qa2 = tmp_path / "qa_oe.csv"
    pd.DataFrame([{"question_id": 0, "video_name": "v0.mp4",
                   "question": "what happens", "answer": "A"}]) \
        .to_csv(qa2, index=False)
    args = oe.build_parser().parse_args([
        "--path_qa_pair_csv", str(qa2), "--path_video", str(vdir),
        "--path_result", str(tmp_path / "oe_out")])
    judge_calls = []
    df, summary = oe.run(args, judge=_fake_judge(judge_calls),
                         post_fn=fake_post)
    assert len(api_calls) == 2 and len(judge_calls) == 1
    assert summary["accuracy"] == 1.0 and summary["score"] == 4.0
