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
