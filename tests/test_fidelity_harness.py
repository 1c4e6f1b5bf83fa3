"""Checkpoint-fidelity harness (scripts/check_fidelity.py): proves the
capture -> verify -> mismatch-detection loop works end-to-end on the
debug model, and auto-activates on real weights via M3_CHECKPOINT.

BASELINE.md north-star: temperature-0 answer match vs the torch
reference at all five scales; real weights are unavailable offline, so
the harness itself is what gets tested (VERDICT round 1, item 7)."""

import importlib.util
import json
import os
import sys

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "check_fidelity", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "check_fidelity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fidelity_image_deterministic():
    m = _load()
    import numpy as np

    a = np.asarray(m.fidelity_image(64))
    b = np.asarray(m.fidelity_image(64))
    assert a.shape == (64, 64, 3) and np.array_equal(a, b)
    assert a.std() > 10  # not a constant image


def test_capture_verify_and_mismatch(tmp_path, capsys):
    m = _load()
    fx = str(tmp_path / "golden.json")
    # capture on the tiny debug model at two scales
    rc = m.main(["--model-path", "debug://tiny", "--capture", fx,
                 "--scales", "1,4"])
    assert rc == 0 and os.path.exists(fx)
    # verify against own capture: must pass
    rc = m.main(["--model-path", "debug://tiny", "--fixtures", fx,
                 "--scales", "1,4"])
    assert rc == 0
    # tamper with a golden token: must fail
    data = json.load(open(fx))
    data["4"][0] = (data["4"][0] + 1) % 400
    json.dump(data, open(fx, "w"))
    rc = m.main(["--model-path", "debug://tiny", "--fixtures", fx,
                 "--scales", "1,4"])
    assert rc == 1


@pytest.mark.skipif("M3_CHECKPOINT" not in os.environ,
                    reason="set M3_CHECKPOINT=/path/to/llava-v1.5-7b-m3 "
                           "to check real-weight fidelity")
def test_real_checkpoint_fidelity():
    """Runs automatically once real weights exist — no code changes."""
    m = _load()
    fixtures = os.environ.get(
        "M3_GOLDEN", os.path.join(os.path.dirname(__file__), "fixtures",
                                  "golden_7b_m3.json"))
    rc = m.main(["--model-path", os.environ["M3_CHECKPOINT"],
                 "--fixtures", fixtures])
    assert rc == 0
