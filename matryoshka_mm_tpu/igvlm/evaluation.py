"""IG-VLM answer scoring
(reference: IG-VLM/evaluation/direct_answer_eval.py:11-65,
gpt3_evaluation_utils.py:18-99 — the GPT judge is API-gated here).
"""

from __future__ import annotations

import re
from typing import Dict, List


def extract_answer(pred: str) -> str:
    """Pull the option letter out of a multiple-choice prediction."""
    pred = pred.strip()
    m = re.search(r"\(?([A-E])\)?[.:\s]|^\(?([A-E])\)?$", pred)
    if m:
        return (m.group(1) or m.group(2)).upper()
    return pred[:1].upper()


def eval_multiple_choice(df) -> Dict[str, float]:
    """Exact option-letter accuracy (direct_answer_eval.py:11-65).

    Expects columns ``pred`` and ``answer`` (gold letter or index)."""
    correct = 0
    total = 0
    for _, row in df.iterrows():
        gold = str(row["answer"]).strip()
        if gold.isdigit():
            gold = "ABCDE"[int(gold)]
        pred = extract_answer(str(row["pred"]))
        correct += int(pred == gold.upper())
        total += 1
    acc = correct / max(total, 1)
    print(f"Accuracy: {acc * 100:.2f}% ({correct}/{total})")
    return {"accuracy": acc, "correct": correct, "total": total}


def eval_open_ended_with_gpt(df, api_key: str = None, model: str = "gpt-3.5-turbo"):
    """GPT-3.5 judge with yes/no + 0-5 score
    (gpt3_evaluation_utils.py:18-99).  Requires an OpenAI-compatible
    endpoint; raises a clear error when unavailable (no egress here)."""
    if api_key is None:
        raise RuntimeError(
            "GPT-judge evaluation needs an OpenAI API key/endpoint; this "
            "environment has no network egress. Use eval_multiple_choice "
            "or provide api_key when deployed.")
    import requests as _requests  # noqa: F401 — deployment path only

    raise NotImplementedError("wire to your OpenAI-compatible endpoint")
