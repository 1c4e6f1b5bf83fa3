"""Per-task doc preprocessing hooks, referenced from task YAMLs as
``process_docs: task_utils.<fn>`` (the compact analog of the reference's
``!function utils.<fn>`` mechanism, e.g.
lmms-eval/lmms_eval/tasks/refcoco/utils_rec.py
``refcoco_bbox_rec_preprocess_dataset``)."""

from __future__ import annotations

from typing import List


def refcoco_rec_preprocess(docs: List[dict]) -> List[dict]:
    """RefCOCO/+/g REC: convert the pixel ``bbox`` (x, y, w, h) to
    normalized corner form (x1, y1, x2, y2) in [0, 1], and explode the
    per-image referring expressions (``answer`` list) into one doc each
    (reference: utils_rec.py:11-44)."""
    out = []
    for doc in docs:
        w = doc.get("image_width") or getattr(doc.get("image"), "width", None)
        h = doc.get("image_height") or getattr(doc.get("image"), "height", None)
        bbox = doc.get("bbox")
        if bbox is not None and w and h and len(bbox) == 4:
            x, y, bw, bh = bbox
            bbox = [x / w, y / h, (x + bw) / w, (y + bh) / h]
        answers = doc.get("answer")
        if not isinstance(answers, list):
            answers = [answers]
        for ans in answers:
            out.append({**doc, "answer": ans, "bbox": bbox})
    return out


def screenspot_rec_preprocess(docs: List[dict]) -> List[dict]:
    """ScreenSpot REC: normalize the pixel bbox (x, y, w, h) by the
    screenshot dimensions (reference: screenspot/utils_rec.py)."""
    out = []
    for doc in docs:
        w = doc.get("image_width") or getattr(doc.get("image"), "width", None)
        h = doc.get("image_height") or getattr(doc.get("image"), "height", None)
        bbox = doc.get("bbox")
        if bbox is not None and w and h and len(bbox) == 4:
            x, y, bw, bh = bbox
            bbox = [x / w, y / h, (x + bw) / w, (y + bh) / h]
        out.append({**doc, "bbox": bbox})
    return out
