"""ConfigurableTask: YAML-driven benchmark definition
(reference: lmms-eval/lmms_eval/api/task.py — 1133 lines of machinery,
reduced to the surface the LLaVA benchmarks use).

A task config provides:
  task:              name
  dataset_path:      local .json/.jsonl file (or HF datasets name)
  dataset_kwargs:    {image_folder: ...}
  test_split:        split name (HF datasets only)
  doc_to_visual:     doc field holding the image (path or PIL)
  doc_to_text:       python format string over doc fields
  doc_to_target:     doc field (or format string) with the gold answer
  generation_kwargs: forwarded to model.generate
  metric_list:       [{metric: name, aggregation: mean, higher_is_better: true}]
  output_type:       'generate_until' (default) | 'loglikelihood'
"""

from __future__ import annotations

import json
import os
import string
from typing import Any, Dict, List, Optional

from .instance import Instance
from .metrics import AGGREGATIONS, METRICS, bootstrap_stderr


class _SafeFormatter(string.Formatter):
    def get_value(self, key, args, kwargs):
        if isinstance(key, str):
            return kwargs.get(key, "")
        return super().get_value(key, args, kwargs)


_FMT = _SafeFormatter()


class ConfigurableTask:
    def __init__(self, config: Dict[str, Any]):
        self.config = dict(config)
        self.task_name = config["task"]
        self.output_type = config.get("output_type", "generate_until")
        self._docs: Optional[List[dict]] = None

    # ---- data ----
    def docs(self, limit: Optional[int] = None) -> List[dict]:
        if self._docs is None:
            path = self.config["dataset_path"]
            if os.path.exists(path):
                if path.endswith(".jsonl"):
                    with open(path) as f:
                        self._docs = [json.loads(l) for l in f]
                else:
                    with open(path) as f:
                        data = json.load(f)
                    self._docs = data if isinstance(data, list) else \
                        data[self.config.get("test_split", "data")]
            else:
                import datasets

                ds = datasets.load_dataset(
                    path, self.config.get("dataset_name"),
                    split=self.config.get("test_split", "test"))
                self._docs = list(ds)
        return self._docs[:limit] if limit else self._docs

    # ---- doc adapters ----
    def doc_to_text(self, doc: dict) -> str:
        text = _FMT.vformat(self.config["doc_to_text"], (), doc)
        pre = self.config.get("pre_prompt", "")
        post = self.config.get("post_prompt", "")
        return f"{pre}{text}{post}"

    def doc_to_visual(self, doc: dict):
        field = self.config.get("doc_to_visual")
        if not field or field not in doc or doc[field] is None:
            return None
        vis = doc[field]
        if isinstance(vis, str):
            from PIL import Image

            folder = self.config.get("dataset_kwargs", {}).get("image_folder", "")
            return Image.open(os.path.join(folder, vis)).convert("RGB")
        return vis

    def doc_to_target(self, doc: dict) -> Any:
        tgt = self.config["doc_to_target"]
        if isinstance(tgt, str) and "{" in tgt:
            return _FMT.vformat(tgt, (), doc)
        return doc.get(tgt, tgt)

    # ---- instances ----
    def build_instances(self, limit: Optional[int] = None) -> List[Instance]:
        gen_kwargs = self.config.get("generation_kwargs",
                                     {"max_new_tokens": 16, "temperature": 0.0})
        out = []
        for i, doc in enumerate(self.docs(limit)):
            out.append(Instance(
                request_type=self.output_type,
                doc=doc,
                arguments=(self.doc_to_text(doc), dict(gen_kwargs),
                           self.doc_to_visual(doc)),
                idx=0, task_name=self.task_name, doc_id=i))
        return out

    # ---- scoring ----
    def process_results(self, doc: dict, result: str) -> Dict[str, float]:
        target = self.doc_to_target(doc)
        scores = {}
        for m in self.config.get("metric_list", [{"metric": "exact_match"}]):
            name = m["metric"]
            fn = METRICS[name]
            scores[name] = fn(target, result)
        return scores

    def aggregate(self, per_doc: List[Dict[str, float]]) -> Dict[str, Any]:
        out = {}
        for m in self.config.get("metric_list", [{"metric": "exact_match"}]):
            name = m["metric"]
            agg = AGGREGATIONS[m.get("aggregation", "mean")]
            values = [d[name] for d in per_doc]
            out[name] = agg(values)
            out[f"{name}_stderr"] = bootstrap_stderr(values)
        return out
