"""Named model-behavior presets.

The reference auto-collects every ``model_config_*`` dict in
``llava/config/model_config.py`` into a ``ModelConfig`` registry with
``pretune_``/``finetune_`` prefixes (reference: llava/config/__init__.py:8-25).
We reproduce that registry explicitly.
"""

import copy

from .model_config import MODEL_CONFIG_DICTS

ModelConfig = {}
for _name, _cfg in MODEL_CONFIG_DICTS.items():
    for _finetune_type in ("pretune", "finetune"):
        d = copy.deepcopy(_cfg)
        d["use_alternative"] = d.get("use_alternative", True)
        ModelConfig[f"{_finetune_type}_{_name}"] = d
