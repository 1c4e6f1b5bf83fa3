"""Optimizer construction: AdamW with per-module learning rates, weight-decay
masking and freeze groups.

TPU-native equivalent of ``LLaVATrainer.create_optimizer``'s parameter
groups (reference: llava/train/llava_trainer.py:302-391): the reference
builds torch param groups keyed by substring match on parameter names
(mm_projector_lr / mm_vision_tower_lr / router_lr; no decay on biases and
norms); here the same partitioning is an ``optax.multi_transform`` over a
label pytree derived from parameter paths.  Freeze configurations
(freeze_backbone / tune_mm_mlp_adapter / tune_router / unfreeze vision
tower, reference: llava/train/train.py:898-1031) map to ``set_to_zero``
groups.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    lr_schedule: str = "cosine"          # 'cosine' | 'linear' | 'constant'
    max_grad_norm: float = 1.0
    mm_projector_lr: Optional[float] = None
    mm_vision_tower_lr: Optional[float] = None
    router_lr: Optional[float] = None
    # freeze switches (reference: train.py:898,980-1031)
    freeze_backbone: bool = False
    tune_mm_mlp_adapter: bool = False
    freeze_mm_mlp_adapter: bool = False
    unfreeze_mm_vision_tower: bool = False
    tune_router: bool = False
    # LoRA (reference: train.py:117-123 lora_enable/lora_r/..): adapters
    # train at the backbone lr; base weights freeze; projector/router keep
    # their usual groups (the reference's modules_to_save)
    lora_enable: bool = False


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _module_of(path: str) -> str:
    if path.startswith("vision_tower"):
        return "vision_tower"
    if path.startswith("mm_projector"):
        return "mm_projector"
    if path.startswith("router"):
        return "router"
    return "backbone"


def _is_no_decay(path: str) -> bool:
    """No weight decay on biases and norm weights (llava_trainer.py:315-316)."""
    tail = path.rsplit("/", 1)[-1]
    return (
        "bias" in tail
        or "layernorm" in path.lower()
        or tail in ("norm", "input_layernorm", "post_attention_layernorm",
                    "class_embedding", "image_newline")
        or "norm" in tail
    )


def trainable_labels(params, cfg: OptimizerConfig):
    """Label pytree: 'frozen' or the module group name."""

    def label(path, leaf):
        p = _path_str(path)
        mod = _module_of(p)
        if cfg.lora_enable:
            tail = p.rsplit("/", 1)[-1]
            if tail in ("lora_a", "lora_b"):
                return "backbone"
            if mod == "mm_projector" and not cfg.freeze_mm_mlp_adapter:
                return "mm_projector"
            if mod == "router":
                return "router"
            return "frozen"
        if cfg.tune_router:
            # router-only training (train.py:1021-1024)
            return "router" if mod == "router" else "frozen"
        if cfg.tune_mm_mlp_adapter:
            return "mm_projector" if mod == "mm_projector" else "frozen"
        if mod == "vision_tower" and not cfg.unfreeze_mm_vision_tower:
            return "frozen"  # CLIP frozen by default (clip_encoder.py:32)
        if mod == "mm_projector" and cfg.freeze_mm_mlp_adapter:
            return "frozen"
        if mod == "backbone" and cfg.freeze_backbone:
            return "frozen"
        return mod

    return jax.tree_util.tree_map_with_path(label, params)


def _schedule(cfg: OptimizerConfig, lr: float):
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 0)
    if cfg.lr_schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup])
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, 0.0, max(cfg.total_steps - warmup, 1))],
            [warmup])
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(cfg.total_steps, warmup + 1))


def build_optimizer(params, cfg: OptimizerConfig) -> optax.GradientTransformation:
    def adamw(lr):
        def decay_mask(ps):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not _is_no_decay(_path_str(path)), ps)

        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                _schedule(cfg, lr), b1=cfg.adam_b1, b2=cfg.adam_b2,
                eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
                mask=decay_mask),
        )

    transforms = {
        "backbone": adamw(cfg.learning_rate),
        "mm_projector": adamw(cfg.mm_projector_lr or cfg.learning_rate),
        "vision_tower": adamw(cfg.mm_vision_tower_lr or cfg.learning_rate),
        "router": adamw(cfg.router_lr or cfg.learning_rate),
        "frozen": optax.set_to_zero(),
    }
    labels = trainable_labels(params, cfg)
    return optax.multi_transform(transforms, labels)
