"""Training orchestrator: ``train()``.

Port of the reference entry point (reference: llava/train/train.py:823-1084):
HfArgumentParser over Model/Data/Training dataclasses, named ModelConfig
preset merged with CLI overrides (train.py:837-842), args.json snapshot
(:845-856), model construction and freeze/unfreeze wiring, the data module,
auto-resume from ``checkpoint-*`` (:1059-1062), and the save shapes (full /
projector-only).

Distribution is pjit over a (data, model) mesh instead of the DeepSpeed
launcher; gradient accumulation uses optax.MultiSteps.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .. import conversation as conversation_lib
from ..config import ModelConfig
from ..models.clip import ClipVisionConfig
from ..models.llama import LlamaConfig
from ..models.llava import LlavaConfig, M3Preset, init_llava_params
from ..utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_meta,
    save_checkpoint,
    save_projector_only,
)
from .data import DataArguments as _DataArgs
from .data import make_supervised_data_module
from .optimizer import OptimizerConfig
from .sampler import LengthGroupedSampler
from .train_step import M3Batch
from .trainer import TrainState, create_train_state, host_metrics, make_train_step


@dataclass
class ModelArguments:
    """reference: train.py:64-88."""

    model_name_or_path: Optional[str] = field(default="debug://tiny")
    version: Optional[str] = field(default="v1")
    freeze_backbone: bool = field(default=False)
    tune_mm_mlp_adapter: bool = field(default=False)
    vision_tower: Optional[str] = field(default="openai/clip-vit-large-patch14-336")
    mm_vision_select_layer: Optional[int] = field(default=-2)
    pretrain_mm_mlp_adapter: Optional[str] = field(default=None)
    mm_projector_type: Optional[str] = field(default="mlp2x_gelu")
    mm_use_im_start_end: bool = field(default=False)
    mm_use_im_patch_token: bool = field(default=False)
    mm_patch_merge_type: Optional[str] = field(default="flat")
    mm_vision_select_feature: Optional[str] = field(default="patch")
    unfreeze_mm_vision_tower: bool = field(default=False)
    tune_router: bool = field(default=False)
    model_use: Optional[str] = field(default=None)
    projector_loc: Optional[str] = field(default=None)
    use_alternative: Optional[bool] = field(default=None)
    matryoshka_vis_token_scale: Optional[str] = field(default=None)
    moe: Optional[str] = field(default=None)
    lm_loss_type: Optional[str] = field(default=None)


@dataclass
class DataArguments(_DataArgs):
    pass


@dataclass
class TrainingArguments:
    """The subset of HF TrainingArguments the reference actually drives
    (reference: train.py:104-144, scripts/v1_5/finetune.sh)."""

    output_dir: str = "./output"
    num_train_epochs: float = 1.0
    max_steps: int = -1
    per_device_train_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"
    logging_steps: int = 1
    save_steps: int = 500
    save_total_limit: int = 2
    model_max_length: int = 2048
    bf16: bool = True
    seed: int = 42
    freeze_mm_mlp_adapter: bool = False
    mm_projector_lr: Optional[float] = None
    mm_vision_tower_lr: Optional[float] = None
    router_lr: Optional[float] = None
    group_by_length: bool = False
    group_by_modality_length: bool = False
    group_by_modality_length_auto: bool = False
    group_by_varlen: bool = False
    dp_size: Optional[int] = None
    tp_size: int = 1
    report_to: str = "jsonl"
    # LoRA / quantized base (reference: train.py:117-123 lora_* and bits;
    # scripts use r=128 alpha=256)
    bits: int = 16                  # 8/4 quantize the LM base (QLoRA w/ lora)
    lora_enable: bool = False
    lora_r: int = 64
    lora_alpha: int = 16
    lora_dropout: float = 0.05      # accepted for CLI parity; merged-form
    lora_bias: str = "none"         # adapters don't implement input dropout


def build_llava_config(model_args: ModelArguments,
                       training_args: TrainingArguments,
                       data_args: DataArguments,
                       tiny: bool = False) -> LlavaConfig:
    """Merge the named preset with CLI overrides
    (reference: train.py:837-842, config/__init__.py:8-25)."""
    if model_args.model_use:
        preset_dict = dict(ModelConfig[model_args.model_use])
    else:
        preset_dict = {"use_alternative": True, "projection_type": "v4",
                       "matryoshka_vis_token_scale": None, "moe": None,
                       "projector_loc": "after_vision_tower",
                       "lm_loss_type": "micro"}
    for k in ("projector_loc", "use_alternative", "matryoshka_vis_token_scale",
              "moe", "lm_loss_type"):
        v = getattr(model_args, k)
        if v is not None:
            preset_dict[k] = v
    preset = M3Preset.from_dict(preset_dict)

    if tiny or model_args.model_name_or_path.startswith("debug://"):
        llama = LlamaConfig.tiny_debug(remat=True)
        vision = ClipVisionConfig.tiny_debug(
            select_layer=model_args.mm_vision_select_layer)
    else:
        llama = dataclasses.replace(LlamaConfig.vicuna_7b(), remat=True)
        vision = ClipVisionConfig.vit_l_14_336(
            select_layer=model_args.mm_vision_select_layer,
            select_feature=model_args.mm_vision_select_feature,
            dtype="bfloat16" if training_args.bf16 else "float32")

    return LlavaConfig(
        llama=llama,
        vision=vision,
        preset=preset,
        mm_projector_type=model_args.mm_projector_type,
        mm_patch_merge_type=model_args.mm_patch_merge_type,
        image_aspect_ratio=data_args.image_aspect_ratio,
        tokenizer_model_max_length=training_args.model_max_length,
        router_feature_types=_router_features(preset),
    )


def _router_features(preset: M3Preset):
    from ..kvconfig import parse_kv_from_string

    if preset.moe is None:
        return ()
    kvs = parse_kv_from_string(preset.moe)
    ft = kvs.get("ft")
    return tuple(str(ft).split(",")) if ft else ()


def _batches(dataset, collator, sampler_indices, batch_size):
    batch = []
    for idx in sampler_indices:
        batch.append(dataset[idx])
        if len(batch) == batch_size:
            yield collator(batch)
            batch = []
    if batch:
        yield collator(batch)


def train(attn_implementation: str = "flash"):
    import jax
    import transformers as hf

    from ..parallel import initialize_distributed

    initialize_distributed()   # must precede any backend use; single-host no-op

    parser = hf.HfArgumentParser((ModelArguments, DataArguments, TrainingArguments))
    model_args, data_args, training_args = parser.parse_args_into_dataclasses()

    np.random.seed(training_args.seed)

    # ---- conversation template (reference: train.py:906-918) ----
    if model_args.version in conversation_lib.conv_templates:
        conversation_lib.default_conversation = \
            conversation_lib.conv_templates[model_args.version]
    else:
        conversation_lib.default_conversation = \
            conversation_lib.conv_templates["vicuna_v1"]

    # ---- config + params ----
    cfg = build_llava_config(model_args, training_args, data_args)
    os.makedirs(training_args.output_dir, exist_ok=True)
    with open(os.path.join(training_args.output_dir, "args.json"), "w") as f:
        json.dump({
            "model_args": dataclasses.asdict(model_args),
            "data_args": {k: v for k, v in dataclasses.asdict(data_args).items()
                          if k != "image_processor"},
            "training_args": dataclasses.asdict(training_args),
        }, f, indent=2)

    from ..models.builder import DebugTokenizer, _load_tokenizer

    tokenizer = _load_tokenizer(model_args.model_name_or_path, None)
    tokenizer.model_max_length = training_args.model_max_length

    if model_args.model_name_or_path.startswith("debug://"):
        params = init_llava_params(jax.random.PRNGKey(training_args.seed), cfg)
    else:
        from ..models.builder import load_pretrained_model

        _, model, _, _ = load_pretrained_model(
            model_args.model_name_or_path, None, None)
        params, cfg = model.params, model.cfg

    if training_args.bits in (4, 8):
        # quantize the LM base before (optionally) adding adapters — the
        # QLoRA recipe (reference: train.py:859-876 bnb 4/8-bit loading)
        from ..ops.quant import (quantize_llama_params_inplace,
                                 quantize_llama_params_int4)

        if training_args.bits == 8:
            params["llama"] = quantize_llama_params_inplace(params["llama"],
                                                            fuse=False)
        else:
            # fuse=False keeps the HF-keyed unpadded layout LoRA wrapping
            # needs (adapter shapes derive from leaf shapes)
            params["llama"] = quantize_llama_params_int4(params["llama"],
                                                         inplace=True,
                                                         fuse=False)
        if not (training_args.lora_enable or model_args.tune_mm_mlp_adapter
                or model_args.tune_router):
            raise ValueError("--bits 4/8 freezes the LM base; combine with "
                             "--lora_enable (QLoRA) or an adapter-only mode")

    if training_args.lora_enable:
        # wrap the LM's linear projections with low-rank adapters
        # (reference: train.py:923-943 get_peft_model)
        from ..ops.lora import add_lora

        params = add_lora(params, jax.random.PRNGKey(training_args.seed + 1),
                          r=training_args.lora_r,
                          alpha=float(training_args.lora_alpha))

    # ---- data ----
    from ..image_processing import ClipImageProcessor

    s = cfg.vision.image_size
    data_args.image_processor = ClipImageProcessor(
        size={"shortest_edge": s}, crop_size={"height": s, "width": s})
    data_args.is_multimodal = True
    data_args.mm_use_im_start_end = model_args.mm_use_im_start_end
    module = make_supervised_data_module(tokenizer, data_args)
    dataset, collator = module["train_dataset"], module["data_collator"]

    # ---- mesh + sharding ----
    from ..parallel import make_mesh, put_batch, shard_params

    n_dev = len(jax.devices())
    tp = training_args.tp_size
    mesh = make_mesh((n_dev // tp, tp))

    # ---- optimizer / state ----
    steps_per_epoch = max(len(dataset) // (
        training_args.per_device_train_batch_size * max(n_dev // tp, 1)), 1)
    total_steps = (training_args.max_steps if training_args.max_steps > 0
                   else int(steps_per_epoch * training_args.num_train_epochs))
    opt_cfg = OptimizerConfig(
        learning_rate=training_args.learning_rate,
        weight_decay=training_args.weight_decay,
        warmup_ratio=training_args.warmup_ratio,
        total_steps=total_steps,
        lr_schedule={"cosine": "cosine", "linear": "linear"}.get(
            training_args.lr_scheduler_type, "constant"),
        mm_projector_lr=training_args.mm_projector_lr,
        mm_vision_tower_lr=training_args.mm_vision_tower_lr,
        router_lr=training_args.router_lr,
        freeze_backbone=model_args.freeze_backbone,
        tune_mm_mlp_adapter=model_args.tune_mm_mlp_adapter,
        freeze_mm_mlp_adapter=training_args.freeze_mm_mlp_adapter,
        unfreeze_mm_vision_tower=model_args.unfreeze_mm_vision_tower,
        tune_router=model_args.tune_router,
        lora_enable=training_args.lora_enable,
    )

    with mesh:
        params = shard_params(mesh, params)
        state, tx = create_train_state(params, opt_cfg)

        # auto-resume (reference: train.py:1059-1062)
        start_step = 0
        resume = latest_checkpoint(training_args.output_dir)
        if resume:
            print(f"Resuming from {resume}")
            restored, _ = load_checkpoint(os.path.join(resume))
            if training_args.lora_enable and "lora" in restored:
                # adapter-subset checkpoint: re-attach onto the base tree
                from ..ops.lora import load_lora, strip_lora

                merged = load_lora(strip_lora(state.params), restored["lora"])
                for key in ("mm_projector", "router", "image_newline"):
                    if key in restored:
                        merged[key] = restored[key]
                restored = merged
            state = state._replace(params=shard_params(mesh, restored))
            start_step = load_meta(resume).get("step", 0)
            state = state._replace(
                step=state.step + start_step)

        if training_args.gradient_accumulation_steps > 1:
            import optax

            tx = optax.MultiSteps(
                tx, training_args.gradient_accumulation_steps)
            state = state._replace(opt_state=tx.init(state.params))
        # frozen CLIP (every recipe except unfreeze_mm_vision_tower):
        # skip its backward entirely instead of zeroing its grads
        step_fn = make_train_step(
            cfg, tx, donate=True,
            frozen_vision=not model_args.unfreeze_mm_vision_tower)

        # ---- sampler ----
        micro_bsz = training_args.per_device_train_batch_size * max(n_dev // tp, 1)
        if training_args.group_by_modality_length or \
                training_args.group_by_modality_length_auto:
            sampler = LengthGroupedSampler(
                training_args.per_device_train_batch_size,
                max(n_dev // tp, 1) * training_args.gradient_accumulation_steps,
                lengths=dataset.modality_lengths, group_by_modality=True,
                generator=np.random.default_rng(training_args.seed))
        elif training_args.group_by_length:
            sampler = LengthGroupedSampler(
                training_args.per_device_train_batch_size,
                max(n_dev // tp, 1) * training_args.gradient_accumulation_steps,
                lengths=dataset.lengths,
                generator=np.random.default_rng(training_args.seed))
        else:
            sampler = None

        # frozen BERT prompt embedder for the router's textcls feature
        # (reference: llava_arch.py:250-259)
        text_embedder = None
        if "textcls" in cfg.router_feature_types:
            from ..models.text_embedder import BertConfig, TextEmbedder

            bert_cfg = (BertConfig.tiny_debug()
                        if model_args.model_name_or_path.startswith("debug://")
                        else BertConfig.bge_small())
            text_embedder = TextEmbedder(tokenizer, cfg=bert_cfg)

        metrics_path = os.path.join(training_args.output_dir, "metrics.jsonl")
        metrics_file = open(metrics_path, "a")
        global_step = start_step
        t_start = time.time()

        epochs = int(np.ceil(training_args.num_train_epochs))
        done = False
        n_proc, proc_id = jax.process_count(), jax.process_index()
        if n_proc > 1:
            micro_bsz = max(micro_bsz // n_proc, 1)   # per-host rows
        for epoch in range(epochs):
            indices = (list(iter(sampler)) if sampler is not None
                       else np.random.default_rng(
                           training_args.seed + epoch).permutation(
                           len(dataset)).tolist())
            if n_proc > 1:   # each host loads its interleaved shard
                indices = indices[proc_id::n_proc]
            for raw in _batches(dataset, collator, indices, micro_bsz):
                if len(raw["input_ids"]) < micro_bsz:
                    continue  # drop ragged tail (static shapes)
                text_embed = None
                if text_embedder is not None:
                    text_embed = put_batch(
                        mesh, np.asarray(text_embedder(raw["input_ids"])))
                batch = M3Batch(
                    input_ids=put_batch(mesh, raw["input_ids"]),
                    pixel_values=put_batch(mesh, raw["images"]),
                    labels=put_batch(mesh, raw["labels"]),
                    attn_mask=put_batch(mesh, raw["attention_mask"]),
                    text_embed=text_embed,
                )
                state, metrics = step_fn(state, batch)
                global_step += 1

                if global_step % training_args.logging_steps == 0:
                    m = host_metrics(metrics)
                    m.update(step=global_step,
                             time=round(time.time() - t_start, 1))
                    metrics_file.write(json.dumps(m) + "\n")
                    metrics_file.flush()
                    print(f"step {global_step}: loss={m['loss']:.4f}")

                if global_step % training_args.save_steps == 0:
                    _save(training_args, model_args, state, cfg, global_step)
                if global_step >= total_steps:
                    done = True
                    break
            if done:
                break

        # final save (reference: train.py:1064-1084)
        _save(training_args, model_args, state, cfg, global_step, final=True)
        metrics_file.close()
    return state


def _save(training_args, model_args, state: TrainState, cfg, step: int,
          final: bool = False):
    out = training_args.output_dir if final else os.path.join(
        training_args.output_dir, f"checkpoint-{step}")
    params = state.params
    if getattr(training_args, "lora_enable", False):
        # adapters + non-lora trainables (reference: train.py:1066-1080)
        from ..utils.checkpoint import save_lora_checkpoint

        save_lora_checkpoint(out, params, cfg, step=step)
    elif model_args.tune_mm_mlp_adapter:
        # adapter-only save (reference: llava_trainer.py:393-412)
        save_projector_only(out, params, cfg, step=step)
    else:
        save_checkpoint(out, params, cfg, step=step,
                        extra={"argmaxcost_ema": float(state.argmaxcost_ema)})
    # prune old checkpoints
    if not final and training_args.save_total_limit:
        cands = sorted(
            (d for d in os.listdir(training_args.output_dir)
             if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[-1]))
        for stale in cands[: -training_args.save_total_limit]:
            import shutil

            shutil.rmtree(os.path.join(training_args.output_dir, stale),
                          ignore_errors=True)


if __name__ == "__main__":
    train()
