"""Trainer: sharded train state + jitted update step.

The TPU-native replacement for ``LLaVATrainer`` + DeepSpeed
(reference: llava/train/llava_trainer.py:254-810, scripts/zero3.json):

* ``TrainState`` = params + optax state + step + argmaxcost EMA buffer;
* ``make_train_step`` returns one jitted function computing the full M3
  objective, gradients, and the optimizer update.  Parameters placed with
  ``parallel.shard_params`` keep their FSDP/TP NamedShardings through the
  step (ZeRO-equivalent without gather hooks — XLA inserts the
  all-gather/reduce-scatter collectives);
* metrics come back as a device dict per step (the reference's wandb
  logging surface, llava_trainer.py:457-499).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.llava import LlavaConfig
from ..ops.quant import disable_fused_proj
from .optimizer import OptimizerConfig, build_optimizer
from .train_step import M3Batch, m3_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # argmaxcost EMA buffer (reference: llava_arch.py:42-53); negative value
    # means "uninitialized" (first update adopts the batch statistic).
    argmaxcost_ema: jnp.ndarray


def create_train_state(params, opt_cfg: OptimizerConfig
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = build_optimizer(params, opt_cfg)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        argmaxcost_ema=jnp.full((), -1.0, jnp.float32),
    )
    return state, tx


def make_train_step(cfg: LlavaConfig, tx: optax.GradientTransformation,
                    donate: bool = True, uniform_buffer: bool = False,
                    frozen_vision: bool = False):
    """Build the jitted (state, batch) -> (state, metrics) update.

    ``uniform_buffer`` pads every scale to one shared buffer length
    instead of capacity buckets — trades padding FLOPs for a
    fragmentation-free memory footprint (see m3_loss; at small T the
    bucketed variant's heterogeneous temps OOM the allocator at batch
    sizes the uniform buffer fits easily).

    ``frozen_vision`` skips the vision-tower backward entirely
    (stop_gradient on its outputs) — set it when the CLIP tower sits in
    the optimizer's frozen group (every reference recipe except
    unfreeze_mm_vision_tower); see m3_loss."""

    def step_fn(state: TrainState, batch: M3Batch):
        def loss_fn(params):
            return m3_loss(params, cfg, batch,
                           argmaxcost_ema=state.argmaxcost_ema,
                           uniform_buffer=uniform_buffer,
                           frozen_vision=frozen_vision)

        # fused Pallas dequant-matmuls are forward-only (no AD rule):
        # QLoRA/adapter steps over quantized bases must trace the
        # differentiable dequantize+dot path instead
        # allow_int: QLoRA bases are int8/int4 leaves; they get float0
        # tangents which are zeroed below (they sit in the frozen group)
        with disable_fused_proj():
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True)(state.params)
        # integer leaves (int8/int4 QLoRA bases) get float0 tangents, which
        # optax arithmetic can't consume — replace with typed zeros (they sit
        # in the 'frozen' group, so the zeros are never applied anyway)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p)
            if getattr(g, "dtype", None) == jax.dtypes.float0 else g,
            grads, state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = metrics.pop("_state/argmaxcost_ema", state.argmaxcost_ema)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, new_params, new_opt_state,
                               jnp.asarray(new_ema, jnp.float32))
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def host_metrics(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    return {k: float(v) for k, v in metrics.items()}
