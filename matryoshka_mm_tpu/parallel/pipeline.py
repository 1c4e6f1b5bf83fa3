"""Pipeline parallelism for the decoder stack.

The reference has no pipeline parallelism (SURVEY.md P5 — its closest
feature is HF ``device_map=auto`` layer placement for inference).  This
module adds a TPU-native GPipe-style pipeline as a capability beyond the
reference, for 13B+ models that don't fit a single chip's HBM even sharded:

* the mesh gains a ``stage`` axis; the stacked decoder layers are sharded
  over it (each stage holds ``n_layers/S`` consecutive layers);
* under ``shard_map``, microbatches flow through the stages with
  ``lax.ppermute`` ring transfers over ICI; every stage runs the same
  jaxpr (its local ``lax.scan`` over its layer slice), so the program is
  SPMD and XLA overlaps the permute with the next microbatch's compute;
* embeddings, final norm and the LM head stay outside the pipelined
  region (they are cheap and data-parallel);
* fully differentiable — ``ppermute`` transposes to the reverse permute,
  so the same code path trains.

Bubble fraction is the usual (S-1)/(M+S-1); pick ``n_microbatches >= 4*S``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import LlamaConfig, _layer_forward, rms_norm, rope_cos_sin


def _run_local_layers(layers_local, hidden, *, cfg: LlamaConfig, cos, sin,
                      positions, valid):
    """lax.scan over this stage's layer slice (no cache: training/prefill)."""

    def body(h, layer_params):
        h, _ = _layer_forward(
            layer_params, h, cfg=cfg, cos=cos, sin=sin,
            q_positions=positions, kv_valid=valid, kv_positions=None,
            cache_k=None, cache_v=None, write_idx=None)
        return h, None

    if cfg.remat:
        body = jax.checkpoint(body)
    hidden, _ = jax.lax.scan(body, hidden, layers_local)
    return hidden


def pipelined_decoder(params: dict, cfg: LlamaConfig, embeds: jnp.ndarray,
                      position_ids: jnp.ndarray, attn_valid: jnp.ndarray,
                      mesh: Mesh, n_microbatches: int,
                      stage_axis: str = "stage") -> jnp.ndarray:
    """Run the decoder layers as an S-stage pipeline.

    embeds: (B, L, D); B must divide n_microbatches; layers must divide S.
    Returns final hidden states after the last decoder layer + final norm.
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[stage_axis]
    n_layers = cfg.num_hidden_layers
    assert n_layers % S == 0, (n_layers, S)
    B, L, D = embeds.shape
    M = n_microbatches
    assert B % M == 0, (B, M)
    mb = B // M

    emb_mb = embeds.reshape(M, mb, L, D)
    pos_mb = position_ids.reshape(M, mb, L)
    val_mb = attn_valid.reshape(M, mb, L)

    def stage_fn(layers_local, emb_mb, pos_mb, val_mb):
        s = jax.lax.axis_index(stage_axis)
        last = S - 1

        def step(carry, t):
            buf, outputs = carry
            # stage s processes microbatch (t - s) at step t
            mb_idx = jnp.clip(t - s, 0, M - 1)
            fresh = jax.lax.dynamic_index_in_dim(emb_mb, mb_idx, 0,
                                                 keepdims=False)
            x = jnp.where(s == 0, fresh, buf)
            pos = jax.lax.dynamic_index_in_dim(pos_mb, mb_idx, 0, False)
            val = jax.lax.dynamic_index_in_dim(val_mb, mb_idx, 0, False)
            cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
            active = (t - s >= 0) & (t - s < M)
            y = _run_local_layers(layers_local, x, cfg=cfg, cos=cos, sin=sin,
                                  positions=pos, valid=val)
            y = jnp.where(active, y, x)
            # ring transfer to the next stage (last stage's send is ignored)
            buf_next = jax.lax.ppermute(
                y, stage_axis, [(i, (i + 1) % S) for i in range(S)])
            out_idx = jnp.clip(t - last, 0, M - 1)
            emit = (s == last) & (t - last >= 0)
            outputs = jax.lax.cond(
                emit,
                lambda o: jax.lax.dynamic_update_index_in_dim(o, y, out_idx, 0),
                lambda o: o,
                outputs)
            return (buf_next, outputs), None

        outputs0 = jnp.zeros_like(emb_mb)
        buf0 = jnp.zeros_like(emb_mb[0])
        (_, outputs), _ = jax.lax.scan(step, (buf0, outputs0),
                                       jnp.arange(M + S - 1))
        # replicate the last stage's outputs to every stage
        outputs = jax.lax.psum(
            jnp.where(s == last, outputs, jnp.zeros_like(outputs)), stage_axis)
        return outputs

    in_specs = (P(stage_axis), P(), P(), P())
    out_spec = P()
    pp = jax.shard_map(stage_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    outputs = pp(params["layers"], emb_mb, pos_mb, val_mb)
    hidden = outputs.reshape(B, L, D)
    return rms_norm(hidden, params["norm"], cfg.rms_norm_eps)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    n_stages: int = 2
    n_microbatches: int = 4
    stage_axis: str = "stage"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_stages == 0
    dp = len(devices) // n_stages
    return Mesh(np.asarray(devices).reshape(dp, n_stages),
                axis_names=("data", "stage"))
