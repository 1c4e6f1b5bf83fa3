"""Tensor-parallel inference placement — the reference's ``device_map=auto``.

The reference splits a model too big for one GPU across devices with HF
accelerate's ``device_map=auto`` (reference: llava/model/builder.py:45-49,
README.md:184-190 — "multi-GPU inference for VRAM <= 24GB").  The
TPU-native equivalent is GSPMD: place every weight leaf with a
megatron-style TP ``NamedSharding`` over a ``(1, tp)`` mesh and run the
SAME jitted prefill/decode functions — XLA partitions the matmuls across
the ``model`` axis and inserts the ICI collectives (all-reduce after
o_proj/down_proj, all-gather for the sharded-vocab logits).  No model
code changes: sharding propagates from the committed param placements.

The partition rules live in :mod:`.sharding`; on a mesh whose ``data``
axis has size 1 they collapse to pure TP (heads/ffn/vocab on ``model``,
residual dims replicated), so a 13B llama fits chips it could never fit
alone — the TPU answer to the reference's 24GB-GPU splitting story.

Contract:
- bf16/f32 params.  The fused int4/int8 decode kernels are single-chip
  Pallas programs; to combine TP with quantized weights load with
  ``quant_fuse=False`` — the dequantize+dot XLA fallback partitions fine.
- XLA attention (``attn_impl='reference'`` is set on the returned
  config): the Pallas flash/paged kernels are not GSPMD-partitionable.
- ``tp`` must divide the head counts (incl. KV heads for GQA) and the
  ffn dim; uneven dims fall back to replicated per ``param_shardings``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

from .mesh import make_mesh
from .sharding import shard_params


def make_tp_mesh(tp_size: Optional[int] = None, devices=None) -> Mesh:
    """A ``(data=1, model=tp)`` mesh over ``tp_size`` devices (default:
    every visible device, mirroring ``device_map='auto'``)."""
    devices = list(devices if devices is not None else jax.devices())
    tp = tp_size or len(devices)
    return make_mesh((1, tp), devices=devices[:tp])


def shard_model_for_inference(params, cfg, tp_size: Optional[int] = None,
                              mesh: Optional[Mesh] = None) -> Tuple[dict, object, Mesh]:
    """Place ``params`` TP-sharded for inference; returns
    ``(params, cfg, mesh)`` with ``cfg.llama.attn_impl`` pinned to the
    partitionable XLA attention path.

    The returned pytree drops into every existing entry point unchanged
    (``generate``, ``beam_generate``, eval drivers, the solo serving
    path): jit propagates the committed shardings through prefill, the
    KV cache (head-dim sharded, following q/k/v), and the decode scan.
    """
    mesh = mesh or make_tp_mesh(tp_size)
    if mesh.devices.shape[0] != 1:
        raise ValueError(
            f"inference mesh must be (1, tp), got {mesh.devices.shape}; "
            "batch data-parallel eval shards by process instead "
            "(eval/model_vqa_loader.py chunking)")
    params = shard_params(mesh, params)
    if getattr(cfg, "llama", None) is not None \
            and cfg.llama.attn_impl != "reference":
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama,
                                           attn_impl="reference"))
    return params, cfg, mesh
