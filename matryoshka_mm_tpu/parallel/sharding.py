"""Parameter and batch sharding rules.

FSDP+TP partition specs derived from parameter paths — the idiomatic
replacement for the reference's DeepSpeed ZeRO-3 runtime (reference:
scripts/zero3.json, llava/train/train.py:147-158 gather hooks): instead of
gather/partition hooks, every parameter carries a NamedSharding and XLA
inserts the all-gathers/reduce-scatters.

Rules (megatron-style TP on the ``model`` axis, residual dims sharded on
``data`` for ZeRO-3-like memory scaling):

* attention q/k/v: head dim on ``model``, residual dim on ``data``
* attention o:     head dim on ``model``, residual dim on ``data``
* MLP gate/up:     ffn dim on ``model``; down: ffn dim on ``model``
* embed/lm_head:   vocab dim on ``model``, hidden on ``data``
* norms/biases/small leaves: replicated

Orientation: llama dense kernels are raw arrays stored ``(out, in)``
(models/llama.py); flax-style ``{kernel, bias}`` dense leaves (CLIP tower,
projector, router) store kernels ``(in, out)``.  The rule table carries
one entry per orientation — ``.../kernel`` paths are the flax ones.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


# (substring, ndim) -> PartitionSpec for the *trailing* dims; a leading
# layer-stack axis (from lax.scan stacking) is never sharded.
_RULES = [
    # flax {kernel,bias} leaves, (in, out) kernels — CLIP tower etc.
    ("self_attn/q_proj/kernel", P("data", "model")),
    ("self_attn/k_proj/kernel", P("data", "model")),
    ("self_attn/v_proj/kernel", P("data", "model")),
    ("self_attn/out_proj/kernel", P("data", "model")),
    ("mlp/fc1/kernel", P("data", "model")),
    ("mlp/fc2/kernel", P("model", "data")),
    # llama raw-array kernels, (out, in): head/ffn dim is the OUT axis for
    # q/k/v/gate/up and the IN axis for o/down
    ("self_attn/q_proj", P("model", "data")),
    ("self_attn/k_proj", P("model", "data")),
    ("self_attn/v_proj", P("model", "data")),
    ("self_attn/o_proj", P("data", "model")),
    ("mlp/gate_proj", P("model", "data")),
    ("mlp/up_proj", P("model", "data")),
    ("mlp/down_proj", P("data", "model")),
    ("embed_tokens", P("model", "data")),
    ("lm_head", P("model", "data")),
    ("patch_embedding", P(None, "model")),
    ("position_embedding", P(None, None)),
]


def spec_for_path(path: str, leaf) -> P:
    ndim = np.ndim(leaf)
    for needle, spec in _RULES:
        if needle in path:
            n_spec = len(spec)
            if ndim == n_spec:
                return spec
            if ndim == n_spec + 1:
                # stacked-over-layers leaf: leading layer axis replicated
                return P(None, *spec)
            if ndim < n_spec:  # bias etc.
                return P(*spec[-ndim:]) if ndim else P()
    if ndim >= 2:
        # default: shard the largest dim on data for memory scaling
        return P(*([None] * (ndim - 2) + ["data", None]))
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    """Pytree of NamedShardings matching ``params``.

    Dims whose size does not divide the mesh axis fall back to replicated
    (XLA requires even sharding for named axes).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def fix(spec: P, leaf) -> P:
        shape = np.shape(leaf)
        out = []
        for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
            if axis is not None and dim % axis_sizes.get(axis, 1) == 0 and dim > 0:
                out.append(axis)
            else:
                out.append(None)
        return P(*out)

    def shard(path, leaf):
        spec = fix(spec_for_path(_path_str(path), leaf), leaf)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard, params)


def shard_params(mesh: Mesh, params):
    """Place a parameter pytree onto the mesh with the partition rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim over ``data``, rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
