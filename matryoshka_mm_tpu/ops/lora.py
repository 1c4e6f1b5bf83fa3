"""LoRA adapters as weight-leaf wrappers.

TPU-native replacement for the reference's peft integration
(reference: llava/train/train.py:159-176 ``find_all_linear_names``,
train.py:923-943 ``LoraConfig``/``get_peft_model``, train.py:1066-1080
adapter/non-adapter save split).

Instead of module wrappers, a LoRA-ized weight leaf is a dict
``{"w": base (.., out, in), "lora_a": (.., r, in), "lora_b": (.., out, r),
"lora_scale": alpha/r}`` (peft-native A/B orientations).
``ops.quant.dequantize_array`` — the hook every matmul site already
routes through — resolves it to
``stop_gradient(base) + (B @ A) * scale``.  Because stacked decoder
leaves ride ``lax.scan`` as xs, the merged weight is a per-layer
transient; grads flow only to A/B; and an int8/int4 base composes for
free (QLoRA: quantize first, then :func:`add_lora`).

peft's ``lora_dropout`` (applied to the layer input) has no exact
merged-form equivalent and is not implemented; the reference default in
its LoRA scripts is 0.05 and primarily regularizes long runs.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

from .quant import QKEY, Q4KEY, is_quantized

DEFAULT_TARGET = r"(self_attn|mlp)/[a-z_]*proj$"
DEFAULT_EXCLUDE = r"vision_tower|mm_projector|router|embed|norm|lm_head"


def is_lora(leaf) -> bool:
    return isinstance(leaf, dict) and "lora_a" in leaf


def _weight_shape(leaf) -> tuple:
    """Full (.., out, in) shape of a plain / int8 / int4-packed leaf."""
    if is_quantized(leaf):
        if Q4KEY in leaf:
            s = leaf[Q4KEY].shape      # int4 packs pairs along the in dim
            return s[:-1] + (s[-1] * 2,)
        return leaf[QKEY].shape
    return leaf.shape


def wrap_leaf(rng, leaf, r: int, alpha: float, dtype=jnp.float32) -> dict:
    """Attach a rank-``r`` adapter to one weight leaf (plain or quantized).

    A ~ he_uniform, B = 0 (so the wrapped model starts exactly at the
    base model, matching peft's init)."""
    shape = _weight_shape(leaf)
    *lead, d_out, d_in = shape
    # A is (r, in): fan-in is the LAST axis (in_features), as in peft
    a = jax.nn.initializers.he_uniform(
        in_axis=-1, out_axis=-2, batch_axis=tuple(range(len(lead))))(
        rng, tuple(lead) + (r, d_in), dtype)
    b = jnp.zeros(tuple(lead) + (d_out, r), dtype)
    scale = jnp.full(tuple(lead) + (1, 1), alpha / r, dtype)
    return {"w": leaf, "lora_a": a, "lora_b": b, "lora_scale": scale}


def add_lora(params: dict, rng, r: int = 128, alpha: float = 256.0,
             target: str = DEFAULT_TARGET, exclude: str = DEFAULT_EXCLUDE,
             dtype=jnp.float32) -> dict:
    """Wrap every matching weight leaf of a (possibly quantized) param tree.

    Default target = the reference's ``find_all_linear_names``: every LM
    linear projection, excluding vision tower, projector, router,
    embeddings and lm_head (train.py:159-176)."""
    if r < 1:
        raise ValueError(f"LoRA rank must be >= 1, got r={r}")
    t_re, e_re = re.compile(target), re.compile(exclude)
    n_wrapped = 0

    def rec(tree, path=""):
        nonlocal n_wrapped
        if isinstance(tree, dict) and not is_quantized(tree):
            return {k: rec(v, f"{path}/{k}" if path else k)
                    for k, v in tree.items()}
        if t_re.search(path) and not e_re.search(path):
            n_wrapped += 1
            return wrap_leaf(jax.random.fold_in(rng, n_wrapped), tree, r,
                             alpha, dtype)
        return tree

    out = rec(params)
    if n_wrapped == 0:
        raise ValueError(f"no leaves matched target={target!r}")
    return out


def merge_lora_weights(params: dict, dtype=None) -> dict:
    """Collapse every lora wrapper into a plain merged array
    (base + A@B*scale), dequantizing quantized bases — the analog of
    peft's ``merge_and_unload`` used by the reference at load time
    (llava/model/builder.py:103-108)."""
    from .quant import dequantize_array

    def rec(tree):
        if is_lora(tree):
            merged = dequantize_array(tree, dtype or jnp.float32)
            return merged if dtype is None else merged.astype(dtype)
        if isinstance(tree, dict) and not is_quantized(tree):
            return {k: rec(v) for k, v in tree.items()}
        return tree

    return rec(params)


def strip_lora(params: dict) -> dict:
    """Drop adapters, returning the untouched base tree."""

    def rec(tree):
        if is_lora(tree):
            return tree["w"]
        if isinstance(tree, dict) and not is_quantized(tree):
            return {k: rec(v) for k, v in tree.items()}
        return tree

    return rec(params)


def extract_lora(params: dict) -> dict:
    """Adapter-only pytree (same nesting, lora leaves only) — the
    ``adapter_model`` half of the reference's LoRA save split."""

    def rec(tree):
        if is_lora(tree):
            return {k: tree[k] for k in ("lora_a", "lora_b", "lora_scale")}
        if isinstance(tree, dict) and not is_quantized(tree):
            sub = {k: rec(v) for k, v in tree.items()}
            return {k: v for k, v in sub.items() if v is not None} or None
        return None

    return rec(params) or {}


def load_lora(params: dict, adapters: dict) -> dict:
    """Attach a saved adapter pytree onto a base tree."""

    def rec(tree, ad):
        if ad is None:
            return tree
        if isinstance(ad, dict) and "lora_a" in ad:
            return {"w": tree, **ad}
        return {k: rec(v, ad.get(k)) if isinstance(ad, dict) else v
                for k, v in tree.items()}

    return rec(params, adapters)


def count_lora_params(params: dict) -> int:
    return sum(l.size for path, l in
               jax.tree_util.tree_leaves_with_path(params)
               if "lora_a" in str(path[-1]) or "lora_b" in str(path[-1]))
