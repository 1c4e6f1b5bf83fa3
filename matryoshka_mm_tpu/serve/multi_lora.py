"""Multi-LoRA serving: many adapters on one shared base model.

Beyond-reference capability (the S-LoRA pattern): the batched decode pool
serves requests for *different* fine-tunes simultaneously.  Adapters
(ops/lora.py extract_lora pytrees, all with the same rank and target set)
are stacked into one array pack with a leading adapter axis; slot 0 is an
all-zero adapter meaning "base model".  Each pool row carries an adapter
index, and the decode layer applies the per-row low-rank delta

    y = proj(x, W)  +  (x · A[idx]ᵀ · B[idx]ᵀ) * scale[idx]

with two skinny einsums — O(B * D * r) extra work per projection, shared
across rows regardless of how many distinct adapters are live.  A/B use
peft-native orientations: A (r, in), B (out, r) (ops/lora.py).

Prefill attaches the requested adapter onto the base tree with
ops.lora.load_lora (same pytree structure for every adapter, so the jit
caches one program and the adapter weights ride as arguments).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

PROJS = (("self_attn", "q_proj"), ("self_attn", "k_proj"),
         ("self_attn", "v_proj"), ("self_attn", "o_proj"),
         ("mlp", "gate_proj"), ("mlp", "up_proj"), ("mlp", "down_proj"))


class AdapterPack(NamedTuple):
    """Stacked decoder adapters.  Leaves: {(mod, proj): (A, B, s)} with
    A (n_adapters, n_layers, r, D_in), B (n_adapters, n_layers, D_out, r),
    s (n_adapters, n_layers, 1, 1).  Adapter 0 is all zeros (base)."""
    a: dict
    b: dict
    s: dict


def pack_adapters(adapters: Dict[str, dict]) -> Tuple[Optional[AdapterPack],
                                                      Dict[str, int]]:
    """Stack named adapter pytrees (``extract_lora`` output, either the
    full tree with a "llama" key or the llama subtree) into an
    :class:`AdapterPack`.  Returns (pack, name->index); index 0 = base."""
    if not adapters:
        return None, {}
    name_to_idx = {None: 0}
    trees = []
    for i, (name, tree) in enumerate(sorted(adapters.items())):
        name_to_idx[name] = i + 1
        trees.append(tree.get("llama", tree))

    a, b, s = {}, {}, {}
    for mod, proj in PROJS:
        leaves = [t["layers"][mod][proj] for t in trees]
        ranks = {l["lora_a"].shape[-2] for l in leaves}
        if len(ranks) != 1:
            raise ValueError(f"adapters disagree on rank for {mod}/{proj}: "
                             f"{sorted(ranks)}")
        A = jnp.stack([jnp.asarray(l["lora_a"]) for l in leaves])
        B = jnp.stack([jnp.asarray(l["lora_b"]) for l in leaves])
        S = jnp.stack([jnp.asarray(l["lora_scale"]) for l in leaves])
        zero = lambda x: jnp.zeros_like(x[:1])
        a[(mod, proj)] = jnp.concatenate([zero(A), A])
        b[(mod, proj)] = jnp.concatenate([zero(B), B])
        s[(mod, proj)] = jnp.concatenate([zero(S), S])
    return AdapterPack(a, b, s), name_to_idx


def pack_layer_slices(pack: AdapterPack):
    """Re-axis the pack for a layers-scan: each leaf becomes
    (n_layers, n_adapters, ...) so ``lax.scan`` slices per layer."""
    sw = lambda t: jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), t)
    return AdapterPack(sw(pack.a), sw(pack.b), sw(pack.s))


def lora_delta(x: jnp.ndarray, layer_a, layer_b, layer_s, lora_idx):
    """Per-row low-rank delta for one projection inside the layer scan.

    x: (B, S, D_in); layer_a: (n_adapters, r, D_in); layer_b:
    (n_adapters, D_out, r); layer_s: (n_adapters, 1, 1); lora_idx: (B,).
    Returns (B, S, D_out)."""
    A = layer_a[lora_idx]                       # (B, r, D_in)
    Bm = layer_b[lora_idx]                      # (B, D_out, r)
    t = jnp.einsum("bsd,brd->bsr", x, A.astype(x.dtype))
    return (jnp.einsum("bsr,bor->bso", t, Bm.astype(x.dtype))
            * layer_s[lora_idx].astype(x.dtype))   # (B,1,1) broadcasts
