"""CLIP ViT vision tower (ViT-L/14-336) in functional JAX.

TPU-native re-design of the reference's HF ``CLIPVisionModel`` wrapper
(reference: llava/model/multimodal_encoder/clip_encoder.py:7-91) plus the
forward-hook feature taps the M3 router needs (reference:
llava/model/llava_arch.py:351-405 ``encode_images_with_attn``).

Instead of torch hooks, the forward is an explicit multi-output function:
it returns the select-layer patch features plus the router inputs (cls,
cls-last, patch average, pooled output, and the last layer's raw q/k
attention maps).  Patch embedding runs as one big matmul (not a conv) so
it lands directly on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    select_layer: int = -2         # reference default mm_vision_select_layer
    select_feature: str = "patch"  # 'patch' | 'cls_patch'
    dtype: str = "float32"

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def vit_l_14_336(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny_debug(cls, **kw):
        defaults = dict(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=4, num_attention_heads=4,
                        image_size=56, patch_size=14)
        defaults.update(kw)
        return cls(**defaults)


def init_clip_params(rng: jax.Array, cfg: ClipVisionConfig) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    D, I = cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    keys = jax.random.split(rng, 5)

    def dense(key, in_dim, out_dim):
        # dtype-direct init: no full-size f32 intermediates on-chip
        return {
            "kernel": jax.random.normal(key, (in_dim, out_dim), dtype) * jnp.asarray(0.02, dtype),
            "bias": jnp.zeros((out_dim,), dtype),
        }

    def ln():
        return {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    def layer(key):
        ks = jax.random.split(key, 6)
        return {
            "layer_norm1": ln(),
            "self_attn": {
                "q_proj": dense(ks[0], D, D),
                "k_proj": dense(ks[1], D, D),
                "v_proj": dense(ks[2], D, D),
                "out_proj": dense(ks[3], D, D),
            },
            "layer_norm2": ln(),
            "mlp": {"fc1": dense(ks[4], D, I), "fc2": dense(ks[5], I, D)},
        }

    layers = jax.vmap(layer)(jax.random.split(keys[0], cfg.num_hidden_layers))
    s = jnp.asarray(0.02, dtype)
    return {
        "class_embedding": jax.random.normal(keys[1], (D,), dtype) * s,
        # flattened conv kernel, input order (c, ph, pw) -> row-major patch pixels
        "patch_embedding": jax.random.normal(keys[2], (3 * P * P, D), dtype) * s,
        "position_embedding": jax.random.normal(keys[3], (cfg.num_positions, D), dtype) * s,
        "pre_layrnorm": ln(),   # HF's (sic) key name, kept for converter parity
        "layers": layers,
        "post_layernorm": ln(),
    }


def _layer_norm(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p["weight"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _clip_attention(p, x, cfg: ClipVisionConfig):
    B, S, D = x.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim

    def proj(d, y):
        return (y @ d["kernel"] + d["bias"])

    q = proj(p["q_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    k = proj(p["k_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    v = proj(p["v_proj"], x).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    out = attention_reference(q, k, v, causal=False)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def _encoder_layer(p, x, cfg: ClipVisionConfig):
    x = x + _clip_attention(p["self_attn"], _layer_norm(x, p["layer_norm1"], cfg.layer_norm_eps), cfg)
    h = _layer_norm(x, p["layer_norm2"], cfg.layer_norm_eps)
    h = _quick_gelu(h @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
    h = h @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
    return x + h


def embed_pixels(params: dict, pixel_values: jnp.ndarray, cfg: ClipVisionConfig) -> jnp.ndarray:
    """(B, 3, H, W) pixels -> (B, 1+P², D) embeddings (cls + patches + pos)."""
    B = pixel_values.shape[0]
    P, G = cfg.patch_size, cfg.num_patches_per_side
    x = pixel_values.astype(params["patch_embedding"].dtype)
    # (B, 3, G, P, G, P) -> (B, G, G, 3, P, P) -> (B, G*G, 3*P*P): patch
    # extraction as reshape/transpose, embedding as one MXU matmul.
    x = x.reshape(B, 3, G, P, G, P).transpose(0, 2, 4, 1, 3, 5).reshape(B, G * G, 3 * P * P)
    patches = x @ params["patch_embedding"]
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, patches], axis=1)
    return x + params["position_embedding"][None, :, :]


def clip_vision_forward(
    params: dict,
    pixel_values: jnp.ndarray,
    cfg: ClipVisionConfig,
    *,
    want_router_taps: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Run the tower; returns the reference's ``encode_images*`` outputs.

    Always: ``patch`` (B, P², D) select-layer patch features (and ``cls_patch``).
    With ``want_router_taps``: ``cls``, ``clslast``, ``patchavgpool``,
    ``poolout``, ``attnqk``, ``attnkk`` (reference: llava_arch.py:371-405).
    """
    x = embed_pixels(params, pixel_values, cfg)
    x = _layer_norm(x, params["pre_layrnorm"], cfg.layer_norm_eps)

    n = cfg.num_hidden_layers
    sel = cfg.select_layer if cfg.select_layer >= 0 else n + cfg.select_layer + 1
    if not (0 < sel <= n):
        raise ValueError(f"select_layer {cfg.select_layer} out of range")

    def body(h, layer_params):
        return _encoder_layer(layer_params, h, cfg), None

    # hidden_states[sel] = output after `sel` layers.
    first = jax.tree.map(lambda a: a[:sel], params["layers"])
    h_sel, _ = jax.lax.scan(body, x, first)

    out: Dict[str, jnp.ndarray] = {}
    cls_patch = h_sel
    out["cls_patch"] = cls_patch
    out["patch"] = cls_patch[:, 1:, :]

    if want_router_taps or sel < n:
        rest = jax.tree.map(lambda a: a[sel:], params["layers"])
        if want_router_taps:
            # The reference hooks q_proj/k_proj of the *last* encoder layer
            # (llava_arch.py:362-364); its input is the result after n-1
            # layers.  Run [sel, n-1) under scan, then the final layer
            # explicitly to expose the taps.
            pre_last = jax.tree.map(lambda a: a[: n - 1 - sel], rest)
            h_pre, _ = jax.lax.scan(body, h_sel, pre_last) if n - 1 - sel > 0 else (h_sel, None)
            last = jax.tree.map(lambda a: a[-1], params["layers"])
            x_ln = _layer_norm(h_pre, last["layer_norm1"], cfg.layer_norm_eps)
            q_raw = x_ln @ last["self_attn"]["q_proj"]["kernel"] + last["self_attn"]["q_proj"]["bias"]
            k_raw = x_ln @ last["self_attn"]["k_proj"]["kernel"] + last["self_attn"]["k_proj"]["bias"]
            h_last = _encoder_layer(last, h_pre, cfg)

            D = cfg.hidden_size
            scale = D ** -0.5
            attn_qk = jnp.einsum("bd,bnd->bn", q_raw[:, 0], k_raw[:, 1:]) * scale
            attn_kk = jnp.einsum("bd,bnd->bn", k_raw[:, 0], k_raw[:, 1:]) * scale
            out["attnqk"] = jax.nn.softmax(attn_qk.astype(jnp.float32), axis=-1)
            out["attnkk"] = jax.nn.softmax(attn_kk.astype(jnp.float32), axis=-1)
            out["cls"] = cls_patch[:, 0, :]
            out["patchavgpool"] = cls_patch[:, 1:, :].mean(axis=1)
            out["clslast"] = h_last[:, 0, :]
            out["poolout"] = _layer_norm(h_last[:, 0, :], params["post_layernorm"],
                                         cfg.layer_norm_eps)
        # (h_last beyond select layer is only needed for router taps)
    return out


def feature_select(outputs: Dict[str, jnp.ndarray], select_feature: str) -> jnp.ndarray:
    """reference: clip_encoder.py:36-44."""
    if select_feature == "patch":
        return outputs["patch"]
    if select_feature == "cls_patch":
        return outputs["cls_patch"]
    raise ValueError(f"Unexpected select feature: {select_feature}")


def s2_multiscale_forward(params: dict, pixel_values: jnp.ndarray,
                          cfg: ClipVisionConfig,
                          scales=(336, 672, 1008)) -> jnp.ndarray:
    """Multi-scale (S2) vision tower forward — the TPU-native equivalent of
    the s2wrapper dependency (reference: llava/model/multimodal_encoder/
    clip_encoder.py:93-148 ``CLIPVisionTowerS2``).

    For each scale s: resize the (B, 3, S_max, S_max) input to s x s, split
    into (s/base)^2 base-size tiles, run the tower batched over tiles,
    reassemble the per-tile patch grids spatially, and area-interpolate back
    to the base grid.  Per-scale features concat channel-wise ->
    (B, P^2, D * len(scales)), matching the S2 tower's hidden_size
    (clip_encoder.py:146-148).

    Everything is reshape/resize under jit: no host loops, one compiled
    graph for the full pyramid.
    """
    base = min(scales)
    assert base == cfg.image_size, (base, cfg.image_size)
    B = pixel_values.shape[0]
    G = cfg.num_patches_per_side
    D = cfg.hidden_size

    outs = []
    for s in sorted(scales):
        k = s // base
        if s == pixel_values.shape[-1]:
            img = pixel_values
        else:
            img = jax.image.resize(pixel_values, (B, 3, s, s), method="bilinear")
        if k == 1:
            tiles = img
        else:
            # (B, 3, k, base, k, base) -> (B*k*k, 3, base, base), row-major
            tiles = img.reshape(B, 3, k, base, k, base) \
                .transpose(0, 2, 4, 1, 3, 5).reshape(B * k * k, 3, base, base)
        feats = clip_vision_forward(params, tiles, cfg)["patch"]  # (B*k², G², D)
        if k > 1:
            # reassemble spatial grid: (B, kG, kG, D)
            feats = feats.reshape(B, k, k, G, G, D) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(B, k * G, k * G, D)
            feats = jax.image.resize(feats, (B, G, G, D), method="bilinear")
            feats = feats.reshape(B, G * G, D)
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)
