"""LLaVA-M3 top-level model: vision tower + projector + router + LLM.

Functional equivalent of the reference's ``LlavaMetaModel`` /
``LlavaMetaForCausalLM`` / ``LlavaLlamaForCausalLM`` stack
(reference: llava/model/llava_arch.py:148-530,
llava/model/language_model/llava_llama.py:150-346), redesigned for XLA:

* one parameter pytree holds every submodule;
* the M3 behavior knobs live in a hashable ``M3Preset`` (the reference's
  nested ``config.config`` dict) so configs can be static jit arguments;
* ``prepare_multimodal`` = encode -> project -> pool -> fixed-shape splice,
  entirely under jit with static token-scale;
* the K-scale training forward stacks scales into the batch dimension
  (one big MXU-friendly forward) instead of the reference's 5x serial
  python loop (llava_llama.py:307-346, SURVEY.md P8).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import DEFAULT_TOKSCALES
from ..kvconfig import parse_kv_from_string, parse_list
from ..ops.pooling import matryoshka_pool
from ..ops.splice import SplicedBatch, splice_multimodal
from .clip import ClipVisionConfig, clip_vision_forward, feature_select, init_clip_params
from .llama import LlamaConfig, embed_tokens, init_llama_params, lm_head, llama_forward
from .projector import apply_projector, init_projector_params
from .router import build_router_input, dense_gating_forward, init_dense_gating_params, uniform_gating_forward


@dataclasses.dataclass(frozen=True)
class M3Preset:
    """The reference's ``model.config.config`` behavior dict
    (reference: llava/config/model_config.py:5-20), made hashable."""

    use_alternative: bool = True
    projection_type: str = "v4"
    matryoshka_vis_token_scale: Optional[str] = None
    moe: Optional[str] = None
    projector_loc: str = "after_vision_tower"
    lm_loss_type: str = "micro"

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "M3Preset":
        if d is None:
            return cls(use_alternative=False)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: ClipVisionConfig = dataclasses.field(default_factory=ClipVisionConfig)
    preset: M3Preset = dataclasses.field(default_factory=M3Preset)
    mm_projector_type: str = "mlp2x_gelu"
    mm_patch_merge_type: str = "flat"
    image_aspect_ratio: str = "pad"
    image_grid_pinpoints: Optional[str] = None
    tokenizer_model_max_length: int = 2048
    tokenizer_padding_side: str = "right"
    router_feature_types: Tuple[str, ...] = ()
    text_embed_dim: int = 384  # bge-small-en-v1.5 (llava_arch.py:259)

    # ----- reference property parity (llava_arch.py:283-297) -----
    @property
    def is_m3(self) -> bool:
        return (self.preset.use_alternative
                and self.preset.projection_type == "v4"
                and self.preset.matryoshka_vis_token_scale is not None)

    @property
    def is_m3_moe(self) -> bool:
        return self.is_m3 and self.preset.moe is not None

    @property
    def tokscale_list(self) -> List[int]:
        if not self.is_m3:
            return []
        kvs = parse_kv_from_string(self.preset.matryoshka_vis_token_scale)
        return [int(x) for x in parse_list(kvs["numtoks"])]

    @property
    def mm_hidden_size(self) -> int:
        return self.vision.hidden_size

    @classmethod
    def tiny_debug(cls, moe: Optional[str] = None,
                   scales: Tuple[int, ...] = (1, 4, 16)) -> "LlavaConfig":
        """Small random-init config: 16-patch grid, 4-layer LLM."""
        scale_str = "[" + ",".join(str(s) for s in scales) + "]"
        return cls(
            llama=LlamaConfig.tiny_debug(),
            vision=ClipVisionConfig.tiny_debug(),
            preset=M3Preset(
                matryoshka_vis_token_scale=f"ver=v0_numtoks={scale_str}",
                moe=moe,
            ),
            mm_projector_type="mlp2x_gelu",
            tokenizer_model_max_length=128,
            router_feature_types=("cls",) if moe else (),
        )

    @classmethod
    def llava_v15_7b_m3(cls, moe: Optional[str] = None, **kw) -> "LlavaConfig":
        scales = "[1,9,36,144,576]"
        return cls(
            llama=LlamaConfig.vicuna_7b(),
            vision=ClipVisionConfig.vit_l_14_336(dtype="bfloat16"),
            preset=M3Preset(matryoshka_vis_token_scale=f"ver=v0_numtoks={scales}", moe=moe),
            tokenizer_model_max_length=2048,
            router_feature_types=("cls",) if moe else (),
            **kw,
        )


def router_embed_dim(cfg: LlavaConfig) -> int:
    """reference: llava_arch.py:250-265."""
    dim = 0
    fts = cfg.router_feature_types
    if "textcls" in fts:
        dim += cfg.text_embed_dim
    if any(x in fts for x in ("cls", "clslast", "patchavgpool", "poolout")):
        dim += cfg.mm_hidden_size
    elif any(x in fts for x in ("attnqk", "attnkk")):
        dim += cfg.vision.num_patches
    return dim


def init_llava_params(rng: jax.Array, cfg: LlavaConfig) -> dict:
    k_vis, k_proj, k_router, k_llama, k_newline = jax.random.split(rng, 5)
    params = {
        "vision_tower": init_clip_params(k_vis, cfg.vision),
        "mm_projector": init_projector_params(
            k_proj, cfg.mm_projector_type, cfg.mm_hidden_size,
            cfg.llama.hidden_size, dtype=cfg.llama.dtype),
        "llama": init_llama_params(k_llama, cfg.llama),
    }
    if cfg.is_m3_moe:
        kvs = parse_kv_from_string(cfg.preset.moe)
        if kvs.get("t") == "dense":
            params["router"] = init_dense_gating_params(
                k_router, router_embed_dim(cfg), len(cfg.tokscale_list))
    if "unpad" in cfg.mm_patch_merge_type:
        D = cfg.llama.hidden_size
        std = D ** -0.5
        params["image_newline"] = (
            jax.random.normal(k_newline, (D,), jnp.float32) * std
        ).astype(jnp.dtype(cfg.llama.dtype))
    return params


# ---------------------------------------------------------------------------
# vision path
# ---------------------------------------------------------------------------

def encode_images(params: dict, cfg: LlavaConfig,
                  pixel_values: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """CLIP forward with feature select and (for M3) router taps
    (reference: llava_arch.py:407-417)."""
    vis_cfg = dataclasses.replace(cfg.vision, select_layer=cfg.vision.select_layer)
    outs = clip_vision_forward(
        params["vision_tower"], pixel_values, vis_cfg,
        want_router_taps=cfg.is_m3)
    outs["patch"] = feature_select(outs, cfg.vision.select_feature) \
        if cfg.vision.select_feature != "patch" else outs["patch"]
    return outs


def router_forward(params: dict, cfg: LlavaConfig,
                   encode_outputs: Dict[str, jnp.ndarray],
                   text_embed: Optional[jnp.ndarray] = None) -> Optional[jnp.ndarray]:
    """(B, K) gating probs, or None when not M3-MoE
    (reference: llava_arch.py:499-518)."""
    if not cfg.is_m3_moe:
        return None
    kvs = parse_kv_from_string(cfg.preset.moe)
    model_type = kvs.get("t")
    if model_type == "id":
        return uniform_gating_forward(len(cfg.tokscale_list), encode_outputs["patch"])
    router_input = build_router_input(encode_outputs, cfg.router_feature_types, text_embed)
    return dense_gating_forward(params["router"], router_input.astype(jnp.float32))


def project(params: dict, cfg: LlavaConfig, pixel_values: jnp.ndarray,
            numtoks: int, *, text_embed: Optional[jnp.ndarray] = None
            ) -> Dict[str, jnp.ndarray]:
    """encode -> (projector) -> pool -> (projector); static ``numtoks``
    (reference: llava_arch.py:419-497 ``project``/``project_v4``)."""
    outs = encode_images(params, cfg, pixel_values)
    feats = outs["patch"]
    if cfg.preset.projector_loc == "after_vision_tower":
        feats = apply_projector(params["mm_projector"], cfg.mm_projector_type, feats)
    gating_prob = router_forward(params, cfg, outs, text_embed)
    if cfg.preset.use_alternative and cfg.preset.projection_type == "v4":
        feats = matryoshka_pool(feats, numtoks)
    if cfg.preset.projector_loc == "after_pooling":
        feats = apply_projector(params["mm_projector"], cfg.mm_projector_type, feats)
    return {"image_features": feats, "gating_prob": gating_prob}


def splice_capacity(cfg: LlavaConfig, text_len: int, numtoks: int,
                    max_images: int = 1) -> int:
    """Static splice buffer size: text minus sentinels plus visual tokens,
    clipped to tokenizer_model_max_length (llava_arch.py:668-672)."""
    cap = text_len + max_images * (numtoks - 1)
    return min(cap, cfg.tokenizer_model_max_length)


def prepare_multimodal(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,              # (B, T)
    pixel_values: jnp.ndarray,           # (B, 3, H, W) one image per sample
    *,
    numtoks: int,
    labels: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    out_len: Optional[int] = None,
    padding_side: Optional[str] = None,
) -> Tuple[SplicedBatch, Optional[jnp.ndarray]]:
    """Full multimodal input preparation under jit
    (reference: llava_arch.py:532-719).  Returns (spliced, gating_prob)."""
    B, T = input_ids.shape
    proj = project(params, cfg, pixel_values, numtoks)
    feats = proj["image_features"][:, None]  # (B, 1, N, D)
    text = embed_tokens(params["llama"], input_ids)
    L = out_len if out_len is not None else splice_capacity(cfg, T, numtoks)
    spliced = splice_multimodal(
        input_ids, text, feats, labels=labels, attn_mask=attn_mask,
        out_len=L, padding_side=padding_side or cfg.tokenizer_padding_side)
    return spliced, proj["gating_prob"]


def prepare_multimodal_multi(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,              # (1, T) with M image sentinels
    pixel_values: jnp.ndarray,           # (M, 3, H, W) distinct images
    *,
    numtoks: int,
    out_len: Optional[int] = None,
    padding_side: Optional[str] = None,
) -> Tuple[SplicedBatch, jnp.ndarray]:
    """Multi-image preparation for ONE sample: the i-th image's pooled
    features land at the i-th ``IMAGE_TOKEN_INDEX`` sentinel (the
    reference's ragged loop consumes images in sentinel order,
    llava_arch.py:560-700; here the M feature blocks ride the splice's
    per-sample image-slot axis)."""
    M = pixel_values.shape[0]
    proj = project(params, cfg, pixel_values, numtoks)   # M as batch
    feats = proj["image_features"][None]                 # (1, M, N, D)
    text = embed_tokens(params["llama"], input_ids)
    T = input_ids.shape[1]
    L = out_len if out_len is not None else T - M + M * numtoks
    spliced = splice_multimodal(
        input_ids, text, feats, out_len=L,
        padding_side=padding_side or cfg.tokenizer_padding_side)
    return spliced, proj["gating_prob"]


def unpad_image_features(grid: jnp.ndarray, original_size, current_hw) -> jnp.ndarray:
    """Crop a (D, H, W) feature grid back to the image's aspect ratio
    (reference: llava_arch.py:307-335 ``unpad_image``).  Static shapes: the
    original size is a host-side python tuple."""
    original_width, original_height = original_size
    current_height, current_width = current_hw
    original_aspect = original_width / original_height
    current_aspect = current_width / current_height
    if original_aspect > current_aspect:
        scale = current_width / original_width
        new_height = int(original_height * scale)
        padding = (current_height - new_height) // 2
        return grid[:, padding: current_height - padding, :]
    scale = current_height / original_height
    new_width = int(original_width * scale)
    padding = (current_width - new_width) // 2
    return grid[:, :, padding: current_width - padding]


def encode_anyres_features(params: dict, cfg: LlavaConfig,
                           pixel_values: jnp.ndarray,   # (T, 3, H, W)
                           image_size, numtoks: int) -> jnp.ndarray:
    """Anyres multi-tile encoding -> one (L_img, D) token sequence
    (reference: llava_arch.py:552-589 spatial/spatial_unpad merge).

    Tile 0 is the base resize; tiles 1..T are the grid patches.  Each tile
    is matryoshka-pooled to ``numtoks`` tokens, the grid is reassembled,
    optionally unpadded to the image aspect, an ``image_newline`` column is
    appended per row, then base features are prepended."""
    import math

    from ..image_processing import get_anyres_image_grid_shape

    proj = project(params, cfg, pixel_values, numtoks)
    feats = proj["image_features"]                      # (T, n, D)
    merge = cfg.mm_patch_merge_type
    if merge == "flat":
        return feats.reshape(-1, feats.shape[-1])

    base = feats[0]                                     # (n, D)
    tiles = feats[1:]
    h = w = int(math.isqrt(base.shape[0]))
    D = base.shape[-1]
    if tiles.shape[0] == 0:
        if "unpad" in merge:
            base = jnp.concatenate([base, params["image_newline"][None]], axis=0)
        return base

    num_w, num_h = get_anyres_image_grid_shape(
        image_size, cfg.image_grid_pinpoints, cfg.vision.image_size)
    grid = tiles.reshape(num_h, num_w, h, w, D)
    if "unpad" in merge:
        # (D, num_h*h, num_w*w)
        grid = grid.transpose(4, 0, 2, 1, 3).reshape(D, num_h * h, num_w * w)
        grid = unpad_image_features(grid, image_size, (num_h * h, num_w * w))
        newline = jnp.broadcast_to(
            params["image_newline"][:, None, None], (D, grid.shape[1], 1))
        grid = jnp.concatenate([grid, newline.astype(grid.dtype)], axis=2)
        tile_feats = grid.reshape(D, -1).T               # (rows*(cols+1), D)
    else:
        tile_feats = grid.transpose(0, 2, 1, 3, 4).reshape(-1, D)
    return jnp.concatenate([base, tile_feats], axis=0)


def anyres_token_count(cfg: LlavaConfig, image_size, n_stacks: int,
                       numtoks: int) -> int:
    """Exact visual-token count an anyres image splices into the sequence
    (mirrors :func:`encode_anyres_features`, incl. the unpad crop and the
    per-row ``image_newline`` column).  ``n_stacks`` counts the base
    resize plus grid tiles — ``pixel_values.shape[0]``."""
    import math

    from ..image_processing import get_anyres_image_grid_shape

    merge = cfg.mm_patch_merge_type
    if merge == "flat":
        return n_stacks * numtoks
    if n_stacks <= 1:
        return numtoks + (1 if "unpad" in merge else 0)
    h = w = int(math.isqrt(numtoks))
    num_w, num_h = get_anyres_image_grid_shape(
        image_size, cfg.image_grid_pinpoints, cfg.vision.image_size)
    H, W = num_h * h, num_w * w
    if "unpad" in merge:
        ow, oh = image_size
        if ow / oh > W / H:
            pad = (H - int(oh * (W / ow))) // 2
            H = H - 2 * pad
        else:
            pad = (W - int(ow * (H / oh))) // 2
            W = W - 2 * pad
        return numtoks + H * (W + 1)
    return numtoks + (n_stacks - 1) * numtoks


def prepare_multimodal_anyres(
    params: dict, cfg: LlavaConfig, input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray, image_size, *, numtoks: int,
    out_len: int, padding_side: str = "left",
) -> SplicedBatch:
    """Batch-1 anyres input preparation: variable tile counts compile one
    graph per (tile-count, grid-shape) via the static args."""
    feats = encode_anyres_features(params, cfg, pixel_values, image_size,
                                   numtoks)
    text = embed_tokens(params["llama"], input_ids)
    return splice_multimodal(
        input_ids, text, feats[None, None], out_len=out_len,
        padding_side=padding_side)


def forward_spliced(params: dict, cfg: LlavaConfig, spliced: SplicedBatch
                    ) -> jnp.ndarray:
    """LLM forward over spliced embeddings -> float32 logits (B, L, V)."""
    hidden, _ = llama_forward(
        params["llama"], cfg.llama, spliced.embeds,
        position_ids=spliced.position_ids, attn_valid=spliced.attn_mask)
    return lm_head(params["llama"], hidden)
