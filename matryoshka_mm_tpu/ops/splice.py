"""Fixed-shape multimodal splice.

Replaces each ``IMAGE_TOKEN_INDEX`` sentinel in a batch of token sequences
with a block of projected image features, rebuilding embeddings, labels,
attention mask and position ids — the TPU-native equivalent of the
reference's per-sample ragged Python loop
(reference: llava/model/llava_arch.py:532-719
``prepare_inputs_labels_for_multimodal``).

Design: everything is computed with cumulative-sum index arithmetic and
scatters into a static-capacity ``out_len`` buffer, so the whole batch
splices in one fused XLA program — no data-dependent shapes, no host
round-trips.  Semantics matched to the reference:

* padding (``attn_mask == 0``) is stripped before splicing;
* each sentinel expands to ``N`` feature rows labelled ``IGNORE_INDEX``;
* sequences are truncated to ``out_len`` (= ``tokenizer_model_max_length``);
* right- or left-padding of the result, with position ids counting only
  real tokens (llava_arch.py:683-702).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


class SplicedBatch(NamedTuple):
    embeds: jnp.ndarray        # (B, L, D)
    labels: jnp.ndarray        # (B, L) int32, IGNORE_INDEX at pad/image rows
    attn_mask: jnp.ndarray     # (B, L) bool
    position_ids: jnp.ndarray  # (B, L) int32
    lengths: jnp.ndarray       # (B,) int32 true (pre-truncation-clip) lengths


def splice_multimodal(
    input_ids: jnp.ndarray,
    text_embeds: jnp.ndarray,
    image_features: jnp.ndarray,
    *,
    labels: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    out_len: int,
    padding_side: str = "right",
) -> SplicedBatch:
    """Splice image features into token embeddings.

    Args:
      input_ids: (B, T) int; ``IMAGE_TOKEN_INDEX`` marks image positions.
      text_embeds: (B, T, D) embeddings of ``input_ids`` (sentinel rows may
        hold anything; they are never read).
      image_features: (B, M, N, D) — M image slots per sample, N tokens per
        image.  Slot i is consumed by the i-th sentinel of that sample.
      labels: optional (B, T); image rows get ``IGNORE_INDEX`` in output.
      attn_mask: optional (B, T) bool/int; default all-valid.
      out_len: static output capacity L (tokenizer_model_max_length).
      padding_side: 'right' (training) or 'left' (batched generation).
    """
    B, T = input_ids.shape
    D = text_embeds.shape[-1]
    _, M, N, _ = image_features.shape
    L = out_len

    if attn_mask is None:
        attn_mask = jnp.ones((B, T), dtype=bool)
    attn_mask = attn_mask.astype(bool)
    if labels is None:
        labels = jnp.full((B, T), IGNORE_INDEX, dtype=jnp.int32)
    labels = labels.astype(jnp.int32)

    is_img = (input_ids == IMAGE_TOKEN_INDEX) & attn_mask
    valid = attn_mask

    # Index of each token among the valid (non-pad) tokens of its row.
    vidx = jnp.cumsum(valid, axis=1) - 1                      # (B, T)
    # Number of image sentinels strictly before each position.
    k_before = jnp.cumsum(is_img, axis=1) - is_img            # (B, T)
    # Output position: each earlier sentinel displaced later tokens by N-1.
    out_pos = vidx + k_before * (N - 1)                       # (B, T)

    n_valid = valid.sum(axis=1)                               # (B,)
    n_img = is_img.sum(axis=1)                                # (B,)
    lengths = n_valid + n_img * (N - 1)                       # (B,)

    # ---- scatter text tokens -------------------------------------------
    text_ok = valid & ~is_img & (out_pos < L)
    text_dst = jnp.where(text_ok, out_pos, L)                 # L == out of bounds

    def scatter_row(dst, val, init):
        return init.at[dst].set(val, mode="drop")

    embeds = jax.vmap(scatter_row)(
        text_dst, text_embeds, jnp.zeros((B, L, D), text_embeds.dtype)
    )
    out_labels = jax.vmap(scatter_row)(
        text_dst, labels, jnp.full((B, L), IGNORE_INDEX, jnp.int32)
    )

    # ---- scatter image feature blocks ----------------------------------
    # Start offset of the i-th image block per row (L if the row has < i+1
    # sentinels).
    for i in range(M):
        sel = is_img & (k_before == i)                        # one-hot over T
        has = sel.any(axis=1)
        start = jnp.where(has, (jnp.where(sel, out_pos, 0)).sum(axis=1), L)
        block_dst = start[:, None] + jnp.arange(N)[None, :]   # (B, N)
        block_dst = jnp.where(block_dst < L, block_dst, L)
        embeds = jax.vmap(lambda d, v, o: o.at[d].set(v, mode="drop"))(
            block_dst, image_features[:, i].astype(embeds.dtype), embeds
        )
        # image rows already IGNORE_INDEX in out_labels init

    # ---- mask / positions / padding side -------------------------------
    clip_len = jnp.minimum(lengths, L)                        # (B,)
    iota = jnp.arange(L)[None, :]                             # (1, L)
    if padding_side == "right":
        mask = iota < clip_len[:, None]
        position_ids = jnp.where(mask, iota, 0).astype(jnp.int32)
    elif padding_side == "left":
        shift = L - clip_len                                  # (B,)
        src = iota - shift[:, None]                           # (B, L)
        oob = src < 0
        src_c = jnp.clip(src, 0, L - 1)
        embeds = jnp.take_along_axis(embeds, src_c[:, :, None], axis=1)
        embeds = jnp.where(oob[:, :, None], 0, embeds)
        out_labels = jnp.take_along_axis(out_labels, src_c, axis=1)
        out_labels = jnp.where(oob, IGNORE_INDEX, out_labels)
        mask = ~oob
        position_ids = jnp.where(mask, src, 0).astype(jnp.int32)
    else:
        raise ValueError(f"padding_side={padding_side!r}")

    out_labels = jnp.where(mask, out_labels, IGNORE_INDEX)
    return SplicedBatch(embeds, out_labels, mask, position_ids, lengths.astype(jnp.int32))
