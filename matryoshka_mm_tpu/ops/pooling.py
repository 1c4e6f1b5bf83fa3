"""Matryoshka token-scale pooling.

The M3 core: a (B, 576, D) CLIP patch-feature grid is average-pooled to a
coarse scale of ``numtoks`` visual tokens (reference: llava/model/
llava_arch.py:456-497 ``project_v4`` using ``adaptive_avg_pool2d``).

TPU-first design: instead of a pooling loop, pooling is expressed as two
small matmuls ``P @ X @ P^T`` with a precomputed (h, H) window-weight
matrix.  This is bit-exact to torch's ``adaptive_avg_pool2d`` (including
non-divisor scales, via the same floor/ceil window rule) and runs on the
MXU, fusing cleanly into the surrounding projector matmuls.
"""

from __future__ import annotations

import math

import jax
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _pooling_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic adaptive-average-pool weights.

    Row i averages input positions [floor(i*in/out), ceil((i+1)*in/out)),
    the exact window rule of ``torch.nn.functional.adaptive_avg_pool2d``.
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


def pooling_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    return jnp.asarray(_pooling_matrix_np(out_size, in_size))


def matryoshka_pool(image_features: jnp.ndarray, numtoks: int) -> jnp.ndarray:
    """Pool (B, H*W, D) patch features to (B, numtoks, D).

    ``numtoks`` must be a perfect square (the reference asserts h*w==numtoks,
    llava_arch.py:486-487).  Static argument -> one compiled graph per scale.
    """
    B, HW, D = image_features.shape
    H = W = int(math.isqrt(HW))
    if H * W != HW:
        raise ValueError(f"feature count {HW} is not a square grid")
    h = w = int(math.isqrt(numtoks))
    if h * w != numtoks:
        raise ValueError(f"numtoks={numtoks} is not a perfect square")
    if numtoks == HW:
        return image_features

    x = image_features.reshape(B, H, W, D)
    p = pooling_matrix(h, H).astype(image_features.dtype)
    # rows: (B, H, W, D) -> (B, h, W, D);  cols: -> (B, h, w, D).
    # HIGHEST keeps f32 inputs bit-faithful to adaptive_avg_pool2d on the MXU
    # (bf16 inputs are unaffected and stay on the fast path).
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("hH,BHWD->BhWD", p, x, **kw)
    x = jnp.einsum("wW,BhWD->BhwD", p, x, **kw)
    return x.reshape(B, numtoks, D).astype(image_features.dtype)
