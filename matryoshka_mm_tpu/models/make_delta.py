"""Create a license-safe weight delta: delta = target - base
(reference: llava/model/make_delta.py:1-52).

Operates on this framework's orbax checkpoints.  Leaves present only in the
target (projector, router, vision tower) are stored verbatim; embedding
matrices may differ in vocab rows (added special tokens) — the overlapping
rows are differenced, extra rows stored as-is.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..utils.checkpoint import load_checkpoint, save_checkpoint


def _delta_leaf(base, target):
    base, target = np.asarray(base, np.float32), np.asarray(target, np.float32)
    if base.shape == target.shape:
        return target - base
    assert base.ndim == target.ndim == 2, (base.shape, target.shape)
    out = target.copy()
    n = min(base.shape[0], target.shape[0])
    out[:n] = target[:n] - base[:n]
    return out


def make_delta(base_path: str, target_path: str, delta_path: str) -> None:
    print(f"Loading base model from {base_path}")
    base, _ = load_checkpoint(base_path)
    print(f"Loading target model from {target_path}")
    target, cfg = load_checkpoint(target_path)

    out = dict(target)
    out["llama"] = jax.tree_util.tree_map(
        _delta_leaf, base["llama"], target["llama"])
    save_checkpoint(delta_path, out, cfg, extra={"is_delta": True})
    print(f"Wrote delta to {delta_path}")


def apply_delta(base_path: str, target_path: str, delta_path: str) -> None:
    """delta + base -> target (reference: llava/model/apply_delta.py:1-48)."""
    print(f"Loading base model from {base_path}")
    base, _ = load_checkpoint(base_path)
    print(f"Loading delta from {delta_path}")
    delta, cfg = load_checkpoint(delta_path)

    def add(b, d):
        b = np.asarray(b, np.float32)
        d = np.asarray(d, np.float32)
        if b.shape == d.shape:
            return b + d
        out = d.copy()
        n = min(b.shape[0], d.shape[0])
        out[:n] = b[:n] + d[:n]
        return out

    out = dict(delta)
    out["llama"] = jax.tree_util.tree_map(add, base["llama"], delta["llama"])
    save_checkpoint(target_path, out, cfg)
    print(f"Wrote target to {target_path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["make", "apply"])
    parser.add_argument("--base-model-path", type=str, required=True)
    parser.add_argument("--target-model-path", type=str, required=True)
    parser.add_argument("--delta-path", type=str, required=True)
    args = parser.parse_args()
    if args.mode == "make":
        make_delta(args.base_model_path, args.target_model_path, args.delta_path)
    else:
        apply_delta(args.base_model_path, args.target_model_path, args.delta_path)


if __name__ == "__main__":
    main()
