"""Consolidate a sharded torch checkpoint into a single native checkpoint
(reference: llava/model/consolidate.py:1-29).

Reads a HF/LLaVA torch checkpoint directory (possibly many shards), converts
to the JAX pytree layout, and writes one orbax checkpoint.
"""

from __future__ import annotations

import argparse


def consolidate_ckpt(src_path: str, dst_path: str) -> None:
    from .builder import load_pretrained_model
    from ..utils.checkpoint import save_checkpoint

    print(f"Loading model from {src_path}")
    _, model, _, _ = load_pretrained_model(src_path, None, None)
    save_checkpoint(dst_path, model.params, model.cfg)
    print(f"Wrote consolidated checkpoint to {dst_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--dst", type=str, required=True)
    args = parser.parse_args()
    consolidate_ckpt(args.src, args.dst)
