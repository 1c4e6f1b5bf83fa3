"""Memory-model validation of the flagship 7B K=5 training recipe on a
multi-chip mesh, without needing the chips.

The 8-device CPU dryrun (`__graft_entry__.dryrun_multichip`) proves the
sharded step COMPILES and RUNS at tiny shapes; this script validates the
7B recipe FITS: it abstractly evaluates the full llava-v1.5-7b-m3
parameter/optimizer trees (no weights materialized), applies the real
partition rules (parallel/sharding.py), and accounts bytes per device —
params, AdamW state, gradients, and a rematerialized-activation estimate
for the reference recipe (global batch 128, seqlen 2048, K=5 scales,
scales folded into one batched forward; reference: scripts/v1_5/
finetune.sh:19-36).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/validate_7b_mesh.py [--dp 4 --tp 2]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def per_device_bytes(tree, shardings, axis_sizes):
    import jax

    total = 0
    for leaf, sh in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(
                            shardings, is_leaf=lambda x: hasattr(x, "spec"))):
        if not hasattr(leaf, "shape"):
            continue
        denom = 1
        for axis in jax.tree_util.tree_leaves(tuple(sh.spec)):
            if axis is not None:
                denom *= axis_sizes.get(axis, 1)
        total += leaf.size * leaf.dtype.itemsize / denom
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--hbm-gb", type=float, default=16.0,
                    help="per-chip HBM (v5e: 16)")
    args = ap.parse_args()

    import jax

    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.parallel import make_mesh
    from matryoshka_mm_tpu.parallel.sharding import param_shardings
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig, build_optimizer

    n = args.dp * args.tp
    if len(jax.devices()) < n:
        # this image pre-initializes jax on the one real TPU; rebuild the
        # backend as n CPU devices in-process (same as dryrun_multichip)
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_num_cpu_devices", n)
        jax.config.update("jax_platforms", "cpu")
        jax.clear_caches()
        assert len(jax.devices()) >= n

    cfg = LlavaConfig.llava_v15_7b_m3()
    mesh = make_mesh((args.dp, args.tp))
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    params = jax.eval_shape(
        lambda: init_llava_params(jax.random.PRNGKey(0), cfg))
    shardings = param_shardings(mesh, params)
    tx = build_optimizer(params, OptimizerConfig(total_steps=1000))
    opt_state = jax.eval_shape(tx.init, params)
    # optimizer-state leaves shard like their matching parameter; scalars
    # (step counts) are replicated — approximate by sharding every leaf
    # whose shape matches a param leaf
    p_leaves = {l.shape: s for l, s in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(shardings,
                                  is_leaf=lambda x: hasattr(x, "spec")))}

    opt_bytes = 0.0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if not hasattr(leaf, "shape"):
            continue
        sh = p_leaves.get(leaf.shape)
        denom = 1
        if sh is not None:
            for axis in jax.tree_util.tree_leaves(tuple(sh.spec)):
                if axis is not None:
                    denom *= axis_sizes.get(axis, 1)
        opt_bytes += leaf.size * leaf.dtype.itemsize / denom

    p_bytes = per_device_bytes(params, shardings, axis_sizes)
    g_bytes = p_bytes  # grads mirror the sharded parameters

    # Activation estimate under remat: the scan body checkpoints only the
    # per-layer residual stream, so live activations are
    #   L x (B_local x S_total x D) residuals (bf16)
    # plus one un-remat'ed layer's intermediates (~4x residual width) and
    # the vision tower's patch activations.
    B = args.per_device_batch
    K = len(cfg.tokscale_list)
    S_total = sum(args.seqlen + s for s in cfg.tokscale_list)  # K folded seqs
    D = cfg.llama.hidden_size
    L = cfg.llama.num_hidden_layers
    resid = B * S_total * D * 2
    act_bytes = L * resid + 8 * resid
    vit_bytes = B * K * 577 * cfg.vision.hidden_size * 2 * 8
    logits_bytes = B * (args.seqlen + max(cfg.tokscale_list)) * \
        cfg.llama.vocab_size * 4  # one scale's f32 logits live at a time

    total = p_bytes + opt_bytes + g_bytes + act_bytes + vit_bytes + logits_bytes
    gb = 1 << 30
    print(f"mesh dp{args.dp} x tp{args.tp}  "
          f"(global batch {B * args.dp * 1}, per-device B={B}, "
          f"T={args.seqlen}, K={K} scales folded)")
    print(f"  params/device       : {p_bytes / gb:7.2f} GiB")
    print(f"  adamw state/device  : {opt_bytes / gb:7.2f} GiB")
    print(f"  grads/device        : {g_bytes / gb:7.2f} GiB")
    print(f"  activations (remat) : {act_bytes / gb:7.2f} GiB")
    print(f"  vision tower acts   : {vit_bytes / gb:7.2f} GiB")
    print(f"  logits buffer       : {logits_bytes / gb:7.2f} GiB")
    print(f"  TOTAL               : {total / gb:7.2f} GiB  "
          f"(budget {args.hbm_gb} GiB/chip)")
    ok = total / gb <= args.hbm_gb * 0.9
    print(f"  -> {'FITS' if ok else 'DOES NOT FIT'} "
          f"({total / gb / args.hbm_gb * 100:.0f}% of HBM"
          f"{'' if ok else '; raise dp/tp or grad-accum'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
