"""Round-4 train-MFU diagnosis: time the K=5/T=2048 bench train step under
config variants and optionally profile one step.

    python scripts/diag_train.py B=2               # baseline (bench shape)
    python scripts/diag_train.py B=4               # post-CE-remat memory try
    python scripts/diag_train.py B=2 policy=dots   # partial remat
    python scripts/diag_train.py B=2 profile=1     # + trace breakdown
    python scripts/diag_train.py B=2 frozen=0      # keep the ViT backward

Prints step time and the same MFU the bench computes, so results are
directly comparable with BENCH `train_k5_t2048`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(kv.get("B", 2))
    T = int(kv.get("T", 2048))
    policy = kv.get("policy", "")
    profile = kv.get("profile", "") not in ("", "0")
    scales = [int(s) for s in kv.get("scales", "1,9,36,144,576").split(",")]

    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.models.clip import ClipVisionConfig
    from matryoshka_mm_tpu.models.llama import LlamaConfig
    from matryoshka_mm_tpu.models.llava import (LlavaConfig, M3Preset,
                                                init_llava_params)
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
    from matryoshka_mm_tpu.train.train_step import M3Batch
    from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step

    scale_str = "[" + ",".join(str(s) for s in scales) + "]"
    cfg = LlavaConfig(
        llama=LlamaConfig(hidden_size=2048, intermediate_size=5504,
                          num_hidden_layers=16, num_attention_heads=16,
                          num_key_value_heads=16, vocab_size=32000,
                          dtype="bfloat16", remat=True, remat_policy=policy),
        vision=ClipVisionConfig.vit_l_14_336(dtype="bfloat16"),
        preset=M3Preset(
            matryoshka_vis_token_scale=f"ver=v0_numtoks={scale_str}",
            moe="t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count"),
        router_feature_types=("cls",),
        tokenizer_model_max_length=T + 64,
    )
    t0 = time.perf_counter()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, OptimizerConfig(total_steps=10))
    frozen_vision = kv.get("frozen", "1") not in ("", "0")
    step = make_train_step(cfg, tx, donate=True, frozen_vision=frozen_vision)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (B, T)).astype(np.int32)
    ids[:, 3] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :T // 2] = IGNORE_INDEX
    px = rng.standard_normal((B, 3, 336, 336)).astype(np.float32)
    batch = M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                    jnp.ones((B, T), bool))

    state, metrics = step(state, batch)   # compile
    print(f"compile+init {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)

    n_steps = 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    seq_lens = [T - 1 + s for s in scales]
    toks = B * sum(seq_lens)

    def _count(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "dtype")
                   and not jnp.issubdtype(x.dtype, jnp.integer))

    p_llm = _count(params.get("llama", params))
    p_vit = _count(params.get("vision_tower", {}))
    n_patches = (cfg.vision.image_size // cfg.vision.patch_size) ** 2 + 1
    h, n_layers = cfg.llama.hidden_size, cfg.llama.num_hidden_layers
    attn_flops = 6.0 * h * n_layers * B * sum(s * s for s in seq_lens)
    vit_mult = 2.0 if frozen_vision else 6.0   # fwd-only when frozen
    flops = 6.0 * p_llm * toks + attn_flops + vit_mult * p_vit * n_patches * B
    print(f"B={B} T={T} policy={policy or 'full'}: "
          f"step {dt:.3f}s  {toks / dt:.0f} tok/s  "
          f"MFU {flops / dt / 197e12:.3f}", flush=True)

    if profile:
        import tempfile

        from profile_decode import parse_trace

        d = tempfile.mkdtemp(prefix="trace_train_")
        jax.profiler.start_trace(d)
        state, metrics = step(state, batch)
        _ = float(metrics["loss"])
        jax.profiler.stop_trace()
        buckets, total = parse_trace(d, steps=1)
        print(f"\ndevice total {total / 1e3:.1f}ms; top ops:")
        for name, dur in buckets.most_common(28):
            print(f"  {dur / 1e3:9.2f}ms  {name[:95]}")


if __name__ == "__main__":
    main()
