"""Round-4 train-MFU probe (VERDICT #6): measure where the K=5/T=2048
step time goes and how much HBM headroom exists for a weaker remat
policy.

Variants:
  baseline     the bench's exact train_k5_t2048 step (full per-layer remat)
  fwd_only     forward+loss only (no grad) — isolates fwd cost
  no_remat     remat=False (expected OOM at T=2048; try to confirm headroom)

Prints one JSON line per variant: step time, derived MFU, HBM peak.

Usage: python scripts/profile_train.py [T] [variant ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def main():
    args = sys.argv[1:]
    T = int(args[0]) if args else 2048
    variants = args[1:] or ["baseline", "fwd_only"]

    import jax
    import jax.numpy as jnp

    from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.models.clip import ClipVisionConfig
    from matryoshka_mm_tpu.models.llama import LlamaConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, M3Preset, init_llava_params
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
    from matryoshka_mm_tpu.train.train_step import M3Batch, m3_loss
    from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step

    B = 2
    scales = [1, 9, 36, 144, 576]

    def make(remat: bool):
        cfg = LlavaConfig(
            llama=LlamaConfig(hidden_size=2048, intermediate_size=5504,
                              num_hidden_layers=16, num_attention_heads=16,
                              num_key_value_heads=16, vocab_size=32000,
                              dtype="bfloat16", remat=remat),
            vision=ClipVisionConfig.vit_l_14_336(dtype="bfloat16"),
            preset=M3Preset(
                matryoshka_vis_token_scale="ver=v0_numtoks="
                + ",".join(map(str, scales)),
                moe="t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count"),
            router_feature_types=("cls",),
            tokenizer_model_max_length=T + 64,
        )
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        return cfg, params

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, (B, T)).astype(np.int32)
    ids[:, 3] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :T // 2] = IGNORE_INDEX
    px = rng.standard_normal((B, 3, 336, 336)).astype(np.float32)
    batch = M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                    jnp.ones((B, T), bool))

    def mfu(dt, cfg, params):
        seq_lens = [T - 1 + s for s in scales]
        toks = B * sum(seq_lens)
        p_llm = sum(x.size for x in jax.tree_util.tree_leaves(params["llama"])
                    if not jnp.issubdtype(x.dtype, jnp.integer))
        p_vit = sum(x.size for x in
                    jax.tree_util.tree_leaves(params["vision_tower"])
                    if not jnp.issubdtype(x.dtype, jnp.integer))
        h, nl = cfg.llama.hidden_size, cfg.llama.num_hidden_layers
        attn = 6.0 * h * nl * B * sum(s * s for s in seq_lens)
        npat = (cfg.vision.image_size // cfg.vision.patch_size) ** 2 + 1
        return (6.0 * p_llm * toks + attn + 6.0 * p_vit * npat * B) / dt / 197e12

    def hbm():
        try:
            s = jax.local_devices()[0].memory_stats() or {}
            return round(s.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            return None

    for variant in variants:
        try:
            remat = variant != "no_remat"
            cfg, params = make(remat)
            if variant == "fwd_only":
                fn = jax.jit(lambda p, b: m3_loss(p, cfg, b)[0])
                fn(params, batch).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(3):
                    out = fn(params, batch)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / 3
                # fwd flops = 1/3 of the 6P total
                print(json.dumps({"variant": variant, "T": T,
                                  "step_time_s": round(dt, 3),
                                  "fwd_mfu_of_2P": round(
                                      mfu(dt, cfg, params) / 3, 3),
                                  "hbm_peak_gb": hbm()}), flush=True)
                continue
            state, tx = create_train_state(params, OptimizerConfig(total_steps=10))
            step = make_train_step(cfg, tx, donate=True)
            state, metrics = step(state, batch)
            _ = float(metrics["loss"])
            t0 = time.perf_counter()
            n = 2
            for _ in range(n):
                state, metrics = step(state, batch)
            _ = float(metrics["loss"])
            dt = (time.perf_counter() - t0) / n
            print(json.dumps({"variant": variant, "T": T,
                              "step_time_s": round(dt, 3),
                              "mfu": round(mfu(dt, cfg, state.params), 3),
                              "hbm_peak_gb": hbm()}), flush=True)
            del state
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": variant, "T": T,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
