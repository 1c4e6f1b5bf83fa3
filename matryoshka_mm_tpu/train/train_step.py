"""M3 training step.

The reference trains by looping K=5 full forwards per optimizer step — one
per token scale — and summing losses (reference: llava/model/language_model/
llava_llama.py:291-346, the P8 hot spot in SURVEY.md).  Here the whole
multi-scale step is **one** jitted program:

* the vision tower runs ONCE per step (the reference re-encodes the same
  pixels K times);
* the K spliced sequences are stacked into the batch axis -> a single
  (K*B, L) LLM forward that keeps the MXU busy;
* every scale is spliced left-aligned into the same L-token buffer, so
  answer tokens line up across scales and the KD objectives index
  teacher/student logits directly (the reference emulates this with its
  `pad_logits_to_longest` left-pad trick, llava_trainer.py:889-900);
* MoE objectives (llava_trainer.py:466-794) are assembled from the pure
  loss library; batch statistics that the reference all-gathers over NCCL
  are plain batch means under pjit data parallelism.

EMA state for the argmaxcost load balance is threaded explicitly through
the step (TrainState.argmaxcost_ema).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX
from ..kvconfig import parse_kv_from_string, parse_list
from ..ops.pooling import matryoshka_pool
from ..ops.splice import splice_multimodal
from ..models.llama import embed_tokens, llama_forward, lm_head
from ..models.llava import LlavaConfig, encode_images, router_forward, splice_capacity
from ..models.projector import apply_projector
from . import losses as L


class M3Batch(NamedTuple):
    input_ids: jnp.ndarray    # (B, T)
    pixel_values: jnp.ndarray  # (B, 3, H, W)
    labels: jnp.ndarray       # (B, T)
    attn_mask: jnp.ndarray    # (B, T)
    # optional frozen text embedding for the router's `textcls` feature,
    # computed host-side by models.text_embedder.TextEmbedder (the BERT is
    # frozen, so it lives outside the differentiated graph): (B, D_text)
    text_embed: Optional[jnp.ndarray] = None


def multiscale_forward(params: dict, cfg: LlavaConfig, batch: M3Batch,
                       out_len: Optional[int] = None,
                       need_logits: bool = True,
                       frozen_vision: bool = False
                       ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batched forward over all K token scales.

    Returns (logits (K, B, L, V) fp32 or None, labels (K, B, L),
    gating_prob (B, K) or None, losses_lm (B, K), ce (K, B, L-1),
    valid (K, B, L-1)).

    With ``need_logits=False`` the (K, B, L, V) float32 logits are never
    materialized: per-token CE is computed from hidden states in sequence
    chunks (losses.chunked_token_cross_entropy) — the dominant memory term
    at ctx 2048+576 with V=32000 (the reference materializes and concats K
    copies of it, llava_llama.py:342).  Only the distillation objectives
    need real logits.

    ``frozen_vision`` stop-gradients the vision-tower outputs.  The CLIP
    tower is frozen in every reference recipe except
    ``unfreeze_mm_vision_tower`` (torch sets requires_grad=False, so the
    reference never runs the ViT backward); without the stop_gradient,
    JAX differentiates through the tower and merely ZEROES the grads in
    the optimizer's frozen group — paying the ViT backward's compute and
    its saved activations (~0.5GB at B=2) for nothing.  Downstream
    consumers (projector, router) keep their gradients: they use the
    features as activations, not as a differentiation path."""
    scales = cfg.tokscale_list
    K = len(scales)
    B, T = batch.input_ids.shape
    buf_len = out_len or splice_capacity(cfg, T, max(scales))

    # ---- vision once ----
    outs = encode_images(params, cfg, batch.pixel_values)
    if frozen_vision:
        outs = jax.tree.map(jax.lax.stop_gradient, outs)
    feats = outs["patch"]
    if cfg.preset.projector_loc == "after_vision_tower":
        feats = apply_projector(params["mm_projector"], cfg.mm_projector_type, feats)
    gating_prob = router_forward(params, cfg, outs,
                                 text_embed=batch.text_embed)

    # ---- scale -> buffer-length buckets ------------------------------
    # Distillation objectives need every scale in ONE left-padded buffer
    # (teacher/student logits align token-for-token at the right edge);
    # the per-token-CE path has no cross-scale coupling, so each scale
    # runs at (near-)native length instead.  A uniform K-scale buffer
    # wastes real MXU work padding the small scales up to the 576-token
    # capacity — ~16% of decoder FLOPs at T=2048 — which is exactly the
    # round-3 train-MFU gap (VERDICT #6).  Scales whose capacities are
    # within 5% share a forward (fewer kernels, same rounding), so the
    # default [1, 9, 36, 144, 576] runs as three forwards:
    # [1, 9, 36] @ cap(36), [144], [576].
    if need_logits or out_len is not None:
        buckets = [(buf_len, list(range(K)))]
    else:
        buckets, anchor = [], None
        for i in sorted(range(K), key=lambda j: scales[j]):
            cap = splice_capacity(cfg, T, scales[i])
            if buckets and cap <= int(anchor * 1.05):
                prev_cap, members = buckets[-1]
                buckets[-1] = (max(prev_cap, cap), members + [i])
            else:
                buckets.append((cap, [i]))
                anchor = cap

    # ---- pool + splice per scale, left-aligned per bucket; one LLM
    # forward per bucket ------------------------------------------------
    text = embed_tokens(params["llama"], batch.input_ids)
    lm_head_w = params["llama"].get("lm_head", params["llama"]["embed_tokens"])
    labels_all = [None] * K
    ce_all = [None] * K
    valid_all = [None] * K
    logits_all = [None] * K
    for cap, members in buckets:
        spliced = []
        for i in members:
            pooled = matryoshka_pool(feats, scales[i])
            if cfg.preset.projector_loc == "after_pooling":
                pooled = apply_projector(params["mm_projector"],
                                         cfg.mm_projector_type, pooled)
            spliced.append(splice_multimodal(
                batch.input_ids, text, pooled[:, None],
                labels=batch.labels, attn_mask=batch.attn_mask,
                out_len=cap, padding_side="left"))
        embeds = jnp.concatenate([s.embeds for s in spliced], axis=0)
        pos = jnp.concatenate([s.position_ids for s in spliced], axis=0)
        mask = jnp.concatenate([s.attn_mask for s in spliced], axis=0)

        hidden, _ = llama_forward(params["llama"], cfg.llama, embeds,
                                  position_ids=pos, attn_valid=mask)
        hidden = hidden.reshape(len(members), B, cap, -1)

        # left-pad every per-scale output back to the global buf_len so
        # the stacked (K, B, L) shapes are bucket-independent; content is
        # right-aligned (padding_side="left"), pads carry IGNORE/0/False
        # so every downstream reduction is unchanged
        lpad = buf_len - cap
        for g, i in enumerate(members):
            ce_i, valid_i = L.chunked_token_cross_entropy(
                hidden[g], lm_head_w, spliced[g].labels)
            labels_all[i] = jnp.pad(spliced[g].labels, ((0, 0), (lpad, 0)),
                                    constant_values=IGNORE_INDEX)
            ce_all[i] = jnp.pad(ce_i, ((0, 0), (lpad, 0)))
            valid_all[i] = jnp.pad(valid_i, ((0, 0), (lpad, 0)))
            if need_logits:
                logits_all[i] = lm_head(params["llama"], hidden[g])

    labels = jnp.stack(labels_all)   # (K, B, L)
    ce = jnp.stack(ce_all)           # (K, B, L-1)
    valid = jnp.stack(valid_all)

    losses_lm = jnp.stack([
        _unreduced_from_ce(ce[k], valid[k], cfg.preset.lm_loss_type)
        for k in range(K)
    ], axis=1)  # (B, K)

    logits = jnp.stack(logits_all) if need_logits else None
    return logits, labels, gating_prob, losses_lm, ce, valid


def _unreduced_from_ce(ce, valid, lm_loss_type):
    """(B,) per-sample loss from per-token CE (llava_llama.py:114-138)."""
    if lm_loss_type == "micro":
        per_seq = ce.sum(-1)
        return per_seq * per_seq.shape[0] / (valid.sum() + 1e-8)
    return ce.sum(-1) / (valid.sum(-1) + 1e-8)


def _plain_from_ce(ce, valid, lm_loss_type):
    """Scalar LM loss from per-token CE (llava_llama.py:40-72)."""
    if lm_loss_type == "micro":
        return ce.sum() / jnp.maximum(valid.sum(), 1)
    return (ce.sum(-1) / (valid.sum(-1) + 1e-8)).mean()


def _weighted_from_ce(ce, valid, w, lm_loss_type):
    """Gating-weighted LM loss from per-token CE (llava_llama.py:75-111)."""
    w = w.reshape(ce.shape[0]).astype(jnp.float32)
    if lm_loss_type == "micro":
        return (ce.sum(-1) * w).sum() / (valid.sum() + 1e-8)
    return ((ce.sum(-1) / (valid.sum(-1) + 1e-8)) * w).mean()


def m3_loss(params: dict, cfg: LlavaConfig, batch: M3Batch,
            argmaxcost_ema: Optional[jnp.ndarray] = None,
            uniform_buffer: bool = False,
            frozen_vision: bool = False
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full M3(+MoE) objective.  Returns (loss, metrics dict).

    Loss composition mirrors llava_llama.py:307-346 + llava_trainer.py:
    454-794, including objectives that *replace* the base loss (bounderr,
    lmlossaddcost) vs those that *add* (distil, load-balance terms).

    ``uniform_buffer`` forces the single-bucket forward (every scale
    padded to the largest capacity).  The default capacity-bucketed
    forward saves the padding FLOPs, but its heterogeneous per-bucket
    temporaries fragment the TPU allocator — measured 44% HLO-temp
    fragmentation (5.35G wasted) at K=3/T=256/B=4, a deterministic
    compile-time OOM where the uniform buffer fits with room to spare
    (round-4's opaque `remote_compile HTTP 500` fallback, root-caused in
    round 5).  At small T the padding cost is modest, so uniform is the
    right trade; at T>=1024 bucketing wins and B=2 fits either way."""
    scales = cfg.tokscale_list
    K = len(scales)
    lm_loss_type = cfg.preset.lm_loss_type

    # distillation objectives are the only consumers of raw logits; every
    # other objective derives from per-token CE (memory-efficient path)
    need_logits = False
    if cfg.is_m3_moe:
        obj_probe = str(parse_kv_from_string(cfg.preset.moe).get("obj",
                                                                 "weightedlm"))
        need_logits = obj_probe in ("distil", "distilpickteacher")

    out_len = (splice_capacity(cfg, batch.input_ids.shape[1], max(scales))
               if uniform_buffer else None)
    logits, labels, gating_prob, losses_lm, ce, valid = multiscale_forward(
        params, cfg, batch, need_logits=need_logits, out_len=out_len,
        frozen_vision=frozen_vision)
    metrics: Dict[str, jnp.ndarray] = {}

    losses_lm_reduced = losses_lm.mean(axis=0)  # (K,) unweighted per-scale
    for k in range(K):
        metrics[f"moe/loss_lm_{k}"] = losses_lm_reduced[k]

    if gating_prob is None:
        # plain M3: average of per-scale LM losses (llava_llama.py:327-329)
        loss = sum(
            _plain_from_ce(ce[k], valid[k], lm_loss_type) for k in range(K)
        ) / K
        metrics["loss"] = loss
        return loss, metrics

    # ---- M3-MoE ----
    kvs = parse_kv_from_string(cfg.preset.moe)
    obj = str(kvs.get("obj", "weightedlm"))

    # base: gating-weighted LM loss summed over scales (llava_llama.py:264-267,344-346)
    loss = sum(
        _weighted_from_ce(ce[k], valid[k], gating_prob[:, k], lm_loss_type)
        for k in range(K)
    )

    # global-batch gating stats (under pjit the batch IS the global batch)
    batch_assignment = L.per_expert_assignment(gating_prob)
    for k in range(K):
        metrics[f"moe/avg_gating_prob_{k}"] = gating_prob[:, k].mean()
        metrics[f"moe/avg_expert_assignment_{k}"] = batch_assignment[k]

    gating_prob_argmax = None
    if obj.startswith("bounderr"):
        margin = float(kvs.get("margin", 0))
        tau = float(kvs.get("tau", 1))
        gating_prob_argmax = L.compute_gating_prob_argmax(gating_prob, tau)
        loss = L.bounderr_loss(losses_lm, gating_prob_argmax, margin,
                               squared=obj == "bounderrsq")
        losses_argmax = (losses_lm * gating_prob_argmax).sum(1)
        metrics["moe_bounderr/loss_argmaxscale_avg"] = losses_argmax.mean()
        metrics["moe_bounderr/loss_maxscale_avg"] = losses_lm[:, -1].mean()
        metrics["moe_bounderr/loss_diff_avg"] = (losses_argmax - losses_lm[:, -1]).mean()
    elif obj.startswith("lmlossaddcost"):
        lamb = float(kvs.get("lambda", 0.0))
        cost = L.get_per_expert_cost(str(kvs.get("costt", "count")),
                                     batch_assignment, scales)
        loss = L.lmlossaddcost_loss(losses_lm, gating_prob, cost, lamb)
    elif obj in ("distil", "distilpickteacher"):
        loss = loss + _distillation_loss(kvs, obj, logits, labels, scales, metrics)
    elif obj == "weightedlm":
        pass

    # ---- load balance ----
    loadb = kvs.get("loadb", None)
    if loadb == "switch":
        alpha = float(kvs["alpha"])
        cost = L.get_per_expert_cost(str(kvs.get("costt", "count")),
                                     batch_assignment, scales)
        loss_switch = L.switch_load_balance_loss(gating_prob, cost, alpha)
        loss = loss + loss_switch
        metrics["moe_load/loss_switch"] = loss_switch
        for k in range(K):
            metrics[f"moe_load/cost_{k}"] = cost[k]
    elif loadb == "argmaxcost":
        alpha = float(kvs["alpha"])
        cost = L.get_per_expert_cost(str(kvs.get("costt")), batch_assignment, scales)
        target_value = kvs.get("tval", None)
        numtoks_margin = kvs.get("tmargin", None)
        if gating_prob_argmax is None:
            gating_prob_argmax = L.compute_gating_prob_argmax(
                gating_prob, float(kvs.get("tau", 1)))
        argmaxcost = (gating_prob_argmax * cost.reshape(-1, K)).sum(1).mean()
        batch_cost = jax.lax.stop_gradient(argmaxcost)
        metrics["moe_load/argmaxcost"] = batch_cost
        new_ema = None
        if kvs.get("emaa", None):
            alpha_ema = float(kvs["emaa"])
            # argmaxcost_ema < 0 flags "uninitialized" (cost lives in [0,1])
            ema_prev = (batch_cost if argmaxcost_ema is None
                        else jnp.where(argmaxcost_ema < 0, batch_cost, argmaxcost_ema))
            new_ema = alpha_ema * batch_cost + (1 - alpha_ema) * ema_prev
            batch_cost = new_ema
            metrics["moe_load/argmaxcost_ema"] = new_ema
        loss_amc = L.argmaxcost_ema_loss(
            gating_prob_argmax, cost, batch_cost, alpha,
            float(target_value) if target_value is not None else None,
            float(numtoks_margin) if numtoks_margin is not None else None)
        loss = loss + loss_amc
        metrics["moe_load/loss_argmaxcost"] = loss_amc
        if new_ema is not None:
            metrics["_state/argmaxcost_ema"] = new_ema
        for k in range(K):
            metrics[f"moe_load/cost_{k}"] = cost[k]
    elif loadb == "betalogprob":
        if K != 2:
            raise ValueError(f"#tokscale = {K} not supported for betalogprob")
        loss_beta = L.beta_logprob_loss(gating_prob, float(kvs["alpha"]),
                                        float(kvs["ba"]), float(kvs["bb"]))
        loss = loss + loss_beta
        metrics["moe_load/loss_beta_logprob"] = loss_beta

    metrics["loss"] = loss
    return loss, metrics


def _distillation_loss(kvs, obj, logits, labels, scales, metrics):
    """Cross-scale KD (reference: llava_trainer.py:564-725).

    All scales share a left-aligned L-token buffer so teacher/student
    logits align token-for-token; labels of the largest scale mask the loss.
    """
    temperature = float(kvs["temp"])
    alpha = float(kvs["alpha"])
    detach_t = bool(int(kvs.get("detacht", 0)))
    tokscales_s = [int(x) for x in parse_list(kvs["tss"])]
    tokscales_t = [int(x) for x in parse_list(kvs["tst"])]
    labels_ref = labels[-1]  # largest scale

    if obj == "distil":
        loss_distil = 0.0
        for ts in tokscales_s:
            for tt in tokscales_t:
                s_id, t_id = scales.index(ts), scales.index(tt)
                loss_distil += L.tokenwise_kd_loss(
                    logits[t_id], logits[s_id], labels_ref, temperature, detach_t)
        loss_distil = alpha * loss_distil
        metrics["moe_distill/loss_distil"] = loss_distil
        return loss_distil

    # distilpickteacher
    teacher_type = str(kvs["teachert"])
    pickby = kvs.get("pickby", None)
    t_ids = [scales.index(t) for t in tokscales_t]
    logits_t_list = [logits[i] for i in t_ids]               # [(B, L, V)]

    if teacher_type == "best":
        score_fn = L.SCORE_FNS[str(pickby)] if pickby in L.SCORE_FNS else (
            lambda lg, lb, level: jnp.full((lg.shape[0],), 1.0 / len(t_ids)))
        scores = jnp.stack([score_fn(lg, labels_ref, level="seq")
                            for lg in logits_t_list], axis=1)  # (B, n_t)
        best = jnp.argmax(scores, axis=1)                      # (B,)
        stacked = jnp.stack(logits_t_list, axis=0)             # (n_t, B, L, V)
        logits_t_best = jnp.take_along_axis(
            stacked, best[None, :, None, None], axis=0)[0]
    elif teacher_type == "besttoken":
        score_fn = L.SCORE_FNS[str(pickby)]
        scores = jnp.stack([score_fn(lg, labels_ref, level="token")
                            for lg in logits_t_list], axis=0)  # (n_t, B, L-1)
        scores = jnp.concatenate(
            [scores, jnp.zeros_like(scores[:, :, :1])], axis=2)  # pad to L
        best = jnp.argmax(scores, axis=0)                      # (B, L)
        stacked = jnp.stack(logits_t_list, axis=0)
        logits_t_best = jnp.take_along_axis(
            stacked, best[None, :, :, None], axis=0)[0]
    elif teacher_type == "cd":
        beta = float(kvs["beta"])
        gamma = float(kvs["gamma"])
        if len(logits_t_list) != 2:
            raise ValueError("Only support contrasting two teachers for now.")
        logits_exp, logits_ama = logits_t_list[1], logits_t_list[0]
        logits_t_best = (1 + beta) * logits_exp - beta * logits_ama
        if gamma > 0:
            probs_exp = jax.nn.softmax(logits_exp, axis=-1)
            pmax = probs_exp.max(axis=2, keepdims=True)
            logits_t_best = jnp.where(probs_exp < gamma * pmax, -jnp.inf,
                                      logits_t_best)
    elif teacher_type == "avg":
        logits_t_best = jnp.stack(logits_t_list).mean(0)
    else:
        raise ValueError(f"invalid teacher_type {teacher_type}")

    distil_ignore_mode = int(kvs.get("sametsdistil", 0))
    loss_total = 0.0
    for ts in tokscales_s:
        s_id = scales.index(ts)
        labels_t = labels_ref
        if distil_ignore_mode > 0 and teacher_type in ("best", "besttoken"):
            t_scales = jnp.asarray(tokscales_t)[best]  # (B,) or (B, L)
            if distil_ignore_mode == 1:
                ignore = t_scales == ts
            elif distil_ignore_mode == 2:
                ignore = t_scales <= ts
            else:
                raise ValueError(f"Invalid `distil_ignore_mode` {distil_ignore_mode}")
            if teacher_type == "best":
                ignore = ignore[:, None] & jnp.ones_like(labels_ref, bool)
            from ..constants import IGNORE_INDEX

            labels_t = jnp.where(ignore, IGNORE_INDEX, labels_ref)
        per_student = L.tokenwise_kd_loss(
            logits_t_best, logits[s_id], labels_t, temperature, detach_t,
            reduction="seqlevel_mean")
        loss_total = loss_total + per_student.sum()

    loss_distil = alpha * loss_total
    metrics["moe_distill/loss_distil"] = loss_distil
    return loss_distil
