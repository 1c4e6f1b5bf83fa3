"""Training loss library.

Pure-function re-implementations of every objective in the reference:

* LM losses, micro/macro, weighted, unreduced
  (reference: llava/model/language_model/llava_llama.py:40-138);
* sequence scoring functions logprob/accuracy/brier/entropy
  (reference: llava/train/llava_trainer.py:813-886);
* token-wise knowledge distillation (llava_trainer.py:903-941);
* gating-prob softening and per-expert cost schedules
  (llava_trainer.py:946-981);
* MoE load-balance and router objectives: switch, argmaxcost, betalogprob,
  bounderr(sq), lmlossaddcost (llava_trainer.py:466-794).

All functions are jit-safe and batch-global: under pjit data parallelism the
batch axis is already the global batch, so the reference's explicit
``dist.all_gather`` of gating statistics (llava_trainer.py:479-481) becomes
an ordinary mean over the batch dimension.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX

_EPS = 1e-8


def _shift(logits: jnp.ndarray, labels: jnp.ndarray):
    """Align logits[t] with labels[t+1] (next-token prediction)."""
    return logits[..., :-1, :], labels[..., 1:]


def token_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(B, S-1) per-token CE with invalid labels zeroed; also returns mask."""
    shift_logits, shift_labels = _shift(logits, labels)
    valid = shift_labels != IGNORE_INDEX
    # clamp to vocab so out-of-range labels can't poison the gather with NaN
    safe = jnp.clip(jnp.where(valid, shift_labels, 0), 0,
                    logits.shape[-1] - 1)
    logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, -ll, 0.0), valid


def lm_loss(logits, labels, lm_loss_type: str = "micro") -> jnp.ndarray:
    """Scalar LM loss (reference: llava_llama.py:40-72)."""
    losses, valid = token_cross_entropy(logits, labels)
    if lm_loss_type == "micro":
        return losses.sum() / jnp.maximum(valid.sum(), 1)
    if lm_loss_type == "macro":
        per_seq = losses.sum(-1) / (valid.sum(-1) + _EPS)
        return per_seq.mean()
    raise ValueError(f"invalid lm_loss_type = {lm_loss_type}")


def lm_loss_weighted(logits, labels, sample_weights,
                     lm_loss_type: str = "micro") -> jnp.ndarray:
    """LM loss weighted per sample by gating prob
    (reference: llava_llama.py:75-111)."""
    losses, valid = token_cross_entropy(logits, labels)
    w = sample_weights.reshape(losses.shape[0]).astype(jnp.float32)
    if lm_loss_type == "micro":
        per_seq = losses.sum(-1) * w
        return per_seq.sum() / (valid.sum() + _EPS)
    if lm_loss_type == "macro":
        per_seq = losses.sum(-1) / (valid.sum(-1) + _EPS) * w
        return per_seq.mean()
    raise ValueError(f"invalid lm_loss_type = {lm_loss_type}")


def chunked_token_cross_entropy(hidden: jnp.ndarray, lm_head_w,
                                labels: jnp.ndarray,
                                chunk: int = 256):
    """Per-token CE computed from hidden states WITHOUT materializing the
    (B, S, V) float32 logits — the dominant training-memory term at
    ctx 2048+576 with V=32000 (the reference materializes and even concats
    K scale copies, llava_llama.py:342).

    The sequence is processed in chunks: each chunk projects to logits,
    reduces to per-token CE, and the logits are freed.  Returns
    ((B, S-1) ce, (B, S-1) valid) matching :func:`token_cross_entropy`.
    """
    from ..models.llama import proj

    B, S, D = hidden.shape
    shift_hidden = hidden[:, :-1, :]
    shift_labels = labels[..., 1:]
    Sm1 = S - 1
    pad = (-Sm1) % chunk
    h = jnp.pad(shift_hidden, ((0, 0), (0, pad), (0, 0)))
    l = jnp.pad(shift_labels, ((0, 0), (0, pad)),
                constant_values=IGNORE_INDEX)
    n_chunks = (Sm1 + pad) // chunk
    h = h.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    l = l.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    # jax.checkpoint on the body: WITHOUT it the scan's backward saves the
    # (B, chunk, V) f32 logprobs of EVERY chunk as residuals — the full
    # (B, S, V) logits memory this function exists to avoid (measured
    # ~2.7GB at the K=5/T=2048 bench shape).  Rematerializing costs one
    # extra lm_head matmul per chunk in the bwd; the analytic softmax
    # gradient (softmax - onehot) then flows through the recomputed chunk.
    @jax.checkpoint
    def body(carry, hl):
        hc, lc = hl
        logits = proj(hc, lm_head_w).astype(jnp.float32)   # (B, chunk, V)
        valid = lc != IGNORE_INDEX
        safe = jnp.clip(jnp.where(valid, lc, 0), 0, logits.shape[-1] - 1)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
        return carry, (jnp.where(valid, -ll, 0.0), valid)

    _, (ce, valid) = jax.lax.scan(body, None, (h, l))
    ce = ce.transpose(1, 0, 2).reshape(B, Sm1 + pad)[:, :Sm1]
    valid = valid.transpose(1, 0, 2).reshape(B, Sm1 + pad)[:, :Sm1]
    return ce, valid


def chunked_lm_loss_unreduced(hidden, lm_head_w, labels,
                              lm_loss_type: str = "micro",
                              chunk: int = 256) -> jnp.ndarray:
    """(B,) per-sample loss from hidden states, logits never materialized."""
    losses, valid = chunked_token_cross_entropy(hidden, lm_head_w, labels, chunk)
    if lm_loss_type == "micro":
        per_seq = losses.sum(-1)
        return per_seq * per_seq.shape[0] / (valid.sum() + _EPS)
    if lm_loss_type == "macro":
        return losses.sum(-1) / (valid.sum(-1) + _EPS)
    raise ValueError(f"invalid lm_loss_type = {lm_loss_type}")


def lm_loss_unreduced(logits, labels, lm_loss_type: str = "micro") -> jnp.ndarray:
    """(B,) per-sample losses whose mean equals the reduced loss
    (reference: llava_llama.py:114-138)."""
    losses, valid = token_cross_entropy(logits, labels)
    if lm_loss_type == "micro":
        per_seq = losses.sum(-1)
        return per_seq * per_seq.shape[0] / (valid.sum() + _EPS)
    if lm_loss_type == "macro":
        return losses.sum(-1) / (valid.sum(-1) + _EPS)
    raise ValueError(f"invalid lm_loss_type = {lm_loss_type}")


# ---------------------------------------------------------------------------
# sequence scoring (teacher selection)
# ---------------------------------------------------------------------------

def compute_seq_logprob(logits, labels, level: str = "seq"):
    """reference: llava_trainer.py:813-830."""
    losses, valid = token_cross_entropy(logits, labels)
    lp = jnp.where(valid, -losses, 0.0)
    return lp if level == "token" else lp.sum(-1)


def compute_seq_accuracy(logits, labels, level: str = "seq"):
    """reference: llava_trainer.py:833-847."""
    shift_logits, shift_labels = _shift(logits, labels)
    valid = shift_labels != IGNORE_INDEX
    preds = jnp.argmax(shift_logits, axis=-1)
    correct = jnp.where(valid, (preds == shift_labels).astype(jnp.float32), 0.0)
    if level == "token":
        return correct
    return correct.sum(-1) / jnp.maximum(valid.sum(-1), 1)


def compute_seq_brier(logits, labels, level: str = "seq"):
    """reference: llava_trainer.py:850-867."""
    shift_logits, shift_labels = _shift(logits, labels)
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    probs = jax.nn.softmax(shift_logits.astype(jnp.float32), axis=-1)
    p_true = jnp.take_along_axis(probs, safe[..., None], axis=-1)[..., 0]
    # sum_c (p_c - y_c)^2 = sum p^2 - 2 p_true + 1
    brier = (probs * probs).sum(-1) - 2.0 * p_true + 1.0
    brier = jnp.where(valid, brier, 0.0)
    if level == "token":
        return brier
    return brier.sum(-1) / jnp.maximum(valid.sum(-1), 1)


def compute_seq_entropy(logits, labels, level: str = "seq"):
    """reference: llava_trainer.py:870-886."""
    shift_logits, shift_labels = _shift(logits, labels)
    valid = shift_labels != IGNORE_INDEX
    probs = jax.nn.softmax(shift_logits.astype(jnp.float32), axis=-1)
    logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    ent = jnp.where(valid, -(probs * logprobs).sum(-1), 0.0)
    if level == "token":
        return ent
    return ent.sum(-1) / jnp.maximum(valid.sum(-1), 1)


SCORE_FNS = {
    "logprob": compute_seq_logprob,
    "accuracy": compute_seq_accuracy,
    "brier": lambda *a, **k: -compute_seq_brier(*a, **k),
    "entropy": lambda *a, **k: -compute_seq_entropy(*a, **k),
}


# ---------------------------------------------------------------------------
# distillation
# ---------------------------------------------------------------------------

def tokenwise_kd_loss(logits_t, logits_s, labels_t, temperature: float,
                      detach_teacher_grad: bool, reduction: str = "mean"):
    """Soft-target CE between teacher and student distributions
    (reference: llava_trainer.py:903-941).

    Unlike the reference, caller guarantees equal sequence lengths (all
    scales are spliced into a shared left-aligned buffer, see train_step).
    """
    if detach_teacher_grad:
        logits_t = jax.lax.stop_gradient(logits_t)
    shift_s, shift_labels = _shift(logits_s, labels_t)
    shift_t, _ = _shift(logits_t, labels_t)
    logprob_s = jax.nn.log_softmax(shift_s.astype(jnp.float32) / temperature, axis=-1)
    prob_t = jax.nn.softmax(shift_t.astype(jnp.float32) / temperature, axis=-1)
    ce = -(prob_t * logprob_s).sum(-1)                       # (B, S-1)
    valid = shift_labels != IGNORE_INDEX
    ce = jnp.where(valid, ce, 0.0)
    if reduction == "mean":
        return ce.sum() / (valid.sum() + _EPS) * (temperature ** 2)
    if reduction == "seqlevel_mean":
        return ce.sum(-1) / (valid.sum() + _EPS) * (temperature ** 2)
    raise ValueError(f"invalid reduction {reduction}")


# ---------------------------------------------------------------------------
# router / load-balance pieces
# ---------------------------------------------------------------------------

def compute_gating_prob_argmax(gating_prob: jnp.ndarray, tau: float = 1.0
                               ) -> jnp.ndarray:
    """Soft 'argmax' of the gating distribution
    (reference: llava_trainer.py:946-953 — softmax with temperature)."""
    return jax.nn.softmax(gating_prob / tau, axis=-1)


def per_expert_assignment(gating_prob: jnp.ndarray) -> jnp.ndarray:
    """(K,) fraction of the (global) batch argmax-assigned to each expert
    (reference: llava_trainer.py:486-488)."""
    K = gating_prob.shape[1]
    one_hot = jax.nn.one_hot(jnp.argmax(gating_prob, axis=1), K)
    return one_hot.mean(axis=0)


def get_per_expert_cost(per_expert_cost_type: str,
                        batch_per_expert_assignment: jnp.ndarray,
                        tokscales) -> jnp.ndarray:
    """(K,) cost vector (reference: llava_trainer.py:956-981)."""
    scales = jnp.asarray(tokscales, jnp.float32)
    if per_expert_cost_type == "count":
        return batch_per_expert_assignment
    if per_expert_cost_type == "numtoks":
        return scales / scales.sum()
    if per_expert_cost_type == "lognumtoks":
        c = jnp.log(scales + 1)
        return c / c.sum()
    if per_expert_cost_type == "count*numtoks":
        c = batch_per_expert_assignment * (scales / scales.sum())
        return c / c.sum()
    if per_expert_cost_type == "count*lognumtoks":
        ln = jnp.log(scales + 1)
        c = batch_per_expert_assignment * (ln / ln.sum())
        return c / c.sum()
    raise ValueError(f"per_expert_cost_type={per_expert_cost_type} not supported.")


def switch_load_balance_loss(gating_prob: jnp.ndarray, per_expert_cost: jnp.ndarray,
                             alpha: float) -> jnp.ndarray:
    """Switch-Transformer aux loss: alpha * K * sum(cost * mean_gate)
    (reference: llava_trainer.py:731-737)."""
    K = gating_prob.shape[1]
    return alpha * K * (per_expert_cost * gating_prob.mean(axis=0)).sum()


def beta_logprob_loss(gating_prob: jnp.ndarray, alpha: float,
                      beta_a: float, beta_b: float) -> jnp.ndarray:
    """Beta-prior log-prob on the 2-expert gate
    (reference: llava_trainer.py:783-794)."""
    p = jnp.clip(gating_prob[:, 1], 1e-6, 1 - 1e-6)
    from jax.scipy.special import betaln

    log_prob = ((beta_a - 1) * jnp.log(p) + (beta_b - 1) * jnp.log1p(-p)
                - betaln(beta_a, beta_b))
    return alpha * log_prob.sum()


def bounderr_loss(losses_lm: jnp.ndarray, gating_prob_argmax: jnp.ndarray,
                  margin: float, squared: bool) -> jnp.ndarray:
    """Hinge on loss(argmax scale) - loss(largest scale)
    (reference: llava_trainer.py:498-512).  losses_lm: (B, K)."""
    losses_argmax = (losses_lm * gating_prob_argmax).sum(1)
    losses_max_scale = losses_lm[:, -1]
    diff = jnp.maximum(losses_argmax - losses_max_scale - margin, 0.0)
    return (jnp.square(diff) if squared else diff).mean()


def lmlossaddcost_loss(losses_lm: jnp.ndarray, gating_prob: jnp.ndarray,
                       per_expert_cost: jnp.ndarray, lamb: float) -> jnp.ndarray:
    """Expected (LM loss + lambda*cost) under the gate
    (reference: llava_trainer.py:520-531).  losses_lm: (B, K)."""
    K = losses_lm.shape[1]
    losses = losses_lm + lamb * per_expert_cost.reshape(1, K)
    return (losses * gating_prob).sum(1).mean()


def argmaxcost_ema_loss(gating_prob_argmax: jnp.ndarray,
                        per_expert_cost: jnp.ndarray,
                        batch_argmaxcost: jnp.ndarray,
                        alpha: float,
                        target_value: Optional[float],
                        numtoks_margin: Optional[float]) -> jnp.ndarray:
    """Squared budget penalty with straight-through batch statistics
    (reference: llava_trainer.py:743-780).

    ``batch_argmaxcost`` is the (possibly EMA-smoothed) global-batch average
    cost; the local ``argmaxcost`` keeps the gradient path:
    loss = alpha * sq(clip(batch - sg(local) + local - target)).
    """
    K = gating_prob_argmax.shape[1]
    argmaxcost = (gating_prob_argmax * per_expert_cost.reshape(-1, K)).sum(1).mean()
    straight_through = (batch_argmaxcost - jax.lax.stop_gradient(argmaxcost)
                        + argmaxcost)
    if target_value is not None:
        return alpha * jnp.square(straight_through - target_value)
    return alpha * jnp.square(jnp.maximum(straight_through - numtoks_margin, 0.0))
