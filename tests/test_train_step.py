import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
from matryoshka_mm_tpu.train.train_step import M3Batch, m3_loss, multiscale_forward
from matryoshka_mm_tpu.train.trainer import create_train_state, host_metrics, make_train_step


def _batch(cfg, B=2, T=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :6] = IGNORE_INDEX  # mask the "prompt"
    px = rng.standard_normal(
        (B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                   jnp.ones((B, T), bool))


def test_multiscale_forward_shapes():
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    logits, labels, gp, losses_lm, ce, valid = multiscale_forward(
        params, cfg, batch)
    K = len(cfg.tokscale_list)
    assert logits.shape[0] == K and labels.shape[0] == K
    assert losses_lm.shape == (2, K)
    assert ce.shape[:2] == (K, 2)
    assert gp is None


def test_bucketed_forward_matches_uniform_buffer():
    """The CE path buckets scales into near-native buffer lengths (the
    round-4 train-MFU fix); forcing the single uniform buffer via
    ``out_len`` must give the same per-scale losses — the buffers differ
    only in left-padding, which every reduction masks out."""
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    from matryoshka_mm_tpu.models.llava import splice_capacity

    buf_len = splice_capacity(cfg, batch.input_ids.shape[1],
                              max(cfg.tokscale_list))
    _, lab_b, _, lm_b, ce_b, va_b = multiscale_forward(
        params, cfg, batch, need_logits=False)
    _, lab_u, _, lm_u, ce_u, va_u = multiscale_forward(
        params, cfg, batch, need_logits=False, out_len=buf_len)
    assert ce_b.shape == ce_u.shape and lab_b.shape == lab_u.shape
    np.testing.assert_array_equal(np.asarray(lab_b), np.asarray(lab_u))
    np.testing.assert_array_equal(np.asarray(va_b), np.asarray(va_u))
    np.testing.assert_allclose(np.asarray(ce_b), np.asarray(ce_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lm_b), np.asarray(lm_u),
                               rtol=2e-5, atol=2e-5)


def test_m3_loss_uniform_buffer_knob_matches_bucketed():
    """The `uniform_buffer` train-step knob (round 5: the bucketed
    forward's heterogeneous temps fragment the TPU allocator and OOM at
    K=3/T=256/B=4, where the uniform buffer fits) must be a pure memory/
    padding trade: identical loss and metrics."""
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss_b, met_b = m3_loss(params, cfg, batch)
    loss_u, met_u = m3_loss(params, cfg, batch, uniform_buffer=True)
    np.testing.assert_allclose(np.asarray(loss_b), np.asarray(loss_u),
                               rtol=2e-5, atol=2e-5)
    for k in met_b:
        np.testing.assert_allclose(np.asarray(met_b[k]),
                                   np.asarray(met_u[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_frozen_vision_same_loss_zero_vision_grads():
    """frozen_vision must not change the loss value (it only cuts the
    differentiation path INTO the tower) and must zero the vision-tower
    grads while keeping projector/backbone grads alive."""
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss_a, _ = m3_loss(params, cfg, batch)
    loss_f, _ = m3_loss(params, cfg, batch, frozen_vision=True)
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_f),
                               rtol=1e-6, atol=1e-6)

    g = jax.grad(lambda p: m3_loss(p, cfg, batch, frozen_vision=True)[0])(
        params)
    vt = jax.tree_util.tree_leaves(g["vision_tower"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in vt)
    proj_norm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["mm_projector"]))
    llm_norm = sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(g["llama"]))
    assert proj_norm > 0 and llm_norm > 0


def test_m3_loss_plain_equals_mean_of_scales():
    """Without MoE, loss == mean over scales of per-scale LM loss
    (llava_llama.py:327-329 with K divisor)."""
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss, metrics = m3_loss(params, cfg, batch)
    from matryoshka_mm_tpu.train.losses import lm_loss

    logits, labels, _, _, _, _ = multiscale_forward(params, cfg, batch)
    want = np.mean([float(lm_loss(logits[k], labels[k])) for k in
                    range(len(cfg.tokscale_list))])
    assert abs(float(loss) - want) < 1e-5
    assert "moe/loss_lm_0" in metrics


@pytest.mark.parametrize("moe,expect_keys", [
    ("t=dense_ft=cls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count",
     ["moe_load/loss_switch"]),
    ("t=dense_ft=cls_obj=bounderr_margin=0.0",
     ["moe_bounderr/loss_diff_avg"]),
    ("t=dense_ft=cls_obj=lmlossaddcost_lambda=0.1_costt=numtoks", []),
    ("t=dense_ft=cls_obj=weightedlm_loadb=argmaxcost_alpha=1.0_costt=numtoks_tval=0.5_emaa=0.9",
     ["moe_load/loss_argmaxcost", "moe_load/argmaxcost_ema"]),
    ("t=dense_ft=cls_obj=distil_temp=2.0_alpha=0.5_detacht=1_tss=[1,4]_tst=[16]",
     ["moe_distill/loss_distil"]),
    ("t=dense_ft=cls_obj=distilpickteacher_temp=2.0_alpha=0.5_detacht=1_tss=[1]_tst=[4,16]_teachert=best_pickby=logprob",
     ["moe_distill/loss_distil"]),
    ("t=dense_ft=cls_obj=distilpickteacher_temp=2.0_alpha=0.5_detacht=1_tss=[1]_tst=[4,16]_teachert=besttoken_pickby=entropy",
     ["moe_distill/loss_distil"]),
    ("t=dense_ft=cls_obj=distilpickteacher_temp=2.0_alpha=0.5_detacht=1_tss=[1]_tst=[4,16]_teachert=cd_beta=0.5_gamma=0.1",
     ["moe_distill/loss_distil"]),
    ("t=dense_ft=cls_obj=distilpickteacher_temp=2.0_alpha=0.5_detacht=1_tss=[1]_tst=[4,16]_teachert=avg",
     ["moe_distill/loss_distil"]),
])
def test_moe_objectives_finite(moe, expect_keys):
    cfg = LlavaConfig.tiny_debug(moe=moe)
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    loss, metrics = m3_loss(params, cfg, batch, argmaxcost_ema=jnp.float32(-1))
    assert np.isfinite(float(loss)), moe
    for k in expect_keys:
        assert k in metrics, (moe, sorted(metrics))
        assert np.isfinite(float(metrics[k]))
    # gating metrics always present for MoE
    assert "moe/avg_gating_prob_0" in metrics


def test_betalogprob_two_scales():
    cfg = LlavaConfig.tiny_debug(
        moe="t=dense_ft=cls_obj=weightedlm_loadb=betalogprob_alpha=0.01_ba=2.0_bb=2.0",
        scales=(4, 16))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    loss, metrics = m3_loss(params, cfg, _batch(cfg))
    assert "moe_load/loss_beta_logprob" in metrics
    assert np.isfinite(float(loss))


def test_train_step_updates_params_and_ema():
    cfg = LlavaConfig.tiny_debug(
        moe="t=dense_ft=cls_obj=weightedlm_loadb=argmaxcost_alpha=1.0_costt=numtoks_tval=0.5_emaa=0.9")
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10,
                              router_lr=1e-2)
    state, tx = create_train_state(params, opt_cfg)
    step = make_train_step(cfg, tx, donate=False)
    batch = _batch(cfg)

    state1, metrics = step(state, batch)
    m = host_metrics(metrics)
    assert np.isfinite(m["loss"]) and m["grad_norm"] > 0
    assert float(state1.step) == 1
    assert float(state1.argmaxcost_ema) >= 0  # EMA initialized

    # params changed where trainable
    before = np.asarray(params["llama"]["lm_head"])
    after = np.asarray(state1.params["llama"]["lm_head"])
    assert not np.allclose(before, after)
    # vision tower frozen by default
    b = np.asarray(params["vision_tower"]["class_embedding"])
    a = np.asarray(state1.params["vision_tower"]["class_embedding"])
    np.testing.assert_array_equal(b, a)

    state2, _ = step(state1, _batch(cfg, seed=1))
    assert float(state2.step) == 2


def test_freeze_groups():
    cfg = LlavaConfig.tiny_debug(moe="t=dense_ft=cls_obj=weightedlm")
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, tune_router=True)
    state, tx = create_train_state(params, opt_cfg)
    step = make_train_step(cfg, tx, donate=False)
    state1, _ = step(state, _batch(cfg))
    # only the router moves
    assert not np.allclose(np.asarray(params["router"]["fc1"]["kernel"]),
                           np.asarray(state1.params["router"]["fc1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(params["llama"]["lm_head"]),
                                  np.asarray(state1.params["llama"]["lm_head"]))


def test_remat_policy_dots_matches_full_remat():
    """remat_policy="dots" / "names:attn" (save selected dot outputs,
    recompute the rest) must be numerically invisible: same loss and
    gradients as full remat (models/llama.py llama_forward remat branch)."""
    import dataclasses

    cfg0 = LlavaConfig.tiny_debug()
    batch = _batch(cfg0, T=24)
    outs = {}
    policies = ("", "dots", "names:attn", "names:attn_q,flash_lse")
    for pol in policies:
        cfg = dataclasses.replace(
            cfg0, llama=dataclasses.replace(cfg0.llama, remat=True,
                                            remat_policy=pol))
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        loss, grads = jax.jit(
            jax.value_and_grad(lambda p, c=cfg: m3_loss(p, c, batch)[0])
        )(params)
        outs[pol] = (float(loss), grads)
    for pol in policies[1:]:
        assert abs(outs[""][0] - outs[pol][0]) < 1e-5, pol
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                               - b.astype(jnp.float32)))),
            outs[""][1], outs[pol][1])
        assert max(jax.tree.leaves(diffs)) < 1e-4, pol


def test_remat_policy_unknown_is_loud():
    import dataclasses

    cfg0 = LlavaConfig.tiny_debug()
    cfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(cfg0.llama, remat=True,
                                        remat_policy="typo"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    with pytest.raises(ValueError, match="remat_policy"):
        jax.jit(lambda p: m3_loss(p, cfg, batch)[0])(params)
