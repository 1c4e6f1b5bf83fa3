import numpy as np
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IGNORE_INDEX
from matryoshka_mm_tpu.train import losses as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

B, S, V, K = 3, 7, 11, 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, S, V)).astype(np.float32)
    labels = rng.integers(0, V, (B, S)).astype(np.int32)
    labels[:, :2] = IGNORE_INDEX
    labels[0, -1] = IGNORE_INDEX
    return logits, labels


def _torch_ce_unreduced(logits, labels):
    lg = torch.from_numpy(logits)[..., :-1, :].contiguous()
    lb = torch.from_numpy(labels.astype(np.int64))[..., 1:].contiguous()
    losses = F.cross_entropy(lg.view(-1, V), lb.view(-1),
                             reduction="none", ignore_index=IGNORE_INDEX)
    return losses.view(B, S - 1).numpy(), (lb != IGNORE_INDEX).numpy()


def test_lm_loss_micro(data):
    logits, labels = data
    lg = torch.from_numpy(logits)[..., :-1, :].contiguous()
    lb = torch.from_numpy(labels.astype(np.int64))[..., 1:].contiguous()
    want = F.cross_entropy(lg.view(-1, V), lb.view(-1),
                           ignore_index=IGNORE_INDEX).item()
    got = float(L.lm_loss(jnp.asarray(logits), jnp.asarray(labels), "micro"))
    assert abs(got - want) < 1e-5


def test_lm_loss_macro(data):
    logits, labels = data
    losses, valid = _torch_ce_unreduced(logits, labels)
    want = ((losses * valid).sum(1) / (valid.sum(1) + 1e-8)).mean()
    got = float(L.lm_loss(jnp.asarray(logits), jnp.asarray(labels), "macro"))
    assert abs(got - want) < 1e-5


def test_lm_loss_weighted_micro(data):
    logits, labels = data
    w = np.array([0.2, 0.5, 0.3], np.float32)
    losses, valid = _torch_ce_unreduced(logits, labels)
    want = ((losses * valid).sum(1) * w).sum() / (valid.sum() + 1e-8)
    got = float(L.lm_loss_weighted(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(w), "micro"))
    assert abs(got - want) < 1e-5


def test_lm_loss_unreduced_mean_equals_reduced(data):
    logits, labels = data
    unred = L.lm_loss_unreduced(jnp.asarray(logits), jnp.asarray(labels), "micro")
    red = L.lm_loss(jnp.asarray(logits), jnp.asarray(labels), "micro")
    assert abs(float(unred.mean()) - float(red)) < 1e-5


def test_seq_scores_against_torch(data):
    logits, labels = data
    losses, valid = _torch_ce_unreduced(logits, labels)
    want_lp = -(losses * valid).sum(1)
    got_lp = np.asarray(L.compute_seq_logprob(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got_lp, want_lp, atol=1e-4)

    lg = torch.from_numpy(logits)[..., :-1, :]
    lb = torch.from_numpy(labels.astype(np.int64))[..., 1:]
    mask = (lb != IGNORE_INDEX)
    preds = lg.argmax(-1)
    want_acc = ((preds == lb).float() * mask).sum(1) / mask.sum(1)
    got_acc = np.asarray(L.compute_seq_accuracy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got_acc, want_acc.numpy(), atol=1e-5)

    # brier via the reference's explicit one-hot formula (llava_trainer.py:850-867)
    probs = torch.softmax(lg, -1)
    onehot = F.one_hot(lb * mask, num_classes=V)
    want_brier = (((probs - onehot) ** 2).sum(-1) * mask).sum(1) / mask.sum(1)
    got_brier = np.asarray(L.compute_seq_brier(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got_brier, want_brier.numpy(), atol=1e-4)


def test_kd_loss_against_torch(data):
    logits, labels = data
    rng = np.random.default_rng(1)
    logits_t = rng.standard_normal((B, S, V)).astype(np.float32)
    T = 2.0
    got = float(L.tokenwise_kd_loss(jnp.asarray(logits_t), jnp.asarray(logits),
                                    jnp.asarray(labels), T, True))
    st = torch.from_numpy(logits)[..., :-1, :]
    tt = torch.from_numpy(logits_t)[..., :-1, :]
    lb = torch.from_numpy(labels.astype(np.int64))[..., 1:]
    mask = (lb != IGNORE_INDEX).float()
    lp_s = F.log_softmax(st / T, -1)
    p_t = torch.softmax(tt / T, -1)
    ce = (-p_t * lp_s).sum(-1)
    want = ((ce * mask).sum() / (mask.sum() + 1e-8) * T ** 2).item()
    assert abs(got - want) < 1e-4


def test_switch_loss():
    gp = jnp.asarray(np.random.default_rng(2).dirichlet(np.ones(K), size=B))
    assign = L.per_expert_assignment(gp)
    cost = L.get_per_expert_cost("count", assign, [1, 9, 36, 144])
    loss = L.switch_load_balance_loss(gp, cost, alpha=0.01)
    want = 0.01 * K * float((np.asarray(cost) * np.asarray(gp).mean(0)).sum())
    assert abs(float(loss) - want) < 1e-6


def test_per_expert_cost_types():
    assign = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    scales = [1, 9, 36, 144]
    for t in ["count", "numtoks", "lognumtoks", "count*numtoks", "count*lognumtoks"]:
        c = np.asarray(L.get_per_expert_cost(t, assign, scales))
        assert c.shape == (4,)
        assert np.isfinite(c).all()
    np.testing.assert_allclose(
        np.asarray(L.get_per_expert_cost("numtoks", assign, scales)),
        np.asarray(scales) / np.sum(scales))


def test_bounderr_zero_when_argmax_is_max_scale():
    losses_lm = jnp.asarray([[3.0, 2.0, 1.0]])
    onehot_last = jnp.asarray([[0.0, 0.0, 1.0]])
    assert float(L.bounderr_loss(losses_lm, onehot_last, 0.0, False)) == 0.0
    worse = jnp.asarray([[1.0, 0.0, 0.0]])
    assert float(L.bounderr_loss(losses_lm, worse, 0.0, False)) == 2.0


def test_beta_logprob_matches_torch():
    gp = jnp.asarray([[0.3, 0.7], [0.9, 0.1]])
    got = float(L.beta_logprob_loss(gp, alpha=0.1, beta_a=2.0, beta_b=3.0))
    dist = torch.distributions.Beta(2.0, 3.0)
    want = 0.1 * dist.log_prob(torch.tensor([0.7, 0.1])).sum().item()
    assert abs(got - want) < 1e-4


def test_chunked_ce_matches_unchunked():
    """chunked_token_cross_entropy == token_cross_entropy(lm_head(hidden))."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    Bc, Sc, D, Vc = 2, 11, 8, 13
    hidden = jnp.asarray(rng.standard_normal((Bc, Sc, D)).astype(np.float32))
    # lm head stored (vocab, D) — torch orientation (models/llama.py)
    w = jnp.asarray(rng.standard_normal((Vc, D)).astype(np.float32))
    labels = rng.integers(0, Vc, (Bc, Sc)).astype(np.int32)
    labels[:, :3] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    logits = (hidden @ w.T).astype(jnp.float32)
    want_ce, want_valid = L.token_cross_entropy(logits, labels)
    got_ce, got_valid = L.chunked_token_cross_entropy(hidden, w, labels, chunk=4)
    np.testing.assert_allclose(np.asarray(got_ce), np.asarray(want_ce), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(want_valid))
