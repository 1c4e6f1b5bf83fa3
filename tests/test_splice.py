import numpy as np
import pytest

from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.ops.splice import splice_multimodal


def reference_splice(input_ids, text_embeds, image_features, labels, attn_mask, out_len,
                     padding_side="right"):
    """Straight numpy transcription of the reference's ragged loop
    (llava_arch.py:607-719) for golden-value comparison."""
    B, T = input_ids.shape
    D = text_embeds.shape[-1]
    _, M, N, _ = image_features.shape
    new_embeds, new_labels = [], []
    for b in range(B):
        ids = input_ids[b][attn_mask[b].astype(bool)]
        embs = text_embeds[b][attn_mask[b].astype(bool)]
        labs = labels[b][attn_mask[b].astype(bool)]
        cur_e, cur_l = [], []
        img_idx = 0
        for t_i, tok in enumerate(ids):
            if tok == IMAGE_TOKEN_INDEX:
                cur_e.append(image_features[b, img_idx])
                cur_l.append(np.full(N, IGNORE_INDEX, np.int32))
                img_idx += 1
            else:
                cur_e.append(embs[t_i:t_i + 1])
                cur_l.append(labs[t_i:t_i + 1])
        e = np.concatenate(cur_e, 0)[:out_len]
        l = np.concatenate(cur_l, 0)[:out_len]
        new_embeds.append(e)
        new_labels.append(l)

    L = out_len
    out_e = np.zeros((B, L, D), np.float32)
    out_l = np.full((B, L), IGNORE_INDEX, np.int32)
    out_m = np.zeros((B, L), bool)
    out_p = np.zeros((B, L), np.int32)
    for b in range(B):
        n = len(new_embeds[b])
        if padding_side == "right":
            out_e[b, :n] = new_embeds[b]
            out_l[b, :n] = new_labels[b]
            out_m[b, :n] = True
            out_p[b, :n] = np.arange(n)
        else:
            out_e[b, L - n:] = new_embeds[b]
            out_l[b, L - n:] = new_labels[b]
            out_m[b, L - n:] = True
            out_p[b, L - n:] = np.arange(n)
    return out_e, out_l, out_m, out_p


def _make_batch(rng, B, T, M, N, D, n_img_per_row, pad_per_row):
    input_ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    attn_mask = np.ones((B, T), bool)
    labels = rng.integers(5, 100, (B, T)).astype(np.int32)
    for b in range(B):
        # left padding in the input (as in batched generation)
        p = pad_per_row[b]
        attn_mask[b, :p] = False
        positions = rng.choice(np.arange(p, T), size=n_img_per_row[b], replace=False)
        input_ids[b, positions] = IMAGE_TOKEN_INDEX
    text_embeds = rng.standard_normal((B, T, D)).astype(np.float32)
    image_features = rng.standard_normal((B, M, N, D)).astype(np.float32)
    return input_ids, text_embeds, image_features, labels, attn_mask


@pytest.mark.parametrize("padding_side", ["right", "left"])
def test_splice_matches_reference(padding_side):
    rng = np.random.default_rng(0)
    B, T, M, N, D = 3, 12, 2, 4, 5
    ids, emb, feats, labs, mask = _make_batch(
        rng, B, T, M, N, D, n_img_per_row=[1, 2, 0], pad_per_row=[0, 2, 3]
    )
    L = 24
    got = splice_multimodal(ids, emb, feats, labels=labs, attn_mask=mask,
                            out_len=L, padding_side=padding_side)
    want_e, want_l, want_m, want_p = reference_splice(
        ids, emb, feats, labs, mask, L, padding_side
    )
    np.testing.assert_allclose(np.asarray(got.embeds), want_e, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels), want_l)
    np.testing.assert_array_equal(np.asarray(got.attn_mask), want_m)
    np.testing.assert_array_equal(np.asarray(got.position_ids), want_p)


def test_splice_truncation():
    rng = np.random.default_rng(1)
    B, T, M, N, D = 2, 8, 1, 6, 3
    ids, emb, feats, labs, mask = _make_batch(
        rng, B, T, M, N, D, n_img_per_row=[1, 1], pad_per_row=[0, 0]
    )
    L = 10  # 8 - 1 + 6 = 13 > 10 -> truncate
    got = splice_multimodal(ids, emb, feats, labels=labs, attn_mask=mask, out_len=L)
    want_e, want_l, want_m, _ = reference_splice(ids, emb, feats, labs, mask, L)
    np.testing.assert_allclose(np.asarray(got.embeds), want_e, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels), want_l)
    assert np.asarray(got.lengths).tolist() == [13, 13]
    np.testing.assert_array_equal(np.asarray(got.attn_mask), want_m)


def test_splice_lengths():
    rng = np.random.default_rng(2)
    ids, emb, feats, labs, mask = _make_batch(
        rng, 2, 10, 1, 576, 4, n_img_per_row=[1, 1], pad_per_row=[0, 4]
    )
    got = splice_multimodal(ids, emb, feats, labels=labs, attn_mask=mask, out_len=600)
    assert np.asarray(got.lengths).tolist() == [10 - 1 + 576, 6 - 1 + 576]


def test_splice_jit_compiles_once_per_shape():
    import jax

    rng = np.random.default_rng(3)
    ids, emb, feats, labs, mask = _make_batch(
        rng, 2, 10, 1, 4, 8, n_img_per_row=[1, 1], pad_per_row=[0, 0]
    )
    f = jax.jit(lambda *a: splice_multimodal(*a, labels=None, attn_mask=None, out_len=16))
    out1 = f(ids, emb, feats)
    out2 = f(ids + 1 - 1, emb, feats)
    np.testing.assert_allclose(np.asarray(out1.embeds), np.asarray(out2.embeds))
