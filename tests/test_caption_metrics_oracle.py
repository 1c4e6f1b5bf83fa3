"""Cross-check eval/caption_metrics.py against an independent oracle.

The real pycocoevalcap package is not installable here (no network
egress), so this file transcribes the PUBLISHED pycocoevalcap scorer
algorithms — cider_scorer.py (CIDEr-D), rouge.py (ROUGE-L), and
bleu_scorer.py (corpus BLEU with the 'closest' brevity-penalty option
the COCO pipeline uses) — as a deliberately styled-differently oracle,
and asserts the in-house implementations agree within 1e-3 on a small
corpus.  Inputs are chosen to be PTBTokenizer-neutral (lowercase words,
no punctuation), so the one documented known-difference — the Java
PTBTokenizer vs the regex tokenizer — cannot contribute; with real COCO
captions the tokenizer is the only expected source of drift.
"""

import math
from collections import Counter, defaultdict

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# oracle: pycocoevalcap/cider/cider_scorer.py (CIDEr-D, n=4, sigma=6)
# ---------------------------------------------------------------------------

def _prec_ngrams(words, n=4):
    counts = Counter()
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i:i + k])] += 1
    return counts


def oracle_cider_d(gts, res, n=4, sigma=6.0):
    """gts: {img: [ref sentences]}, res: {img: [one candidate]}."""
    crefs, ctest = [], []
    for img in sorted(gts):
        crefs.append([_prec_ngrams(r.split(), n) for r in gts[img]])
        ctest.append(_prec_ngrams(res[img][0].split(), n))

    doc_freq = defaultdict(float)
    for refs in crefs:
        for ngram in set(ng for ref in refs for ng in ref):
            doc_freq[ngram] += 1
    ref_len = np.log(float(len(crefs)))

    def counts2vec(cnts):
        vec = [defaultdict(float) for _ in range(n)]
        norm = [0.0] * n
        length = 0
        for ngram, term_freq in cnts.items():
            df = np.log(max(1.0, doc_freq[ngram]))
            k = len(ngram) - 1
            vec[k][ngram] = float(term_freq) * (ref_len - df)
            norm[k] += pow(vec[k][ngram], 2)
            if k == 0:
                length += term_freq
        return vec, [np.sqrt(x) for x in norm], length

    def sim(vec_hyp, vec_ref, norm_hyp, norm_ref, length_hyp, length_ref):
        delta = float(length_hyp - length_ref)
        val = np.array([0.0] * n)
        for k in range(n):
            for ngram, count in vec_hyp[k].items():
                val[k] += (min(vec_hyp[k][ngram], vec_ref[k][ngram])
                           * vec_ref[k][ngram])
            if (norm_hyp[k] != 0) and (norm_ref[k] != 0):
                val[k] /= (norm_hyp[k] * norm_ref[k])
            val[k] *= np.e ** (-(delta ** 2) / (2 * sigma ** 2))
        return val

    scores = []
    for test, refs in zip(ctest, crefs):
        vec, norm, length = counts2vec(test)
        score = np.array([0.0] * n)
        for ref in refs:
            vec_ref, norm_ref, length_ref = counts2vec(ref)
            score += sim(vec, vec_ref, norm, norm_ref, length, length_ref)
        score_avg = np.mean(score) / len(refs) * 10.0
        scores.append(score_avg)
    return float(np.mean(scores)), scores


# ---------------------------------------------------------------------------
# oracle: pycocoevalcap/rouge/rouge.py (ROUGE-L, beta=1.2)
# ---------------------------------------------------------------------------

def _my_lcs(string, sub):
    if len(string) < len(sub):
        sub, string = string, sub
    lengths = [[0 for _ in range(len(sub) + 1)]
               for _ in range(len(string) + 1)]
    for j in range(1, len(sub) + 1):
        for i in range(1, len(string) + 1):
            if string[i - 1] == sub[j - 1]:
                lengths[i][j] = lengths[i - 1][j - 1] + 1
            else:
                lengths[i][j] = max(lengths[i - 1][j], lengths[i][j - 1])
    return lengths[len(string)][len(sub)]


def oracle_rouge(candidate, refs, beta=1.2):
    token_c = candidate.split()
    prec, rec = [], []
    for reference in refs:
        token_r = reference.split()
        lcs = _my_lcs(token_r, token_c)
        prec.append(lcs / float(len(token_c)))
        rec.append(lcs / float(len(token_r)))
    prec_max, rec_max = max(prec), max(rec)
    if prec_max != 0 and rec_max != 0:
        return ((1 + beta ** 2) * prec_max * rec_max
                / float(rec_max + beta ** 2 * prec_max))
    return 0.0


# ---------------------------------------------------------------------------
# oracle: pycocoevalcap/bleu/bleu_scorer.py (corpus BLEU, closest-ref BP)
# ---------------------------------------------------------------------------

def oracle_bleu(gts, res, n=4):
    small = 1e-9
    tiny = 1e-15
    totalcomps = {"testlen": 0, "reflen": 0,
                  "guess": [0] * n, "correct": [0] * n}
    for img in sorted(gts):
        test = res[img][0].split()
        testlen = len(test)
        # cook refs: per-ngram max count across refs; closest ref length
        reflens = [len(r.split()) for r in gts[img]]
        maxcounts = {}
        for ref in gts[img]:
            for ngram, count in _prec_ngrams(ref.split(), n).items():
                maxcounts[ngram] = max(maxcounts.get(ngram, 0), count)
        # closest reflen (ties -> min, matching the sorted min() form)
        reflen = min(reflens, key=lambda rl: (abs(rl - testlen), rl))
        counts = _prec_ngrams(test, n)
        totalcomps["testlen"] += testlen
        totalcomps["reflen"] += reflen
        for k in range(1, n + 1):
            totalcomps["guess"][k - 1] += max(0, testlen - k + 1)
        for ngram, count in counts.items():
            totalcomps["correct"][len(ngram) - 1] += min(
                maxcounts.get(ngram, 0), count)
    bleus = []
    logbleu = 0.0
    for k in range(n):
        logbleu += math.log(small + totalcomps["correct"][k]) - \
            math.log(small + totalcomps["guess"][k])
        bleu_k = math.exp(logbleu / (k + 1))
        ratio = (totalcomps["reflen"] + tiny) / (totalcomps["testlen"]
                                                 + small)
        if ratio > 1.0:        # brevity penalty
            bleu_k *= math.exp(1 - ratio)
        bleus.append(bleu_k)
    return bleus


# ---------------------------------------------------------------------------
# the cross-check corpus: PTB-neutral captions (lowercase, no punctuation)
# ---------------------------------------------------------------------------

_GTS = {
    "a": ["a man is riding a brown horse on a beach",
          "a person rides a horse along the shore",
          "someone riding a horse near the ocean"],
    "b": ["two dogs play with a red ball in the park",
          "a pair of dogs chase a ball on the grass",
          "dogs playing fetch with a ball outside"],
    "c": ["a plate of pasta with tomato sauce and basil",
          "spaghetti topped with red sauce on a white plate",
          "a dish of noodles covered in marinara"],
    "d": ["a city street at night with bright neon signs",
          "cars drive down a busy road lit by neon lights",
          "a nighttime urban scene full of glowing signs"],
}
_RES = {
    "a": ["a man riding a horse on the beach"],
    "b": ["two dogs play with a ball in the grass"],
    "c": ["a plate of spaghetti with tomato sauce"],
    "d": ["a busy city street at night with neon signs"],
}


def test_cider_d_matches_pycocoevalcap_algorithm():
    from matryoshka_mm_tpu.eval.caption_metrics import cider_d

    want_corpus, want_per = oracle_cider_d(_GTS, _RES)
    imgs = sorted(_GTS)
    got_corpus, got_per = cider_d([_RES[i][0] for i in imgs],
                                  [_GTS[i] for i in imgs])
    assert got_corpus == pytest.approx(want_corpus, abs=1e-3)
    np.testing.assert_allclose(got_per, want_per, atol=1e-3)


def test_rouge_l_matches_pycocoevalcap_algorithm():
    from matryoshka_mm_tpu.eval.caption_metrics import rouge_l

    for img in sorted(_GTS):
        want = oracle_rouge(_RES[img][0], _GTS[img])
        got = rouge_l(_RES[img][0], _GTS[img])
        assert got == pytest.approx(want, abs=1e-3), img


def test_corpus_bleu_matches_pycocoevalcap_algorithm():
    from matryoshka_mm_tpu.eval.caption_metrics import corpus_bleu

    imgs = sorted(_GTS)
    want = oracle_bleu(_GTS, _RES)
    got = corpus_bleu([_RES[i][0] for i in imgs], [_GTS[i] for i in imgs])
    got4 = [got[f"bleu{k}"] for k in range(1, 5)] \
        if isinstance(got, dict) else list(got)
    np.testing.assert_allclose(got4, want, atol=1e-3)
