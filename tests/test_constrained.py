"""Regex -> DFA -> token tables for constrained decoding."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.serve.constrained import (
    build_token_tables,
    compile_regex,
)

pytestmark = pytest.mark.quick


CASES = [
    ("abc", ["abc"], ["ab", "abcd", ""]),
    ("a|bc", ["a", "bc"], ["b", "abc", ""]),
    ("ab*c", ["ac", "abc", "abbbbc"], ["a", "abb"]),
    ("ab+c", ["abc", "abbc"], ["ac", "ab"]),
    ("ab?c", ["ac", "abc"], ["abbc"]),
    ("[a-c]+", ["a", "abcabc"], ["d", ""]),
    ("[^a-c]+", ["xyz", "123"], ["axy", ""]),
    (r"\d{2,4}", ["12", "123", "1234"], ["1", "12345", "1a"]),
    (r"\d{3}", ["407"], ["40", "4070"]),
    (r"(yes|no)( really)?", ["yes", "no really"], ["maybe", "yes r"]),
    (r"-?\d+(\.\d+)?", ["5", "-3.14", "42.0"], ["-", "3.", ".5"]),
    (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"], ["a@b", "a@b.net"]),
    (r'"[^"]*"', ['""', '"hi there"'], ['"', '"a']),
    (r"A|B|C|D", ["A", "C"], ["E", "AB"]),
]


@pytest.mark.parametrize("pattern,good,bad", CASES)
def test_dfa_fullmatch_agrees_with_re(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert re.fullmatch(pattern, s), f"test-case bug: {pattern} {s}"
        assert dfa.fullmatch(s), (pattern, s)
    for s in bad:
        assert not re.fullmatch(pattern, s), f"test-case bug: {pattern} {s}"
        assert not dfa.fullmatch(s), (pattern, s)


def test_dfa_random_strings_vs_re():
    """Fuzz: DFA full-match agrees with re.fullmatch over random strings
    drawn from the pattern alphabet."""
    rng = np.random.default_rng(0)
    for pattern, alphabet in [
        (r"(ab|ba)*", "ab"),
        (r"a[bc]{1,3}d?", "abcd"),
        (r"\d+(\.\d{1,2})?", "0123."),
        (r"x(yz|zy)+x", "xyz"),
    ]:
        dfa = compile_regex(pattern)
        for _ in range(300):
            n = int(rng.integers(0, 8))
            s = "".join(rng.choice(list(alphabet), n)) if n else ""
            assert dfa.fullmatch(s) == bool(re.fullmatch(pattern, s)), \
                (pattern, s)


TOY_VOCAB = ["<pad>", "</s>", "A", "B", "C", "D", "yes", "no", " really",
             "1", "2", ".", "12", " ", "maybe"]
EOS = 1


def test_token_tables_walk():
    dfa = compile_regex(r"(yes|no)( really)?")
    allow, trans = build_token_tables(dfa, TOY_VOCAB, EOS,
                                      special_ids=[0])
    s = dfa.start
    # "yes" allowed at start, "maybe"/" really" not
    assert allow[s, TOY_VOCAB.index("yes")]
    assert allow[s, TOY_VOCAB.index("no")]
    assert not allow[s, TOY_VOCAB.index("maybe")]
    assert not allow[s, TOY_VOCAB.index(" really")]
    assert not allow[s, EOS]                      # empty string not a match
    s2 = trans[s, TOY_VOCAB.index("yes")]
    assert allow[s2, EOS]                         # "yes" is a full match
    assert allow[s2, TOY_VOCAB.index(" really")]
    s3 = trans[s2, TOY_VOCAB.index(" really")]
    assert allow[s3, EOS]
    # nothing may follow " really"
    assert not allow[s3, : EOS].any()
    assert not allow[s3, EOS + 1:].any()


def test_token_tables_multichar_tokens_cross_states():
    """A multi-char token advances through several DFA states at once."""
    dfa = compile_regex(r"\d{3}")
    allow, trans = build_token_tables(dfa, TOY_VOCAB, EOS)
    s = dfa.start
    t12 = TOY_VOCAB.index("12")
    assert allow[s, t12]
    s2 = trans[s, t12]                            # consumed two digits
    t1 = TOY_VOCAB.index("1")
    assert allow[s2, t1]
    s3 = trans[s2, t1]
    assert allow[s3, EOS]
    assert not allow[s3, t1]                      # 4th digit forbidden
    assert not allow[s, TOY_VOCAB.index(".")]


def test_greedy_scan_respects_mask():
    """A jitted greedy loop over the tables only ever emits strings the
    pattern accepts — the on-device form the decode scan uses."""
    dfa = compile_regex(r"(A|B)(C|D)")
    allow, trans = build_token_tables(dfa, TOY_VOCAB, EOS)
    allow_j = jnp.asarray(allow)
    trans_j = jnp.asarray(trans)
    V = len(TOY_VOCAB)

    def run(logits_seq):
        def step(state, logits):
            masked = jnp.where(allow_j[state], logits, -1e30)
            tok = jnp.argmax(masked)
            return trans_j[state, tok], tok

        _, toks = jax.lax.scan(step, jnp.asarray(dfa.start), logits_seq)
        return toks

    rng = np.random.default_rng(3)
    for _ in range(10):
        logits = jnp.asarray(rng.standard_normal((3, V)), jnp.float32)
        toks = np.asarray(jax.jit(run)(logits))
        text = ""
        for t in toks:
            if t == EOS:
                break
            text += TOY_VOCAB[t]
        assert re.fullmatch(r"(A|B)(C|D)", text), (toks, text)
        assert toks[2] == EOS                     # must terminate via eos


def _toy_vocab(v=512):
    """Synthetic decoded-piece table for the tiny model's 512-id vocab:
    ids cycle through a small piece set so every constraint is reachable."""
    pieces = ["A", "B", "C", "D", "yes", "no", " really", "0", "1", "2",
              "3", ".", " ", "x"]
    vocab = ["<pad>", "<s>", "</s>"] + [
        pieces[i % len(pieces)] for i in range(v - 3)]
    return vocab


def test_batcher_constrained_generation():
    """End-to-end: paged batcher output full-matches the regex, terminates
    via eos at an accept state, and unconstrained rows are unaffected."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    vocab = _toy_vocab(cfg.llama.vocab_size)
    gen_cfg = GenerationConfig(max_new_tokens=10, decode_chunk=2,
                               eos_token_id=2, pad_token_id=0)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    ids_txt = rng.integers(5, 100, (1, 8)).astype(np.int32)

    # baseline: unconstrained tokens without any fsm machinery
    plain = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                              max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                              backend="paged", page_size=8)
    try:
        r = plain.submit(ids_txt, None, max_new_tokens=10)
        base = np.concatenate(list(plain.stream(r)))
    finally:
        plain.shutdown()

    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, fsm_vocab=vocab)
    try:
        # bounded quantifiers: an unbounded \d+ lets greedy pick digits
        # until the token budget runs out without ever matching (standard
        # constrained-decoding semantics; the stream ends unmatched)
        for pattern in [r"(yes|no)( really)?", r"(A|B)(C|D)",
                        r"\d{1,3}\.\d"]:
            r1 = b.submit(ids, px, numtoks=4, max_new_tokens=10,
                          constraint_regex=pattern)
            r2 = b.submit(ids_txt, None, max_new_tokens=10)
            t1 = np.concatenate(list(b.stream(r1)))
            t2 = np.concatenate(list(b.stream(r2)))
            text = ""
            hit_eos = False
            for t in t1:
                if t == gen_cfg.eos_token_id:
                    hit_eos = True
                    break
                text += vocab[t]
            assert hit_eos, (pattern, t1, text)
            assert re.fullmatch(pattern, text), (pattern, t1, text)
            # the concurrent unconstrained row decodes exactly as before
            np.testing.assert_array_equal(t2, base)
    finally:
        b.shutdown()


def test_batcher_constraint_validation():
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8)
    try:
        with pytest.raises(ValueError, match="fsm_vocab"):
            b.submit(np.ones((1, 4), np.int32), None,
                     constraint_regex="A+")
    finally:
        b.shutdown()
    with pytest.raises(ValueError, match="paged"):
        ContinuousBatcher(params, cfg, gen_cfg=gen_cfg, backend="dense",
                          fsm_vocab=_toy_vocab(cfg.llama.vocab_size))


def test_json_schema_regex():
    """regex_for_json_schema: generated docs parse as JSON and match the
    schema shape; invalid docs are rejected."""
    import json

    from matryoshka_mm_tpu.serve.constrained import regex_for_json_schema

    schema = {"type": "object", "properties": {
        "answer": {"enum": ["yes", "no"]},
        "confidence": {"type": "number"},
        "tags": {"type": "array", "items": {"type": "string"}},
    }}
    pattern = regex_for_json_schema(schema, max_items=3)
    dfa = compile_regex(pattern)
    good = [
        '{"answer": "yes", "confidence": 0.93, "tags": ["a", "b"]}',
        '{"answer": "no", "confidence": -1, "tags": ["x"]}',
    ]
    bad = [
        '{"answer": "maybe", "confidence": 1, "tags": ["a"]}',
        '{"confidence": 1, "answer": "yes", "tags": ["a"]}',   # key order
        '{"answer": "yes", "confidence": 1, "tags": []}',      # min 1 item
        '{"answer": "yes", "confidence": 1}',                  # missing key
    ]
    for s in good:
        assert dfa.fullmatch(s), s
        parsed = json.loads(s)
        assert parsed["answer"] in ("yes", "no")
    for s in bad:
        assert not dfa.fullmatch(s), s


def test_json_mode_end_to_end_scan():
    """Greedy over random logits under the JSON-schema tables always
    yields parseable JSON of the right shape."""
    import json

    from matryoshka_mm_tpu.serve.constrained import (build_token_tables,
                                                     regex_for_json_schema)

    schema = {"type": "object", "properties": {"ok": {"type": "boolean"},
                                               "n": {"type": "integer"}}}
    pattern = regex_for_json_schema(schema)
    dfa = compile_regex(pattern)
    vocab = ["<pad>", "</s>", "{", "}", '"', "ok", "n", ":", ",", " ",
             "true", "false", "0", "1", "2", "-", '"ok"', '"n":', "3"]
    allow, trans = build_token_tables(dfa, vocab, 1, special_ids=[0])
    rng = np.random.default_rng(7)
    for _ in range(5):
        state, text = dfa.start, ""
        for _step in range(120):
            logits = rng.standard_normal(len(vocab))
            logits = np.where(allow[state], logits, -1e30)
            tok = int(np.argmax(logits))
            if tok == 1:
                break
            text += vocab[tok]
            state = trans[state, tok]
        parsed = json.loads(text)
        assert set(parsed) == {"ok", "n"}
        assert isinstance(parsed["ok"], bool) and isinstance(parsed["n"], int)


def test_batcher_constrained_sampling():
    """Temperature sampling under the mask still full-matches (masked
    logits are -1e30, so forbidden tokens have probability zero)."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    vocab = _toy_vocab(cfg.llama.vocab_size)
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=2, pad_token_id=0,
                               do_sample=True, temperature=0.9)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (1, 6)).astype(np.int32)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, fsm_vocab=vocab)
    try:
        pattern = r"(A|B|C|D){1,3}"
        for _ in range(3):
            r = b.submit(ids, None, max_new_tokens=8,
                         constraint_regex=pattern)
            toks = np.concatenate(list(b.stream(r)))
            text = ""
            for t in toks:
                if t == 2:
                    break
                text += vocab[t]
            assert re.fullmatch(pattern, text), (toks, text)
    finally:
        b.shutdown()


def test_constraint_with_prefix_cache_hit():
    """A constrained request whose prompt prefix is already cached must
    still be constrained (the prefix-hit fast path selects the first
    token before FSM install, so such requests take the full prefill)."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    vocab = _toy_vocab(cfg.llama.vocab_size)
    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=2, pad_token_id=0)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (1, 21)).astype(np.int32)
    ids[0, 2] = IMAGE_TOKEN_INDEX
    px = np.random.default_rng(1).standard_normal(
        (1, 3, 56, 56)).astype(np.float32)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=8, prefix_cache=True,
                          fsm_vocab=vocab)
    try:
        # seed the prefix cache with an unconstrained run of the SAME prompt
        r0 = b.submit(ids, px, numtoks=4, max_new_tokens=8)
        _ = np.concatenate(list(b.stream(r0)))
        # identical prompt WITH a constraint: must not take the hit path
        pattern = r"(A|B)(C|D)"
        r1 = b.submit(ids, px, numtoks=4, max_new_tokens=8,
                      constraint_regex=pattern)
        t1 = np.concatenate(list(b.stream(r1)))
        text = ""
        for t in t1:
            if t == 2:
                break
            text += vocab[t]
        assert re.fullmatch(pattern, text), (t1, text)
    finally:
        b.shutdown()
