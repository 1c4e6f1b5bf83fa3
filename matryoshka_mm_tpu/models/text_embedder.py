"""Frozen text embedder for the M3-MoE router's ``textcls`` feature.

The reference wraps a frozen BGE BERT (bge-small-en-v1.5) that encodes the
USER prompt into an L2-normalized CLS embedding (reference: llava/model/
llava_arch.py:56-107 ``TextEmbedder``).  Here the encoder is a functional
JAX BERT with an HF weight converter; prompt extraction keeps the
reference's ``USER: ... ASSISTANT:`` regex.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

PROMPT_PATTERN = re.compile(r"USER:\s*(.*?)\s*ASSISTANT:", re.DOTALL)

TEXT_EMBEDDERS = {"bge15small": "BAAI/bge-small-en-v1.5"}


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384        # bge-small-en-v1.5
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def bge_small(cls):
        return cls()

    @classmethod
    def tiny_debug(cls):
        return cls(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64)


def init_bert_params(rng: jax.Array, cfg: BertConfig) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(rng, 8)

    def dense(key, i, o):
        return {"kernel": jax.random.normal(key, (i, o), jnp.float32) * 0.02,
                "bias": jnp.zeros((o,), jnp.float32)}

    def ln():
        return {"weight": jnp.ones((D,), jnp.float32),
                "bias": jnp.zeros((D,), jnp.float32)}

    def layer(key):
        ks = jax.random.split(key, 6)
        return {
            "attention": {
                "query": dense(ks[0], D, D),
                "key": dense(ks[1], D, D),
                "value": dense(ks[2], D, D),
                "output": dense(ks[3], D, D),
                "output_ln": ln(),
            },
            "intermediate": dense(ks[4], D, I),
            "output": dense(ks[5], I, D),
            "output_ln": ln(),
        }

    layers = jax.vmap(layer)(jax.random.split(keys[0], cfg.num_hidden_layers))
    return {
        "word_embeddings": jax.random.normal(keys[1], (cfg.vocab_size, D), jnp.float32) * 0.02,
        "position_embeddings": jax.random.normal(keys[2], (cfg.max_position_embeddings, D), jnp.float32) * 0.02,
        "token_type_embeddings": jax.random.normal(keys[3], (cfg.type_vocab_size, D), jnp.float32) * 0.02,
        "embeddings_ln": ln(),
        "layers": layers,
    }


def convert_bert(sd, cfg: BertConfig, prefix: str = "") -> dict:
    """HF BertModel state dict -> pytree."""

    def _np(t):
        return t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)

    def dense(k):
        return {"kernel": _np(sd[prefix + k + ".weight"]).T,
                "bias": _np(sd[prefix + k + ".bias"])}

    def ln(k):
        return {"weight": _np(sd[prefix + k + ".weight"]),
                "bias": _np(sd[prefix + k + ".bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "attention": {
                "query": dense(p + "attention.self.query"),
                "key": dense(p + "attention.self.key"),
                "value": dense(p + "attention.self.value"),
                "output": dense(p + "attention.output.dense"),
                "output_ln": ln(p + "attention.output.LayerNorm"),
            },
            "intermediate": dense(p + "intermediate.dense"),
            "output": dense(p + "output.dense"),
            "output_ln": ln(p + "output.LayerNorm"),
        })
    stack = lambda *xs: np.stack(xs, 0)
    layers = jax.tree.map(lambda *xs: np.stack(xs, 0), *layers)
    return {
        "word_embeddings": _np(sd[prefix + "embeddings.word_embeddings.weight"]),
        "position_embeddings": _np(sd[prefix + "embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(sd[prefix + "embeddings.token_type_embeddings.weight"]),
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "layers": layers,
    }


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def bert_forward(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S) ids -> (B, S, D) hidden states (no pooler)."""
    from ..ops.attention import attention_reference

    B, S = input_ids.shape
    D, H = cfg.hidden_size, cfg.num_attention_heads
    Dh = D // H

    x = (params["word_embeddings"][input_ids]
         + params["position_embeddings"][None, :S]
         + params["token_type_embeddings"][0][None, None])
    x = _ln(x, params["embeddings_ln"], cfg.layer_norm_eps)

    def body(h, lp):
        a = lp["attention"]
        q = (h @ a["query"]["kernel"] + a["query"]["bias"]).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        k = (h @ a["key"]["kernel"] + a["key"]["bias"]).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        v = (h @ a["value"]["kernel"] + a["value"]["bias"]).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        out = attention_reference(q, k, v, causal=False,
                                  kv_valid=attention_mask.astype(bool))
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        out = out @ a["output"]["kernel"] + a["output"]["bias"]
        h = _ln(h + out, a["output_ln"], cfg.layer_norm_eps)
        mid = jax.nn.gelu(h @ lp["intermediate"]["kernel"] + lp["intermediate"]["bias"],
                          approximate=False)
        out2 = mid @ lp["output"]["kernel"] + lp["output"]["bias"]
        h = _ln(h + out2, lp["output_ln"], cfg.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def extract_prompts(texts: List[str]) -> List[str]:
    """Pull the USER prompt out of rendered conversations
    (reference: llava_arch.py:88-96)."""
    prompts = []
    for s in texts:
        m = PROMPT_PATTERN.search(s)
        if m:
            prompts.append(m.group(1).strip())
        else:
            print(f"Could not extract prompt for example:\n {s}")
            prompts.append("")
    return prompts


class TextEmbedder:
    """Stateful facade mirroring the reference module: decode VLM ids,
    extract the USER prompt, encode with BERT, return the normalized CLS
    embedding (reference: llava_arch.py:56-107)."""

    def __init__(self, vlm_tokenizer, embedder_name_or_path: Optional[str] = None,
                 params: Optional[dict] = None,
                 cfg: Optional[BertConfig] = None, bert_tokenizer=None):
        self.tokenizer_vlm = vlm_tokenizer
        self.cfg = cfg or BertConfig.bge_small()
        if params is None:
            params = init_bert_params(jax.random.PRNGKey(0), self.cfg)
        self.params = params
        self.bert_tokenizer = bert_tokenizer

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    def _tokenize(self, prompts: List[str]):
        if self.bert_tokenizer is not None:
            enc = self.bert_tokenizer(prompts, padding=True, truncation=True,
                                      return_tensors="np")
            return np.asarray(enc["input_ids"]), np.asarray(enc["attention_mask"])
        # offline fallback: hash words into the BERT vocab, CLS=101 SEP=102
        max_len = max(min(len(p.split()), 62) for p in prompts) + 2
        ids = np.zeros((len(prompts), max_len), np.int32)
        mask = np.zeros((len(prompts), max_len), np.int32)
        for b, p in enumerate(prompts):
            toks = [101] + [hash(w) % (self.cfg.vocab_size - 200) + 150
                            for w in p.split()[:62]] + [102]
            ids[b, : len(toks)] = toks
            mask[b, : len(toks)] = 1
        return ids, mask

    def __call__(self, input_ids: np.ndarray) -> jnp.ndarray:
        """(B, T) VLM input ids -> (B, D) normalized text embedding."""
        ids = np.asarray(input_ids).copy()
        ids[ids < 0] = 0  # strip image sentinels (reference :85)
        texts = self.tokenizer_vlm.batch_decode(ids, skip_special_tokens=True)
        prompts = extract_prompts(texts)
        bert_ids, bert_mask = self._tokenize(prompts)
        hidden = bert_forward(self.params, self.cfg, jnp.asarray(bert_ids),
                              jnp.asarray(bert_mask))
        cls = hidden[:, 0]
        return cls / jnp.linalg.norm(cls, axis=1, keepdims=True)
