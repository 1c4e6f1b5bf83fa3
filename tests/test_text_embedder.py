import numpy as np
import pytest

from matryoshka_mm_tpu.models.text_embedder import (
    BertConfig,
    TextEmbedder,
    convert_bert,
    extract_prompts,
)


def test_extract_prompts():
    texts = ["system stuff USER: What is this? ASSISTANT: A cat.",
             "no marker here"]
    assert extract_prompts(texts) == ["What is this?", ""]


def test_bert_parity_vs_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp

    from matryoshka_mm_tpu.models.text_embedder import bert_forward

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = BertConfig.tiny_debug()
    params = convert_bert(hf.state_dict(), cfg)

    ids = np.array([[101, 5, 9, 14, 102, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = np.asarray(bert_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32)))
    # padded positions differ (HF computes them with mask in scores only)
    np.testing.assert_allclose(got[:, :5], want[:, :5], atol=2e-4)


def test_text_embedder_end_to_end():
    from matryoshka_mm_tpu.models.builder import DebugTokenizer

    emb = TextEmbedder(DebugTokenizer(512), cfg=BertConfig.tiny_debug())
    ids = np.array([[1, 200, 201, 202, 203, 204]], np.int32)

    class Tok(DebugTokenizer):
        def batch_decode(self, batch, skip_special_tokens=True):
            return ["sys USER: what color? ASSISTANT:"]

    emb.tokenizer_vlm = Tok(512)
    out = np.asarray(emb(ids))
    assert out.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
