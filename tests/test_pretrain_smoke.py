"""Stage-1 pretraining smoke: projector-only training on the plain
template (reference: scripts/v1_5/pretrain.sh) must run end-to-end and
save a loadable mm_projector checkpoint."""

import json
import sys

import numpy as np
import pytest


def _write_pretrain_data(tmp_path, n=4):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (48, 48), (180, 40, 40)).save(img_dir / "r.jpg")
    data = [{
        "id": str(i),
        "image": "r.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nWrite a caption."},
            {"from": "gpt", "value": f"a red square number {i}"},
        ],
    } for i in range(n)]
    dpath = tmp_path / "pretrain.json"
    with open(dpath, "w") as f:
        json.dump(data, f)
    return str(dpath), str(img_dir)


def test_pretrain_projector_only(tmp_path, monkeypatch):
    from matryoshka_mm_tpu.train.train import train
    from matryoshka_mm_tpu.utils.checkpoint import load_checkpoint

    dpath, img_dir = _write_pretrain_data(tmp_path)
    out = str(tmp_path / "ckpt")
    monkeypatch.setattr(sys, "argv", [
        "train",
        "--model_name_or_path", "debug://tiny",
        "--version", "plain",
        "--data_path", dpath,
        "--image_folder", img_dir,
        "--tune_mm_mlp_adapter", "True",
        "--output_dir", out,
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "2",
        "--learning_rate", "1e-3",
        "--model_max_length", "128",
        "--save_steps", "100",
        "--report_to", "none",
    ])
    train()

    # final save lands in output_dir itself (reference: train.py:1064-1084)
    restored, meta = load_checkpoint(out)
    assert "mm_projector" in restored
    # projector-only save: the frozen LM/tower are not in the checkpoint
    assert "llama" not in restored

    # the saved projector must drop into a base model (stage-2 handoff)
    from matryoshka_mm_tpu.models.builder import load_pretrained_model

    tok, model, proc, _ = load_pretrained_model("debug://tiny", None, "tiny")
    before = np.asarray(model.params["mm_projector"]["layers"][0]["kernel"],
                        np.float32)
    model.params["mm_projector"] = restored["mm_projector"]
    after = np.asarray(model.params["mm_projector"]["layers"][0]["kernel"],
                       np.float32)
    assert before.shape == after.shape
    ids = np.array([[5, 6, 7]], np.int32)
    out_ids = model.generate(ids, max_new_tokens=3)
    assert out_ids.shape[0] == 1


def test_v0_preprocess_speaker_and_signal():
    """v0 fallback (reference: train.py:319-337, 662-687): '### role: text'
    rounds after the system header; human rounds masked past the signal."""
    from matryoshka_mm_tpu import conversation as conversation_lib
    from matryoshka_mm_tpu.constants import IGNORE_INDEX
    from matryoshka_mm_tpu.train.data import preprocess
    from tests.test_data_pipeline import WordTokenizer

    old = conversation_lib.default_conversation
    conversation_lib.default_conversation = \
        conversation_lib.conv_templates["v0"]
    try:
        tok = WordTokenizer()
        sources = [[
            {"from": "human", "value": "what is this"},
            {"from": "gpt", "value": "a tree"},
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "green leaves everywhere"},
        ]]
        out = preprocess(sources, tok, has_image=False)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert ids.shape == labels.shape
        # some tokens masked (header + human rounds), some kept (gpt rounds)
        assert (labels == IGNORE_INDEX).sum() > 0
        kept = labels[labels != IGNORE_INDEX]
        assert kept.size > 0
        # every gpt answer token survives in the target
        for word in ("tree", "green", "leaves", "everywhere"):
            wid = tok.vocab[word]
            assert wid in kept
        # no human question content survives
        for word in ("color",):
            wid = tok.vocab[word]
            assert wid not in kept
    finally:
        conversation_lib.default_conversation = old
