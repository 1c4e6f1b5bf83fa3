import json

import numpy as np
import pytest

from matryoshka_mm_tpu import conversation as conversation_lib
from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.train.data import (
    DataArguments,
    DataCollatorForSupervisedDataset,
    LazySupervisedDataset,
    preprocess,
    preprocess_multimodal,
    preprocess_plain,
    preprocess_v1,
)
from matryoshka_mm_tpu.train.sampler import (
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)


class WordTokenizer:
    """Deterministic word tokenizer with vicuna-ish special ids."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    model_max_length = 256
    # legacy=True: per-round BOS stands in for the </s> separator, exactly
    # like the original slow Llama tokenizer the masking arithmetic assumes
    legacy = True

    def __init__(self):
        self.vocab = {}

    def __call__(self, text):
        ids = [self.bos_token_id]
        for w in text.replace("</s>", " </s> ").split():
            ids.append(2 if w == "</s>" else
                       self.vocab.setdefault(w, 100 + len(self.vocab)))

        class Out:
            pass

        o = Out()
        o.input_ids = ids
        return o


@pytest.fixture(autouse=True)
def v1_template():
    old = conversation_lib.default_conversation
    conversation_lib.default_conversation = conversation_lib.conv_templates["v1"]
    yield
    conversation_lib.default_conversation = old


def _sources():
    return [[
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A red cat."},
        {"from": "human", "value": "Are you sure?"},
        {"from": "gpt", "value": "Yes totally sure."},
    ]]


def test_preprocess_multimodal_moves_image_token():
    da = DataArguments(is_multimodal=True)
    src = [[{"from": "human", "value": "What is this? <image>"},
            {"from": "gpt", "value": "A cat."}]]
    out = preprocess_multimodal(src, da)
    assert out[0][0]["value"].startswith("<image>\n")


def test_preprocess_v1_masks_instructions():
    tok = WordTokenizer()
    out = preprocess_v1(_sources(), tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[0] == 1
    assert IMAGE_TOKEN_INDEX in ids
    # answer tokens unmasked, instruction masked
    n_masked = (labels == IGNORE_INDEX).sum()
    n_open = (labels != IGNORE_INDEX).sum()
    assert n_masked > 0 and n_open > 0
    # no tokenization-mismatch wipeout: at least the answers survive
    assert n_open >= 6  # two answers + seps


def test_preprocess_plain():
    tok = WordTokenizer()
    conversation_lib.default_conversation = conversation_lib.conv_templates["plain"]
    src = [[{"from": "human", "value": "<image>"},
            {"from": "gpt", "value": "a photo of a cat"}]]
    out = preprocess_plain(src, tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[1] == IMAGE_TOKEN_INDEX
    # image prefix masked, caption not
    assert (labels[:2] == IGNORE_INDEX).all()
    assert (labels[2:] != IGNORE_INDEX).any()


def test_lazy_dataset_and_collator(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 48), (200, 10, 10)).save(img_dir / "a.jpg")

    data = [
        {"id": "1", "image": "a.jpg", "conversations": [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "Red image."}]},
        {"id": "2", "conversations": [
            {"from": "human", "value": "Say hi."},
            {"from": "gpt", "value": "Hi."}]},
    ]
    data_path = tmp_path / "data.json"
    with open(data_path, "w") as f:
        json.dump(data, f)

    from matryoshka_mm_tpu.image_processing import ClipImageProcessor

    da = DataArguments(data_path=str(data_path), is_multimodal=True,
                       image_folder=str(img_dir), image_aspect_ratio="pad",
                       image_processor=ClipImageProcessor())
    tok = WordTokenizer()
    ds = LazySupervisedDataset(str(data_path), tok, da)
    assert len(ds) == 2
    assert ds.modality_lengths[0] > 0 and ds.modality_lengths[1] < 0

    s0, s1 = ds[0], ds[1]
    assert s0["image"].shape == (3, 336, 336)
    assert s1["image"].shape == (3, 336, 336)  # zero dummy for text-only

    collator = DataCollatorForSupervisedDataset(tok, length_bucket=16)
    batch = collator([s0, s1])
    assert batch["input_ids"].shape[1] % 16 == 0
    assert batch["images"].shape == (2, 3, 336, 336)
    assert batch["attention_mask"].dtype == bool


def test_split_to_even_chunks():
    # indices arrive sorted by length desc (as the sampler provides)
    lengths = [10, 1, 1, 10]
    chunks = split_to_even_chunks([0, 3, 1, 2], lengths, 2)
    totals = [sum(lengths[i] for i in c) for c in chunks]
    assert totals[0] == totals[1] == 11
    # non-divisible falls back to strided split
    chunks = split_to_even_chunks([0, 1, 2], [1, 1, 1], 2)
    assert sorted(i for c in chunks for i in c) == [0, 1, 2]


def test_modality_grouped_sampler():
    lengths = [10, 20, -5, -8, 15, -3, 30, 12]
    rng = np.random.default_rng(0)
    idx = get_modality_length_grouped_indices(lengths, 2, 2, rng)
    assert sorted(idx) == list(range(8))
    sampler = LengthGroupedSampler(2, 2, lengths=lengths,
                                   generator=np.random.default_rng(1),
                                   group_by_modality=True)
    assert sorted(iter(sampler)) == list(range(8))
