from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.mm_utils import get_model_name_from_path, tokenizer_image_token


class FakeTokenizer:
    """Whitespace tokenizer with a BOS, mimicking Llama slow-tokenizer ids."""

    bos_token_id = 1

    def __init__(self, add_bos=True):
        self.add_bos = add_bos
        self.vocab = {}

    def _id(self, word):
        return self.vocab.setdefault(word, 100 + len(self.vocab))

    def __call__(self, text):
        ids = [self._id(w) for w in text.split()]
        if self.add_bos:
            ids = [self.bos_token_id] + ids

        class Out:
            input_ids = ids

        return Out()


def test_single_image_splice():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hello <image> world", tok)
    # BOS kept once, sentinel in the middle, no duplicate BOS from 2nd chunk
    assert ids[0] == 1
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert IMAGE_TOKEN_INDEX in ids
    mid = ids.index(IMAGE_TOKEN_INDEX)
    assert ids[:mid].count(1) == 1 and ids[mid + 1:].count(1) == 0


def test_no_image():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("just text", tok)
    assert IMAGE_TOKEN_INDEX not in ids


def test_two_images():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("a <image> b <image> c", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2


def test_no_bos_tokenizer():
    tok = FakeTokenizer(add_bos=False)
    ids = tokenizer_image_token("a <image> b", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert 1 not in ids


def test_return_np():
    tok = FakeTokenizer()
    arr = tokenizer_image_token("a <image> b", tok, return_tensors="np")
    assert arr.dtype.name == "int32"


def test_model_name_from_path():
    assert get_model_name_from_path("/a/b/llava-v1.5-7b-m3") == "llava-v1.5-7b-m3"
    assert (
        get_model_name_from_path("/a/llava-v1.5-7b/checkpoint-1000")
        == "llava-v1.5-7b_checkpoint-1000"
    )
