from matryoshka_mm_tpu.conversation import SeparatorStyle, conv_templates


def test_registry_complete():
    for name in ["default", "v0", "v1", "vicuna_v1", "llama_2", "mistral_instruct",
                 "chatml_direct", "mistral_direct", "plain", "v0_plain", "llava_v0",
                 "v0_mmtag", "llava_v1", "v1_mmtag", "llava_llama_2", "mpt"]:
        assert name in conv_templates


def test_vicuna_v1_prompt():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is this?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt == (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
        " USER: <image>\nWhat is this? ASSISTANT:"
    )


def test_vicuna_v1_multiturn():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "hello")
    conv.append_message(conv.roles[0], "bye")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.endswith("USER: hi ASSISTANT: hello</s>USER: bye ASSISTANT:")


def test_plain_prompt():
    conv = conv_templates["plain"].copy()
    conv.append_message(conv.roles[0], "<image>\n")
    conv.append_message(conv.roles[1], "a photo of a cat")
    assert conv.sep_style == SeparatorStyle.PLAIN
    # sep2 is None -> only first-message sep rendered before idx-1 fails;
    # plain pretraining sets sep2 via preprocess_plain, here check sep joining
    conv.sep2 = "\n"
    assert conv.get_prompt() == "<image>\n\na photo of a cat\n"


def test_llama2_prompt():
    conv = conv_templates["llava_llama_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.startswith("[INST] <<SYS>>\n")
    assert p.endswith("hello [/INST]")


def test_mpt_prompt():
    conv = conv_templates["mpt"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "<|im_start|>user\nhi<|im_end|>" in p
    assert p.endswith("<|im_start|>assistant\n")


def test_image_tuple_first_message():
    """A first user message carrying an image tuple renders with the
    <image>\\n prefix; mmtag templates render the tagged exchange."""
    from PIL import Image

    img = Image.new("RGB", (48, 32), (200, 10, 10))
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], ("what is this? <image>", img, "Pad"))
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "USER: <image>\nwhat is this? ASSISTANT:" in p

    conv = conv_templates["v1_mmtag"].copy()
    conv.append_message(conv.roles[0], ("<image>\ndescribe", img, "Default"))
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "USER: <Image><image></Image> ASSISTANT: Received.</s>" in p
    assert "USER: describe ASSISTANT:" in p


def test_process_image_and_get_images():
    from PIL import Image
    import base64
    from io import BytesIO

    img = Image.new("RGB", (48, 32), (5, 6, 7))
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], ("hi <image>", img, "Pad"))
    conv.append_message(conv.roles[1], "an image")

    pils = conv.get_images(return_pil=True)
    assert len(pils) == 1
    assert pils[0].size == (48, 48)          # Pad -> square

    b64s = conv.get_images(return_pil=False)
    round_trip = Image.open(BytesIO(base64.b64decode(b64s[0])))
    assert round_trip.size == (48, 48)

    # Resize mode forces 336x336; oversized images are capped
    big = Image.new("RGB", (2000, 1000), 0)
    assert conv.process_image(big, "Resize", return_pil=True).size == (336, 336)
    capped = conv.process_image(big, "Default", return_pil=True)
    assert max(capped.size) <= 1344

    import pytest
    with pytest.raises(ValueError):
        conv.process_image(img, "Nonsense")


def test_dict_strips_image_payloads():
    from PIL import Image

    img = Image.new("RGB", (8, 8), 0)
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], ("hello <image>", img, "Default"))
    conv.append_message(conv.roles[1], "hi")
    d = conv.dict()
    assert d["messages"][0][1] == "hello <image>"   # text only, no PIL
    assert d["messages"][1][1] == "hi"
    assert d["sep2"] == "</s>"


def test_llama2_multiturn_exact():
    conv = conv_templates["mistral_instruct"].copy()
    conv.append_message(conv.roles[0], "a")
    conv.append_message(conv.roles[1], "b")
    conv.append_message(conv.roles[0], "c")
    conv.append_message(conv.roles[1], None)
    # empty system + empty sep: INST blocks joined by assistant replies
    assert conv.get_prompt() == "[INST] a [/INST] b </s>[INST] c [/INST]"
