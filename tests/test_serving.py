

def test_sglang_param_mapping():
    from matryoshka_mm_tpu.serve.sglang_worker import _params_from_sglang

    p = _params_from_sglang({
        "text": "USER: <image> hi ASSISTANT:", "image_data": "b64str",
        "sampling_params": {"temperature": 0.7, "max_new_tokens": 32,
                            "top_p": 0.9, "stop": "</s>"},
        "matryoshka_vis_token_scale": "ver=v0_numtoks=4"})
    assert p["prompt"].startswith("USER:")
    assert p["images"] == ["b64str"]        # scalar image wrapped in a list
    assert p["temperature"] == 0.7 and p["top_p"] == 0.9
    assert p["max_new_tokens"] == 32 and p["stop"] == "</s>"
    assert p["matryoshka_vis_token_scale"] == "ver=v0_numtoks=4"
    # no image, defaults
    p2 = _params_from_sglang({"text": "hi"})
    assert p2["images"] is None and p2["temperature"] == 0.0
