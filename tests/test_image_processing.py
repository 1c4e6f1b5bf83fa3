import numpy as np
import pytest

from matryoshka_mm_tpu.image_processing import (
    ClipImageProcessor,
    divide_to_patches,
    expand2square,
    get_anyres_image_grid_shape,
    normalize_images_jnp,
    process_anyres_image,
    process_images,
    select_best_resolution,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

PINPOINTS = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]


def _img(w, h, color=(200, 30, 60)):
    return Image.new("RGB", (w, h), color)


def test_select_best_resolution():
    # tall image picks the tall grid that wastes the least area
    assert select_best_resolution((100, 400), PINPOINTS) == (336, 672)
    assert select_best_resolution((400, 100), PINPOINTS) == (672, 336)
    assert select_best_resolution((500, 500), PINPOINTS) == (672, 672)
    # big tall image where effective resolution dominates
    assert select_best_resolution((600, 1800), PINPOINTS) == (336, 1008)


def test_anyres_grid_shape():
    assert get_anyres_image_grid_shape((100, 400), PINPOINTS, 336) == (1, 2)
    assert get_anyres_image_grid_shape((500, 500), PINPOINTS, 336) == (2, 2)


def test_expand2square():
    sq = expand2square(_img(10, 20), (0, 0, 0))
    assert sq.size == (20, 20)
    sq = expand2square(_img(20, 10), (0, 0, 0))
    assert sq.size == (20, 20)
    same = _img(15, 15)
    assert expand2square(same, (0, 0, 0)) is same


def test_divide_to_patches_row_major():
    patches = divide_to_patches(_img(672, 336), 336)
    assert len(patches) == 2


def test_clip_preprocess_shape_and_norm():
    proc = ClipImageProcessor()
    out = proc.preprocess(_img(500, 300))["pixel_values"]
    assert out.shape == (1, 3, 336, 336)
    # uniform color image -> uniform normalized value
    arr = out[0]
    expected_r = (200 / 255 - proc.image_mean[0]) / proc.image_std[0]
    np.testing.assert_allclose(arr[0], expected_r, atol=2e-2)


def test_process_images_pad_mode():
    class Cfg:
        image_aspect_ratio = "pad"

    proc = ClipImageProcessor()
    out = process_images([_img(100, 50)], proc, Cfg())
    assert out.shape == (1, 3, 336, 336)


def test_process_anyres_tile_count():
    proc = ClipImageProcessor()
    out = process_anyres_image(_img(500, 500), proc, PINPOINTS)
    # base + 2x2 grid
    assert out.shape == (5, 3, 336, 336)


def test_normalize_images_jnp_matches_processor():
    proc = ClipImageProcessor()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(2, 336, 336, 3), dtype=np.uint8)
    got = np.asarray(normalize_images_jnp(raw))
    # host reference path
    imgs = [Image.fromarray(raw[i]) for i in range(2)]
    want = proc.preprocess(imgs)["pixel_values"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_preprocess_bitexact_vs_hf_clip_processor():
    """Pixel-bit-exact parity with transformers' CLIPImageProcessor (the
    reference's preprocessing, llava/model/builder.py vision tower setup):
    identical resize bits (the native C++ resampler replicates Pillow's
    8bpc fixed-point pipeline), identical crop and float32 normalize.
    This is the front half of BASELINE.md's temperature-0 answer-match
    north star — any preprocessing drift would cascade into the tower."""
    hf_mod = pytest.importorskip("transformers")
    hf = hf_mod.CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 336}, resample=3,
        do_center_crop=True, crop_size={"height": 336, "width": 336},
        do_rescale=True, do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711])
    ours = ClipImageProcessor()
    rng = np.random.default_rng(0)
    for w, h in [(640, 480), (336, 336), (123, 457), (1024, 768), (50, 50)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        a = hf(img, return_tensors="np")["pixel_values"][0]
        b = ours.preprocess(img)["pixel_values"][0]
        np.testing.assert_array_equal(a, b, err_msg=f"size {(w, h)}")
