"""Native C++ image preprocessing: parity with PIL and speed."""

import time

import numpy as np
import pytest

from matryoshka_mm_tpu.native import (
    clip_preprocess_native,
    native_available,
    resize_bicubic_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _pil_reference(rgb, target_short, crop, mean, std):
    from PIL import Image

    im = Image.fromarray(rgb)
    w, h = im.size
    short = min(w, h)
    scale = target_short / short
    if w <= h:
        nw, nh = target_short, int(h * scale)
    else:
        nh, nw = target_short, int(w * scale)
    im = im.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - crop) // 2, (nh - crop) // 2
    im = im.crop((left, top, left + crop, top + crop))
    arr = np.asarray(im, np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1)


def test_resize_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (97, 133, 3), np.uint8)
    # BIT-EXACT with PIL: the native resampler replicates Pillow's 8bpc
    # fixed-point two-pass algorithm, including the uint8 intermediate
    # clipping between passes (up- and down-scales, both axes)
    for oh, ow in [(48, 64), (200, 260), (336, 461), (97, 133)]:
        got = resize_bicubic_native(rgb, oh, ow)
        want = np.asarray(Image.fromarray(rgb).resize((ow, oh),
                                                      Image.BICUBIC))
        np.testing.assert_array_equal(got, want)


def test_clip_preprocess_matches_pil_pipeline():
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (412, 517, 3), np.uint8)
    got = clip_preprocess_native(rgb, 336, 336, mean, std)
    want = _pil_reference(rgb, 336, 336, mean, std)
    assert got.shape == want.shape == (3, 336, 336)
    # bit-exact: same resample bits, same float32 normalize op order
    np.testing.assert_array_equal(got, want)


def test_processor_uses_native_and_agrees():
    from PIL import Image

    from matryoshka_mm_tpu.image_processing import ClipImageProcessor

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (400, 300, 3), np.uint8)
    proc = ClipImageProcessor()
    out = proc.preprocess(Image.fromarray(rgb))["pixel_values"]
    want = _pil_reference(rgb, 336, 336, proc.image_mean, proc.image_std)
    np.testing.assert_array_equal(out[0], want)


def test_native_faster_than_pil():
    from PIL import Image

    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (768, 1024, 3), np.uint8)

    # best-of-N per side: robust to scheduler noise when the suite shares
    # the box's single CPU core with other work
    t_native = min(_timed(clip_preprocess_native, rgb, mean, std)
                   for _ in range(3))
    t_pil = min(_timed(_pil_reference, rgb, mean, std) for _ in range(3))
    print(f"native {t_native:.3f}s vs pil {t_pil:.3f}s")
    # informational; native should at least be in the same ballpark
    assert t_native < t_pil * 3


def _timed(fn, rgb, mean, std):
    t0 = time.perf_counter()
    for _ in range(5):
        fn(rgb, 336, 336, mean, std)
    return time.perf_counter() - t0
