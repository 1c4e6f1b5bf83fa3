import numpy as np
import pytest

from matryoshka_mm_tpu.ops.pooling import matryoshka_pool, pooling_matrix


@pytest.mark.parametrize("numtoks", [1, 9, 36, 144, 576])
def test_pool_matches_torch_adaptive_avg_pool(numtoks):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 576, 16)).astype(np.float32)

    got = np.asarray(matryoshka_pool(x, numtoks))

    t = torch.from_numpy(x).view(2, 24, 24, 16).permute(0, 3, 1, 2)
    h = int(numtoks ** 0.5)
    want = F.adaptive_avg_pool2d(t, (h, h)).permute(0, 2, 3, 1).reshape(2, -1, 16).numpy()

    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pool_identity_at_full_scale():
    x = np.random.default_rng(1).standard_normal((1, 576, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(matryoshka_pool(x, 576)), x)


def test_pool_non_divisor_scale_matches_torch():
    # 25 tokens (5x5) does not divide 24 -> exercises floor/ceil windows
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.default_rng(2).standard_normal((1, 576, 4)).astype(np.float32)
    got = np.asarray(matryoshka_pool(x, 25))
    t = torch.from_numpy(x).view(1, 24, 24, 4).permute(0, 3, 1, 2)
    want = F.adaptive_avg_pool2d(t, (5, 5)).permute(0, 2, 3, 1).reshape(1, -1, 4).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pooling_matrix_rows_sum_to_one():
    for h in (1, 3, 5, 6, 12, 24):
        w = np.asarray(pooling_matrix(h, 24))
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


def test_pool_rejects_non_square():
    with pytest.raises(ValueError):
        matryoshka_pool(np.zeros((1, 576, 4), np.float32), 10)
