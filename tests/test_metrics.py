"""Metrics sanity + SSIM parity against the textbook formula."""

import numpy as np

from humannerf_tpu.utils.metrics import (MetricsWriter, _uniform_filter,
                                         compute_psnr, compute_ssim)


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(compute_psnr(a, b), 20.0, atol=1e-6)
    assert compute_psnr(a, a) == float("inf") or compute_psnr(a, a) > 100


def test_uniform_filter_interior_matches_mean():
    rng = np.random.RandomState(0)
    x = rng.rand(16, 16)
    f = _uniform_filter(x, 7)
    np.testing.assert_allclose(f[8, 8], x[5:12, 5:12].mean(), atol=1e-10)
    np.testing.assert_allclose(f[3, 3], x[0:7, 0:7].mean(), atol=1e-10)


def test_ssim_self_is_one_and_symmetric():
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3)
    b = np.clip(a + rng.randn(32, 32, 3) * 0.05, 0, 1)
    assert compute_ssim(a, a) > 0.9999
    np.testing.assert_allclose(compute_ssim(a, b), compute_ssim(b, a),
                               atol=1e-9)
    assert compute_ssim(a, b) < compute_ssim(a, a)


def test_ssim_matches_skimage_if_available():
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        return
    rng = np.random.RandomState(2)
    a = rng.rand(48, 48, 3)
    b = np.clip(a + rng.randn(48, 48, 3) * 0.1, 0, 1)
    want = structural_similarity(a, b, channel_axis=-1, data_range=2.0)
    np.testing.assert_allclose(compute_ssim(a, b), want, atol=1e-6)


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path), "exp", "ds", metrics=("psnr", "ssim"))
    rng = np.random.RandomState(0)
    a = rng.rand(16, 16, 3).astype(np.float32)
    w.append("f0", a, a)
    w.append("f1", a, np.clip(a + 0.1, 0, 1))
    avg = w.finalize()
    assert set(avg) == {"psnr", "ssim"}
    text = (tmp_path / "exp-metrics.perimg.txt").read_text()
    assert "f0" in text and "f1" in text


def test_ssim_jax_matches_numpy_impl():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from humannerf_tpu.train.loss import ssim_jax
    rng = np.random.RandomState(5)
    a = rng.rand(2, 24, 24, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 24, 24, 3) * 0.1, 0, 1).astype(np.float32)
    got = np.asarray(ssim_jax(a, b))
    for i in range(2):
        want = compute_ssim(a[i], b[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)
