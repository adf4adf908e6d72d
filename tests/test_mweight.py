"""Parity: JAX transposed-conv decoder vs torch ConvTranspose3d, and the
softmax-with-log-prior decode (deconv_vol_decoder.py:25-33)."""

import jax
import numpy as np
import pytest

from humannerf_tpu.models.mweight import (_conv_transpose3d,
                                          decode_mweight_volume,
                                          init_mweight_decoder)

torch = pytest.importorskip("torch")


def test_conv_transpose3d_matches_torch():
    rng = np.random.RandomState(0)
    c_in, c_out, s = 6, 4, 3
    x = rng.randn(1, c_in, s, s, s).astype(np.float32)
    w = rng.randn(c_in, c_out, 4, 4, 4).astype(np.float32)
    b = rng.randn(c_out).astype(np.float32)

    got = np.asarray(_conv_transpose3d(x, w, b))

    m = torch.nn.ConvTranspose3d(c_in, c_out, 4, 2, 1)
    m.weight.data = torch.from_numpy(w)
    m.bias.data = torch.from_numpy(b)
    want = m(torch.from_numpy(x)).detach().numpy()

    assert got.shape == want.shape == (1, c_out, 2 * s, 2 * s, 2 * s)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_decoder_output_shape_and_simplex():
    params = init_mweight_decoder(jax.random.key(0), embedding_size=32,
                                  volume_size=8, total_bones=24)
    priors = np.random.RandomState(1).rand(25, 8, 8, 8).astype(np.float32)
    priors /= priors.sum(axis=0, keepdims=True)
    vol = np.asarray(decode_mweight_volume(params, priors))
    assert vol.shape == (25, 8, 8, 8)
    np.testing.assert_allclose(vol.sum(axis=0), 1.0, atol=1e-5)
    assert (vol >= 0).all()


def test_zero_prior_voxels_stay_zero():
    """log(0) = -inf must survive the softmax as an exact zero (torch parity)."""
    params = init_mweight_decoder(jax.random.key(0), embedding_size=16,
                                  volume_size=8, total_bones=24)
    priors = np.full((25, 8, 8, 8), 1.0 / 24, np.float32)
    priors[3] = 0.0
    vol = np.asarray(decode_mweight_volume(params, priors))
    assert (vol[3] == 0).all()
    assert np.isfinite(vol).all()


def test_blockwise_init_is_nearest_neighbor_upsampling():
    """The blockwise ConvTranspose3d init (network_util.py:254-269) makes
    stride-2 cells share one value."""
    from humannerf_tpu.models.init import conv_transpose3d_params
    p = conv_transpose3d_params(jax.random.key(0), 3, 5)
    w = np.asarray(p["w"])
    for d in range(4):
        for h in range(4):
            for k in range(4):
                np.testing.assert_array_equal(
                    w[:, :, d, h, k], w[:, :, d - d % 2, h - h % 2, k - k % 2])
