"""MLP architecture/init tests + parity of the layer plumbing vs a torch
transcription of the reference module structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.models import mlps
from humannerf_tpu.models.embedders import fourier_embed_dim

torch = pytest.importorskip("torch")


def test_canonical_mlp_shapes_and_skip():
    input_ch = fourier_embed_dim(10)  # 63
    params = mlps.init_canonical_mlp(jax.random.key(0), input_ch=input_ch)
    layers = params["pts_linears"]
    assert len(layers) == 8
    assert layers[0]["w"].shape == (63, 256)
    assert layers[5]["w"].shape == (256 + 63, 256)  # skip at reference i=4
    assert params["output"]["w"].shape == (256, 4)

    x = np.random.RandomState(0).randn(17, 63).astype(np.float32)
    out = mlps.apply_canonical_mlp(params, x)
    assert out.shape == (17, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_canonical_mlp_matches_torch_transcription():
    """Same weights loaded into a torch stack with reference layer layout
    (mlp_rgb_sigma.py:64-99,163-166) -> identical outputs."""
    input_ch, width = 63, 256
    params = mlps.init_canonical_mlp(jax.random.key(1), input_ch=input_ch)

    lins = []
    for p in params["pts_linears"] + [params["output"]]:
        w = torch.from_numpy(np.asarray(p["w"]).T.copy())
        m = torch.nn.Linear(w.shape[1], w.shape[0])
        m.weight.data = w
        m.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
        lins.append(m)

    x_np = np.random.RandomState(1).randn(9, input_ch).astype(np.float32)
    x = torch.from_numpy(x_np)
    h = x
    for li in range(8):
        if li == 5:  # reference skip: cat([pos_embed, h]) before 6th linear
            h = torch.cat([x, h], dim=-1)
        h = torch.relu(lins[li](h))
    want = lins[8](h).detach().numpy()

    got = np.asarray(mlps.apply_canonical_mlp(params, x_np))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nonrigid_mlp_starts_as_identity():
    """Tiny-init last layer => offsets ~0 at init (mlp_offset.py:60-66)."""
    pos_dim = 36
    params = mlps.init_nonrigid_mlp(jax.random.key(0), pos_embed_size=pos_dim)
    assert len(params["block_mlps"]) == 6
    assert params["block_mlps"][4]["w"].shape == (128 + 36, 128)
    rng = np.random.RandomState(0)
    embed = rng.randn(11, pos_dim).astype(np.float32)
    xyz = rng.randn(11, 3).astype(np.float32)
    cc = rng.randn(69).astype(np.float32)
    out = mlps.apply_nonrigid_mlp(params, embed, xyz, cc)
    assert np.abs(np.asarray(out["offsets"])).max() < 1e-2
    np.testing.assert_allclose(np.asarray(out["xyz"]), xyz, atol=1e-2)


def test_nonrigid_mlp_matches_torch_transcription():
    pos_dim, cc_dim, width = 36, 69, 128
    params = mlps.init_nonrigid_mlp(jax.random.key(2), pos_embed_size=pos_dim)
    lins = []
    for p in params["block_mlps"] + [params["output"]]:
        w = torch.from_numpy(np.asarray(p["w"]).T.copy())
        m = torch.nn.Linear(w.shape[1], w.shape[0])
        m.weight.data = w
        m.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
        lins.append(m)

    rng = np.random.RandomState(2)
    embed_np = rng.randn(7, pos_dim).astype(np.float32)
    xyz_np = rng.randn(7, 3).astype(np.float32)
    cc_np = rng.randn(cc_dim).astype(np.float32)

    embed = torch.from_numpy(embed_np)
    cc = torch.from_numpy(np.tile(cc_np, (7, 1)))
    h = torch.cat([cc, embed], dim=-1)     # mlp_offset.py:77
    for li in range(6):
        if li == 4:                         # cat([h, pos_embed]) at skip
            h = torch.cat([h, embed], dim=-1)
        h = torch.relu(lins[li](h))
    want = lins[6](h).detach().numpy()

    got = np.asarray(mlps.apply_nonrigid_mlp(params, embed_np, xyz_np, cc_np)
                     ["offsets"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pose_refiner_identity_at_init():
    params = mlps.init_pose_refiner(jax.random.key(0))
    posevec = np.random.RandomState(0).randn(69).astype(np.float32) * 0.3
    out = mlps.apply_pose_refiner(params, posevec)
    assert out["Rs"].shape == (23, 3, 3)
    np.testing.assert_allclose(np.asarray(out["Rs"]),
                               np.tile(np.eye(3), (23, 1, 1)), atol=1e-2)


def test_xavier_gain_scaling():
    """ReLU-followed layers get sqrt(2) gain (network_util.py:272-291)."""
    from humannerf_tpu.models.init import xavier_uniform_linear
    w_relu = xavier_uniform_linear(jax.random.key(0), 256, 256, np.sqrt(2))
    w_lin = xavier_uniform_linear(jax.random.key(0), 256, 256, 1.0)
    np.testing.assert_allclose(np.asarray(w_relu),
                               np.asarray(w_lin) * np.sqrt(2),
                               rtol=1e-5, atol=1e-7)
    bound = np.sqrt(2) * np.sqrt(2.0 / 512) * np.sqrt(3)
    assert np.abs(np.asarray(w_relu)).max() <= bound + 1e-6
