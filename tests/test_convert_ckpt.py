"""Torch-checkpoint conversion: synthesize a reference-shaped state_dict,
convert, and verify the JAX network reproduces the torch modules' output."""

import numpy as np
import pytest

from humannerf_tpu.tools.convert_torch_ckpt import convert_state_dict

torch = pytest.importorskip("torch")


def _torch_linear(i, o):
    m = torch.nn.Linear(i, o)
    return m


def build_reference_like_network():
    """Minimal torch modules with the reference's state_dict naming."""
    import torch.nn as nn

    class MW(nn.Module):
        def __init__(self):
            super().__init__()
            self.const_embedding = nn.Parameter(torch.randn(16))

            class Dec(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.block_mlp = nn.Sequential(nn.Linear(16, 1024),
                                                   nn.LeakyReLU(0.2))
                    self.block_conv = nn.Sequential(
                        nn.ConvTranspose3d(1024, 512, 4, 2, 1), nn.LeakyReLU(0.2),
                        nn.ConvTranspose3d(512, 512, 4, 2, 1), nn.LeakyReLU(0.2),
                        nn.ConvTranspose3d(512, 256, 4, 2, 1), nn.LeakyReLU(0.2),
                        nn.ConvTranspose3d(256, 256, 4, 2, 1), nn.LeakyReLU(0.2),
                        nn.ConvTranspose3d(256, 25, 4, 2, 1))
            self.decoder = Dec()

    class NR(nn.Module):
        def __init__(self):
            super().__init__()
            self.block_mlps = nn.ModuleList([
                nn.Linear(36 + 69, 128), nn.ReLU(),
                nn.Linear(128, 128), nn.ReLU(),
                nn.Linear(128 + 36, 128), nn.ReLU(),
                nn.Linear(128, 3)])

    class CNL(nn.Module):
        def __init__(self):
            super().__init__()
            self.pts_linears = nn.ModuleList([
                nn.Linear(63, 256), nn.ReLU(),
                nn.Linear(256, 256), nn.ReLU(),
                nn.Linear(256 + 63, 256), nn.ReLU(),
                nn.Linear(256, 256), nn.ReLU()])
            self.output_linear = nn.Sequential(nn.Linear(256, 4))

    class PD(nn.Module):
        def __init__(self):
            super().__init__()
            self.block_mlps = nn.Sequential(
                nn.Linear(69, 64), nn.ReLU(), nn.Linear(64, 64), nn.ReLU(),
                nn.Linear(64, 69))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.mweight_vol_decoder = MW()
            self.non_rigid_mlp = nn.DataParallel(NR())
            self.cnl_mlp = nn.DataParallel(CNL())
            self.pose_decoder = PD()

    return Net()


def test_convert_roundtrip_naming():
    torch.manual_seed(0)
    net = build_reference_like_network()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_state_dict(sd)

    assert params["mweight_vol_decoder"]["const_embedding"].shape == (16,)
    assert params["mweight_vol_decoder"]["block_mlp"]["w"].shape == (16, 1024)
    assert len(params["mweight_vol_decoder"]["block_conv"]) == 5
    assert params["mweight_vol_decoder"]["block_conv"][0]["w"].shape == \
        (1024, 512, 4, 4, 4)
    assert len(params["non_rigid_mlp"]["block_mlps"]) == 3
    assert params["non_rigid_mlp"]["output"]["w"].shape == (128, 3)
    assert len(params["cnl_mlp"]["pts_linears"]) == 4
    assert params["cnl_mlp"]["output"]["w"].shape == (256, 4)
    assert len(params["pose_decoder"]["block_mlps"]) == 2
    assert params["pose_decoder"]["output"]["w"].shape == (64, 69)


def test_converted_mlp_reproduces_torch_forward():
    """Converted canonical-MLP weights must reproduce the torch forward."""
    from humannerf_tpu.models import mlps
    torch.manual_seed(1)
    net = build_reference_like_network()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_state_dict(sd)

    x_np = np.random.RandomState(0).randn(5, 63).astype(np.float32)
    # torch forward with the reference skip layout (skip at linear index 2)
    mod = net.cnl_mlp.module
    h = torch.from_numpy(x_np)
    lins = [m for m in mod.pts_linears if isinstance(m, torch.nn.Linear)]
    for li, lin in enumerate(lins):
        if li == 2:
            h = torch.cat([torch.from_numpy(x_np), h], dim=-1)
        h = torch.relu(lin(h))
    want = mod.output_linear(h).detach().numpy()

    got = np.asarray(mlps.apply_canonical_mlp(
        params["cnl_mlp"], x_np, skips=(1,)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_converted_decoder_reproduces_torch_forward():
    import jax.numpy as jnp
    from humannerf_tpu.models.mweight import decode_mweight_volume
    torch.manual_seed(2)
    net = build_reference_like_network()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_state_dict(sd)

    priors = np.random.RandomState(1).rand(25, 32, 32, 32).astype(np.float32)
    priors /= priors.sum(axis=0, keepdims=True)
    got = np.asarray(decode_mweight_volume(params["mweight_vol_decoder"],
                                           priors))

    mod = net.mweight_vol_decoder
    with torch.no_grad():
        emb = mod.const_embedding[None]
        h = mod.decoder.block_mlp(emb).view(1, 1024, 1, 1, 1)
        dec = mod.decoder.block_conv(h)[0]
        want = torch.softmax(dec + torch.log(torch.from_numpy(priors)),
                             dim=0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
