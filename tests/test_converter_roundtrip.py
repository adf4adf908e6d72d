"""Full-trunk converter round-trips (VERDICT r1 next-step #10).

Builds the torchvision VGG16 / ResNet34 *architectures* in plain torch with
random weights (torchvision itself is not in this image), runs the real
converters on their state_dicts, and asserts forward parity of the complete
trunks -- so dropping real pretrained weights into the converters later is
a zero-risk operation.

Reference counterparts: third_parties/lpips/pretrained_networks.py:1-180
(vgg16 slices) and core/nets/human_nerf/rgb_feature.py:17-33
(resnet34 children()[:layer+1]).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


# -- torchvision-layout builders -------------------------------------------------

def build_torch_vgg16_features(seed=0):
    """nn.Module whose state_dict matches torchvision vgg16: keys
    features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.weight/bias."""
    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c_in, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    m = VGG()
    # non-trivial biases so bias conversion is exercised
    with torch.no_grad():
        for p in m.parameters():
            p.mul_(0.5)
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                mod.bias.normal_(0, 0.05)
    m.eval()
    return m


def torch_vgg16_taps(m, x):
    """Feature taps at relu1_2/2_2/3_3/4_3/5_3 (pretrained_networks.py
    vgg16 slices: layers [0:4], [4:9], [9:16], [16:23], [23:30])."""
    taps, bounds = [], [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    h = x
    for lo, hi in bounds:
        for i in range(lo, hi):
            h = m.features[i](h)
        taps.append(h)
    return taps


def build_torch_resnet34_trunk(layer=6, seed=1):
    """nn.Module whose state_dict matches torchvision resnet34 through
    children()[:layer+1] (rgb_feature.py:29): conv1/bn1 + layer1..layer3
    for layer=6."""
    torch.manual_seed(seed)

    class BasicBlock(nn.Module):
        def __init__(self, c_in, c_out, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.downsample = None
            if stride != 1 or c_in != c_out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                    nn.BatchNorm2d(c_out))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            chans, blocks = [64, 128, 256, 512], [3, 4, 6, 3]
            c_in = 64
            for s in range(max(0, layer - 3)):
                mods = []
                for b in range(blocks[s]):
                    stride = 2 if (s > 0 and b == 0) else 1
                    mods.append(BasicBlock(c_in if b == 0 else chans[s],
                                           chans[s], stride))
                c_in = chans[s]
                setattr(self, f"layer{s + 1}", nn.Sequential(*mods))
            self.n_stages = max(0, layer - 3)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(self.n_stages):
                x = getattr(self, f"layer{s + 1}")(x)
            return x

    m = Trunk()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.2)
    m.eval()
    return m


# -- round trips --------------------------------------------------------------------

REF_LINS = ("/root/reference/third_parties/lpips/weights/v0.1/vgg.pth")


def test_vgg16_trunk_roundtrip(tmp_path):
    import jax.numpy as jnp

    from humannerf_tpu.models.lpips import (init_lpips_params, lpips_distance,
                                            vgg_features)
    from humannerf_tpu.tools import convert_lpips_weights as conv

    m = build_torch_vgg16_features()
    vgg_path = tmp_path / "vgg16_random.pth"
    torch.save(m.state_dict(), vgg_path)
    out = tmp_path / "lpips_jax.pkl"
    conv.convert(REF_LINS, str(vgg_path), str(out))

    params = init_lpips_params(str(out))
    x_np = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want_taps = torch_vgg16_taps(m, torch.from_numpy(x_np))
    got_taps = vgg_features(params, jnp.asarray(x_np))
    assert len(got_taps) == 5
    for k, (g, w) in enumerate(zip(got_taps, want_taps)):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=2e-4,
                                   err_msg=f"tap {k}")

    # full LPIPS formula parity (lpips.py:84-115) against a torch-side
    # computation through the same converted lin heads
    a_np = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    b_np = np.random.RandomState(2).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    got = float(lpips_distance(params, jnp.asarray(a_np), jnp.asarray(b_np))[0])

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    lin_sd = torch.load(REF_LINS, map_location="cpu")
    with torch.no_grad():
        f0 = torch_vgg16_taps(m, (torch.from_numpy(a_np) - shift) / scale)
        f1 = torch_vgg16_taps(m, (torch.from_numpy(b_np) - shift) / scale)
        want = 0.0
        for k in range(5):
            n0 = f0[k] / (f0[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1[k] / (f1[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1) ** 2
            lin = lin_sd[f"lin{k}.model.1.weight"]
            want += (d * lin).sum(1, keepdim=True).mean().item()
    assert abs(got - want) < 1e-4, (got, want)


def test_resnet34_trunk_roundtrip():
    import jax.numpy as jnp

    from humannerf_tpu.models.resnet import resnet34_features
    from humannerf_tpu.tools.convert_resnet_weights import convert

    m = build_torch_resnet34_trunk(layer=6)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = convert(sd, layer=6)
    assert len(params["stages"]) == 3          # layer=6 -> layer1..layer3

    x_np = np.random.RandomState(3).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x_np)).numpy()
    got = np.asarray(resnet34_features(params, jnp.asarray(x_np)))
    assert got.shape == want.shape == (1, 256, 4, 4)
    np.testing.assert_allclose(got, want, atol=3e-4)
