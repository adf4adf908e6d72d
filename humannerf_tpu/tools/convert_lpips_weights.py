"""Offline converter: torch LPIPS weights -> JAX pytree pickle.

Two sources (both torch checkpoints, loaded with the baked-in torch-cpu):
  * the LPIPS lin heads (reference third_parties/lpips/weights/v0.1/vgg.pth;
    keys lin{0..4}.model.1.weight, shapes (1, C, 1, 1))
  * a torchvision VGG16 state_dict (features.{idx}.weight/bias) -- supply
    one downloaded elsewhere for exact metric parity with the reference.

Usage:
  python -m humannerf_tpu.tools.convert_lpips_weights \
      --lin /path/to/vgg.pth [--vgg16 /path/to/vgg16-397923af.pth] \
      --out lpips_jax.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

# torchvision vgg16.features conv indices per block
VGG16_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def convert(lin_path: str, vgg16_path: str | None, out_path: str,
            seed: int = 1234):
    import torch

    lin_sd = torch.load(lin_path, map_location="cpu")
    lins = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        lins.append(np.asarray(lin_sd[key].numpy(), np.float32))

    from humannerf_tpu.models.lpips import VGG_PLAN
    features = []
    if vgg16_path:
        sd = torch.load(vgg16_path, map_location="cpu")
        # accept either a bare state_dict or {'state_dict': ...}
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        for block_idx in VGG16_CONV_IDX:
            block = []
            for li in block_idx:
                w = np.asarray(sd[f"features.{li}.weight"].numpy(), np.float32)
                b = np.asarray(sd[f"features.{li}.bias"].numpy(), np.float32)
                block.append({"w": w, "b": b})
            features.append(block)
    else:
        # deterministic random trunk (see models/lpips.py docstring)
        rng = np.random.RandomState(seed)
        c_in = 3
        for c_out, n_layers in VGG_PLAN:
            block = []
            for _ in range(n_layers):
                std = np.sqrt(2.0 / (c_in * 9))
                block.append({
                    "w": rng.randn(c_out, c_in, 3, 3).astype(np.float32) * std,
                    "b": np.zeros(c_out, np.float32)})
                c_in = c_out
            features.append(block)

    params = {"features": features, "lins": [{"w": w} for w in lins]}
    with open(out_path, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {out_path} (trunk: "
          f"{'torchvision' if vgg16_path else 'deterministic-random'})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lin", required=True, help="LPIPS lin-head .pth")
    ap.add_argument("--vgg16", default=None, help="torchvision vgg16 .pth")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.lin, args.vgg16, args.out)


if __name__ == "__main__":
    main()
