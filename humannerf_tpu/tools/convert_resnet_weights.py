"""Convert a torchvision resnet34 state_dict into our JAX trunk pytree.

Usage:
  python -m humannerf_tpu.tools.convert_resnet_weights \
      --ckpt resnet34-b627a593.pth --layer 6 --out resnet34_jax.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from humannerf_tpu.models.resnet import STAGE_BLOCKS


def convert(sd: dict, layer: int = 6) -> dict:
    def conv(name):
        return {"w": np.asarray(sd[f"{name}.weight"], np.float32)}

    def bn(name):
        return {"scale": np.asarray(sd[f"{name}.weight"], np.float32),
                "bias": np.asarray(sd[f"{name}.bias"], np.float32),
                "mean": np.asarray(sd[f"{name}.running_mean"], np.float32),
                "var": np.asarray(sd[f"{name}.running_var"], np.float32)}

    params = {"conv1": conv("conv1"), "bn1": bn("bn1"), "stages": []}
    n_stages = max(0, layer - 3)
    for s in range(n_stages):
        blocks = []
        for b in range(STAGE_BLOCKS[s]):
            pre = f"layer{s + 1}.{b}"
            blk = {"conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
                   "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2"),
                   "stride": 2 if (s > 0 and b == 0) else 1}
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{pre}.downsample.0")
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(blk)
        params["stages"].append(blocks)
    return params


def main():
    import torch
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--layer", type=int, default=6)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    sd = torch.load(args.ckpt, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    with open(args.out, "wb") as f:
        pickle.dump(convert(sd, args.layer), f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
