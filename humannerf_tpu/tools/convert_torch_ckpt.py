"""Convert a reference torch checkpoint (latest.tar) into our param pytree.

The reference saves {'iter', 'network': state_dict, 'optimizer'}
(trainer.py:356-364). State-dict naming (checked against the reference
module definitions):

  mweight_vol_decoder.const_embedding
  mweight_vol_decoder.decoder.block_mlp.0.{weight,bias}
  mweight_vol_decoder.decoder.block_conv.{0,2,4,6,8}.{weight,bias}
  non_rigid_mlp.module.block_mlps.{0,2,...}.{weight,bias}   (DataParallel)
  cnl_mlp.module.pts_linears.{0,2,...}.{weight,bias}        (DataParallel)
  cnl_mlp.module.output_linear.0.{weight,bias}
  pose_decoder.block_mlps.{0,2,...}.{weight,bias}

Linear weights transpose to our (in, out) layout; ConvTranspose3d weights
keep the torch (I, O, kD, kH, kW) layout (models/mweight.py consumes it).

Usage:
  python -m humannerf_tpu.tools.convert_torch_ckpt \
      --ckpt latest.tar --cfg experiment.yaml --out latest.ckpt
"""

from __future__ import annotations

import argparse
import pickle
import re

import numpy as np


def _collect_indexed(sd: dict, prefix: str):
    """All '{prefix}.{i}.weight' linears sorted by i -> [{'w','b'}, ...]."""
    idx = sorted({int(m.group(1))
                  for k in sd
                  if (m := re.match(re.escape(prefix) + r"\.(\d+)\.weight$", k))})
    out = []
    for i in idx:
        w = np.asarray(sd[f"{prefix}.{i}.weight"], np.float32)
        b = np.asarray(sd.get(f"{prefix}.{i}.bias", np.zeros(w.shape[0])),
                       np.float32)
        out.append({"w": w, "b": b})
    return out


def _lin(entry):
    return {"w": entry["w"].T.copy(), "b": entry["b"]}


def convert_state_dict(sd: dict) -> dict:
    """Torch state_dict (numpy values) -> our param pytree (numpy leaves)."""
    sd = {k.replace(".module.", "."): v for k, v in sd.items()}
    params = {}

    # motion-weight volume decoder
    mw = {"const_embedding": np.asarray(
        sd["mweight_vol_decoder.const_embedding"], np.float32)}
    mlp0 = _collect_indexed(sd, "mweight_vol_decoder.decoder.block_mlp")
    mw["block_mlp"] = _lin(mlp0[0])
    convs = _collect_indexed(sd, "mweight_vol_decoder.decoder.block_conv")
    mw["block_conv"] = [{"w": c["w"], "b": c["b"]} for c in convs]  # torch layout
    params["mweight_vol_decoder"] = mw

    # non-rigid offset MLP: last linear is the tiny-init output layer
    nr = _collect_indexed(sd, "non_rigid_mlp.block_mlps")
    params["non_rigid_mlp"] = {
        "block_mlps": [_lin(e) for e in nr[:-1]],
        "output": _lin(nr[-1]),
    }

    # canonical MLP
    cnl_lins = _collect_indexed(sd, "cnl_mlp.pts_linears")
    cnl = {"pts_linears": [_lin(e) for e in cnl_lins]}
    if "cnl_mlp.output_linear.0.weight" in sd:
        cnl["output"] = _lin(_collect_indexed(sd, "cnl_mlp.output_linear")[0])
    else:  # view-dir / pose-color heads
        def seq(prefix):
            return [_lin(e) for e in _collect_indexed(sd, prefix)]
        cnl["output_density"] = seq("cnl_mlp.output_linear_density")[0]
        cnl["output_rgb_1"] = seq("cnl_mlp.output_linear_rgb_1")[0]
        rgb2 = seq("cnl_mlp.output_linear_rgb_2")
        cnl["output_rgb_2a"], cnl["output_rgb_2b"] = rgb2[0], rgb2[1]
    params["cnl_mlp"] = cnl

    # pose refiner
    pd = _collect_indexed(sd, "pose_decoder.block_mlps")
    if pd:
        params["pose_decoder"] = {
            "block_mlps": [_lin(e) for e in pd[:-1]],
            "output": _lin(pd[-1]),
        }
    return params


def load_torch_checkpoint(path: str):
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["network"].items()}
    return int(ckpt.get("iter", 0)), sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .tar checkpoint")
    ap.add_argument("--out", required=True, help="output .ckpt (our format)")
    args = ap.parse_args()
    it, sd = load_torch_checkpoint(args.ckpt)
    params = convert_state_dict(sd)
    with open(args.out, "wb") as f:
        pickle.dump({"iter": it, "params": params, "opt_state": None}, f)
    print(f"converted iter={it} -> {args.out}")


if __name__ == "__main__":
    main()
