"""Offline wild-monocular preprocessing (host-only).

Covers tools/prepare_wild/prepare_dataset.py:33-110: reads metadata.json
(per-frame poses/betas/K/E), moves the global body rotation into the camera
(Th = pelvis, Rh = poses[:3], poses[:3] = 0 -- prepare_dataset.py:61-88),
and writes cameras.pkl / mesh_infos.pkl / canonical_joints.pkl next to the
frames.

Usage:
  python -m humannerf_tpu.tools.prepare_wild --cfg wild.yaml
Config keys: dataset.path, dataset.subject, dataset.sex, smpl_model_dir.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np
import yaml

from humannerf_tpu.utils.smpl import SMPL


def prepare_wild(subject_dir: str, sex: str = "neutral",
                 smpl_model_dir: str = "third_parties/smpl/models"):
    with open(os.path.join(subject_dir, "metadata.json")) as f:
        frame_infos = json.load(f)
    smpl = SMPL(sex=sex, model_dir=smpl_model_dir)

    cameras, mesh_infos, all_betas = {}, {}, []
    for name, info in frame_infos.items():
        poses = np.array(info["poses"], np.float32)
        betas = np.array(info["betas"], np.float32)
        K = np.array(info["cam_intrinsics"], np.float32)
        E = np.array(info["cam_extrinsics"], np.float32)
        all_betas.append(betas)

        _, tpose_joints = smpl(np.zeros_like(poses), betas)
        pelvis = tpose_joints[0].copy()
        Th, Rh = pelvis, poses[:3].copy()
        tpose_joints = tpose_joints - pelvis[None]
        poses = poses.copy()
        poses[:3] = 0.0
        _, joints = smpl(poses, betas)
        joints = joints - pelvis[None]

        mesh_infos[name] = {"Rh": Rh, "Th": Th, "poses": poses,
                            "joints": joints, "tpose_joints": tpose_joints}
        cameras[name] = {"intrinsics": K, "extrinsics": E}

    with open(os.path.join(subject_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    with open(os.path.join(subject_dir, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    avg_betas = np.mean(np.stack(all_betas, axis=0), axis=0)
    _, template_joints = smpl(np.zeros(72), avg_betas)
    with open(os.path.join(subject_dir, "canonical_joints.pkl"), "wb") as f:
        pickle.dump({"joints": template_joints}, f)
    return subject_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    args = ap.parse_args()
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)
    subject_dir = os.path.join(cfg["dataset"]["path"],
                               cfg["dataset"]["subject"])
    prepare_wild(subject_dir, cfg["dataset"].get("sex", "neutral"),
                 cfg.get("smpl_model_dir", "third_parties/smpl/models"))
    print(f"wrote dataset pickles to {subject_dir}")


if __name__ == "__main__":
    main()
