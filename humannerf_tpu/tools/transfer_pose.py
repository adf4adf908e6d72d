"""Cross-subject pose transfer for ZJU-MoCap (host-only, offline).

Covers tools/prepare_zju_mocap/transfer_pose.py:40-173: drive subject A's
*shape* (betas) with subject B's *poses* (poses/Rh/Th), under subject B's
camera. Output feeds the `novelpose` run type: the novelpose dataset module
reads `mesh_infos_pose{B}.pkl` / `cameras_pose{B}.pkl` next to subject A's
prepared dataset.

Usage:
  python -m humannerf_tpu.tools.transfer_pose \
      --shape-cfg 387.yaml --pose-cfg 313.yaml [--copy-images]

Both yamls use the prepare_zju_mocap config schema (dataset.zju_mocap_path,
dataset.subject, dataset.sex, training_view, max_frames, output.dir
[, output.name], smpl_model_dir). Frame i pairs subject B's frame i with
subject A's shape; frame count = min of both max_frames.
"""

from __future__ import annotations

import argparse
import os
import pickle
from collections import OrderedDict

import numpy as np
import yaml

from humannerf_tpu.tools.prepare_zju_mocap import load_zju_cameras
from humannerf_tpu.utils.smpl import SMPL


def _load_cfg(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _subject_dir(cfg: dict) -> str:
    return os.path.join(cfg["dataset"]["zju_mocap_path"],
                        f"CoreView_{cfg['dataset']['subject']}")


def _smpl_params(subject_dir: str, subject: str, fid: int, ipath: str):
    """Load frame fid's SMPL fit; 313/315 index params by the in-image frame
    number (transfer_pose.py:115-138 uses idx+1 for those subjects)."""
    smpl_idx = fid + 1 if subject in ("313", "315") else fid
    return np.load(os.path.join(subject_dir, "new_params", f"{smpl_idx}.npy"),
                   allow_pickle=True).item()


def transfer_pose(shape_cfg: dict, pose_cfg: dict,
                  copy_images: bool = False) -> str:
    shape_subject = str(shape_cfg["dataset"]["subject"])
    pose_subject = str(pose_cfg["dataset"]["subject"])
    sex = shape_cfg["dataset"].get("sex", "neutral")
    shape_dir = _subject_dir(shape_cfg)
    pose_dir = _subject_dir(pose_cfg)
    max_frames = min(pose_cfg["max_frames"], shape_cfg["max_frames"])

    view = pose_cfg.get("training_view", 0)
    assert isinstance(view, int), "transfer_pose uses one training view"

    pose_annots = np.load(os.path.join(pose_dir, "annots.npy"),
                          allow_pickle=True).item()
    shape_annots = np.load(os.path.join(shape_dir, "annots.npy"),
                           allow_pickle=True).item()
    cam = load_zju_cameras(pose_annots, [view])[view]

    # zip over both subjects' frame lists: iteration stops at the shorter
    # sequence (reference transfer_pose.py:109 zips pose and shape paths;
    # the shape subject's SMPL fits only exist for its own frame count)
    pose_img_paths = [fr["ims"][view] for fr in pose_annots["ims"]]
    n_shape = len(shape_annots["ims"])
    if max_frames > 0:
        pose_img_paths = pose_img_paths[:max_frames]
        n_shape = min(n_shape, max_frames)
    pose_img_paths = pose_img_paths[:n_shape]

    out_dir = os.path.join(shape_cfg["output"]["dir"],
                           shape_cfg["output"].get("name", shape_subject))
    os.makedirs(out_dir, exist_ok=True)
    img_out_dir = os.path.join(out_dir, f"images_pose{pose_subject}")
    if copy_images:
        os.makedirs(img_out_dir, exist_ok=True)

    smpl = SMPL(sex=sex,
                model_dir=shape_cfg.get("smpl_model_dir",
                                        "third_parties/smpl/models"))
    cameras, mesh_infos = OrderedDict(), OrderedDict()
    for idx, ipath in enumerate(pose_img_paths):
        out_name = f"frame_{idx:06d}"
        pose_p = _smpl_params(pose_dir, pose_subject, idx, ipath)
        shape_p = _smpl_params(shape_dir, shape_subject, idx, ipath)

        betas = shape_p["shapes"][0]          # A's body shape
        poses = pose_p["poses"][0]            # B's articulation
        cameras[out_name] = {"intrinsics": cam["K"], "extrinsics": cam["E"],
                             "distortions": cam["D"]}
        _, tpose_joints = smpl(np.zeros_like(poses), betas)
        _, joints = smpl(poses, betas)
        mesh_infos[out_name] = {
            "Rh": pose_p["Rh"][0], "Th": pose_p["Th"][0], "poses": poses,
            "joints": joints, "tpose_joints": tpose_joints,
        }
        if copy_images:
            import shutil
            shutil.copyfile(
                os.path.join(pose_dir, ipath),
                os.path.join(img_out_dir,
                             out_name + os.path.splitext(ipath)[1]))

    with open(os.path.join(out_dir, f"mesh_infos_pose{pose_subject}.pkl"),
              "wb") as f:
        pickle.dump(mesh_infos, f)
    with open(os.path.join(out_dir, f"cameras_pose{pose_subject}.pkl"),
              "wb") as f:
        pickle.dump(cameras, f)
    print(f"wrote {out_dir}: {len(mesh_infos)} transferred frames "
          f"(shape={shape_subject}, pose={pose_subject})")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape-cfg", required=True,
                    help="prepare yaml of the subject providing the shape")
    ap.add_argument("--pose-cfg", required=True,
                    help="prepare yaml of the subject providing the poses")
    ap.add_argument("--copy-images", action="store_true",
                    help="copy the pose subject's images next to the output")
    args = ap.parse_args()
    transfer_pose(_load_cfg(args.shape_cfg), _load_cfg(args.pose_cfg),
                  copy_images=args.copy_images)


if __name__ == "__main__":
    main()
