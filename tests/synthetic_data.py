"""Synthetic preprocessed-capture generator shared by tests and smoke runs.

Writes the exact on-disk layout the prepare tools emit (images/, masks/,
cameras.pkl, mesh_infos.pkl, canonical_joints.pkl) with a simple humanoid
skeleton and a camera looking at it.
"""

import os
import pickle

import numpy as np
from PIL import Image


def humanoid_joints() -> np.ndarray:
    """A rough T-pose skeleton with sensible bone lengths (meters)."""
    j = np.zeros((24, 3), np.float32)
    # spine chain
    j[0] = [0, 0, 0]          # pelvis
    j[3] = [0, 0.12, 0]       # belly
    j[6] = [0, 0.25, 0]       # lower chest
    j[9] = [0, 0.38, 0]       # upper chest
    j[12] = [0, 0.5, 0]       # neck
    j[15] = [0, 0.62, 0]      # head
    # legs
    for sgn, hip, knee, ankle, toe in ((1, 1, 4, 7, 10), (-1, 2, 5, 8, 11)):
        j[hip] = [0.09 * sgn, -0.06, 0]
        j[knee] = [0.1 * sgn, -0.45, 0]
        j[ankle] = [0.1 * sgn, -0.85, 0]
        j[toe] = [0.1 * sgn, -0.9, 0.12]
    # arms
    for sgn, clav, sho, elb, wri, thb in ((1, 13, 16, 18, 20, 22),
                                          (-1, 14, 17, 19, 21, 23)):
        j[clav] = [0.08 * sgn, 0.45, 0]
        j[sho] = [0.18 * sgn, 0.45, 0]
        j[elb] = [0.42 * sgn, 0.45, 0]
        j[wri] = [0.65 * sgn, 0.45, 0]
        j[thb] = [0.72 * sgn, 0.45, 0]
    return j


def write_synthetic_dataset(path: str, n_frames: int = 4, size: int = 128,
                            seed: int = 0, with_distortion: bool = False):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)
    os.makedirs(os.path.join(path, "masks"), exist_ok=True)

    joints = humanoid_joints()
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = size * 1.2
    K[:2, 2] = size / 2.0
    E = np.eye(4, dtype=np.float32)
    E[2, 3] = 3.0  # camera 3m in front (looking down +z at subject)

    cameras, mesh_infos = {}, {}
    for i in range(n_frames):
        name = f"frame_{i:06d}"
        poses = rng.uniform(-0.15, 0.15, 72).astype(np.float32)
        poses[:3] = 0
        cameras[name] = {"intrinsics": K.copy(), "extrinsics": E.copy()}
        if with_distortion:
            cameras[name]["distortions"] = np.zeros(5, np.float32)
        mesh_infos[name] = {
            "Rh": np.zeros(3, np.float32),
            "Th": np.zeros(3, np.float32),
            "poses": poses,
            "joints": joints + rng.uniform(-0.01, 0.01, joints.shape
                                           ).astype(np.float32),
            "tpose_joints": joints.copy(),
        }
        # image: a bright blob in the middle; mask: central disk
        img = np.zeros((size, size, 3), np.uint8)
        yy, xx = np.mgrid[:size, :size]
        disk = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) < (size / 3) ** 2
        img[disk] = [180, 120, 90]
        mask = np.zeros((size, size, 3), np.uint8)
        mask[disk] = 255
        Image.fromarray(img).save(os.path.join(path, "images", name + ".png"))
        Image.fromarray(mask).save(os.path.join(path, "masks", name + ".png"))

    with open(os.path.join(path, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    with open(os.path.join(path, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    with open(os.path.join(path, "canonical_joints.pkl"), "wb") as f:
        pickle.dump({"joints": joints}, f)
    return path
