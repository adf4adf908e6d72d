"""Minimal numpy SMPL body model (host-side data preparation only).

Covers the reference third_parties/smpl/smpl_numpy.py:13-96: shape
blendshapes, pose blendshapes, joint regression and LBS, returning
(vertices, joints). Used by the prepare_* tools; never on device.
Requires the standard SMPL model pickles (not redistributable here).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from humannerf_tpu.utils.body import rodrigues

MODEL_PATHS = {
    "male": "basicmodel_m_lbs_10_207_0_v1.0.0.pkl",
    "female": "basicModel_f_lbs_10_207_0_v1.0.0.pkl",
    "neutral": "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl",
}


class SMPL:
    def __init__(self, sex: str, model_dir: str):
        path = os.path.join(model_dir, MODEL_PATHS[sex])
        with open(path, "rb") as f:
            model = pickle.load(f, encoding="latin1")
        self.J_regressor = np.array(
            model["J_regressor"].todense()
            if hasattr(model["J_regressor"], "todense")
            else model["J_regressor"])
        self.weights = np.asarray(model["weights"])
        self.posedirs = np.asarray(model["posedirs"])
        self.v_template = np.asarray(model["v_template"])
        self.shapedirs = np.array(model["shapedirs"])
        self.faces = np.asarray(model["f"]).astype(np.int32)
        kt = np.asarray(model["kintree_table"]).astype(np.int64)
        id_to_col = {int(kt[1, i]): i for i in range(kt.shape[1])}
        self.parent = np.array(
            [id_to_col[int(kt[0, i])] for i in range(1, kt.shape[1])])

    def __call__(self, pose: np.ndarray, beta: np.ndarray):
        """pose: (72,) axis-angle or (24,3,3) rotations; beta: (10,).
        Returns (verts (6890,3), joints (24,3))."""
        n_verts = self.v_template.shape[0]
        v_shaped = (self.shapedirs.reshape(-1, beta.shape[0]) @ beta
                    ).reshape(n_verts, 3) + self.v_template
        J = self.J_regressor @ v_shaped                       # (24, 3)

        pose = np.asarray(pose)
        if pose.shape == (24, 3, 3):
            R = pose.astype(np.float32)
        else:
            R = rodrigues(pose.reshape(24, 3))

        lrotmin = (R[1:] - np.eye(3, dtype=np.float32)[None]).reshape(-1)
        v_posed = v_shaped + (self.posedirs.reshape(-1, 207) @ lrotmin
                              ).reshape(n_verts, 3)

        # chain local transforms into global joint transforms
        J_local = J.copy()
        J_local[1:] -= J[self.parent]
        G_local = np.zeros((24, 4, 4), np.float32)
        G_local[:, :3, :3] = R
        G_local[:, :3, 3] = J_local
        G_local[:, 3, 3] = 1.0
        G = [G_local[0]]
        for i in range(1, 24):
            G.append(G[self.parent[i - 1]] @ G_local[i])
        G = np.stack(G, axis=0)
        joints = G[:, :3, 3].copy()

        # subtract the posed rest-joint contribution (inverse bind)
        rest = np.einsum("jab,jb->ja", G[:, :3, :3], J)       # (24, 3)
        G_skin = G.copy()
        G_skin[:, :3, 3] -= rest

        T = np.einsum("vj,jab->vab", self.weights, G_skin)    # (6890, 4, 4)
        v_h = np.concatenate([v_posed, np.ones((n_verts, 1))], axis=-1)
        verts = np.einsum("vab,vb->va", T, v_h)[:, :3]
        return verts.astype(np.float32), joints.astype(np.float32)
