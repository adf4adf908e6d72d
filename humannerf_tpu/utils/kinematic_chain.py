"""SMPL kinematic-chain influence tables for localized pose conditioning.

Reference: core/utils/kinematic_chain.py:3-90. The SRC2TARGETS relation says
"the rotation of source joint s affects the non-rigid deformation of target
joints t"; PART2JOINTS is its transpose restricted to the 23 non-root
rotation slots. These are anatomical facts about the SMPL skeleton (hand-
curated in the reference); the relation data is reproduced here, the matrix
construction is ours.
"""

from __future__ import annotations

import numpy as np

# index order matches utils/body.py SMPL_JOINT_NAMES (reference JOINT_NAMES)
JOINT_NAMES = [
    "root", "lhip", "rhip", "belly", "lknee", "rknee", "spine", "lankle",
    "rankle", "chest", "ltoes", "rtoes", "neck", "linshoulder",
    "rinshoulder", "head", "lshoulder", "rshoulder", "lelbow", "relbow",
    "lwrist", "rwrist", "lhand", "rhand",
]

_TORSO = ["chest", "spine", "belly", "root"]
SRC2TARGETS = {
    "head": ["head", "neck"],
    "neck": ["head", "neck"],
    "chest": ["chest", "rinshoulder", "linshoulder", "rshoulder",
              "lshoulder", "neck", "spine", "belly", "root"],
    "spine": ["spine", "chest", "rinshoulder", "linshoulder", "rshoulder",
              "lshoulder", "belly", "root"],
    "belly": ["belly", "spine", "chest", "root"],
    "root": ["root", "belly", "spine", "chest", "rhip", "lhip", "rknee",
             "lknee"],
    "rhip": ["rhip", "rknee", "rankle", "root", "belly", "spine"],
    "lhip": ["lhip", "lknee", "lankle", "root", "belly", "spine"],
    "rknee": ["rknee", "rhip", "rankle", "root"],
    "lknee": ["lknee", "lhip", "lankle", "root"],
    "rankle": ["rankle", "rknee", "rtoes"],
    "lankle": ["lankle", "lknee", "ltoes"],
    "rtoes": ["rankle", "rknee", "rtoes"],
    "ltoes": ["lankle", "lknee", "ltoes"],
    "rhand": ["rhand", "rwrist", "relbow"],
    "rwrist": ["rhand", "rwrist", "relbow", "rshoulder"],
    "relbow": ["rhand", "rwrist", "relbow", "rshoulder", "rinshoulder",
               "chest", "spine", "belly"],
    "rshoulder": ["rwrist", "relbow", "rshoulder", "rinshoulder"] + _TORSO,
    "rinshoulder": ["rwrist", "relbow", "rshoulder", "rinshoulder"] + _TORSO,
    "lhand": ["lhand", "lwrist", "lelbow"],
    "lwrist": ["lhand", "lwrist", "lelbow", "lshoulder"],
    "lelbow": ["lhand", "lwrist", "lelbow", "lshoulder", "linshoulder",
               "chest", "spine", "belly"],
    "lshoulder": ["lwrist", "lelbow", "lshoulder", "linshoulder"] + _TORSO,
    "linshoulder": ["lwrist", "lelbow", "lshoulder", "linshoulder"] + _TORSO,
}


def build_tables():
    """-> (SRC2TARGETS_MAT, PART2JOINTS), both (24, 24) float32."""
    src2tgt = np.zeros((24, 24), np.float32)
    part2joints = np.zeros((24, 24), np.float32)
    for s, targets in SRC2TARGETS.items():
        sid = JOINT_NAMES.index(s)
        for t in targets:
            tid = JOINT_NAMES.index(t)
            src2tgt[sid, tid] = 1.0
            part2joints[tid, sid] = 1.0
    return src2tgt, part2joints


SRC2TARGETS_MAT, PART2JOINTS = build_tables()
