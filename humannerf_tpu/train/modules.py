"""Partial-module warm start, reinit, and freezing.

Covers the reference's pretrained-module machinery
(core/nets/create_network.py:16-63 + cfg.modules, default.yaml:384-397):
load a pretrained checkpoint, selectively adopt module subtrees
(unless `reinit`), and freeze modules not marked `tune`. The env toggles
LOAD_C/LOAD_D/TUNE_C/TUNE_D map onto the same mechanism
(C = canonical mlp, D = non-rigid mlp).

Freezing is an optimizer property here: frozen labels get
optax.set_to_zero, the functional-JAX equivalent of requires_grad=False.
"""

from __future__ import annotations

import os

MODULE_NAMES = ("canonical_mlp", "non_rigid_motion_mlp", "pose_decoder",
                "mweight_vol_decoder")
# cfg.modules key -> param-tree key
_PARAM_KEY = {"canonical_mlp": "cnl_mlp",
              "non_rigid_motion_mlp": "non_rigid_mlp",
              "pose_decoder": "pose_decoder",
              "mweight_vol_decoder": "mweight_vol_decoder"}


def _env_overrides(cfg):
    """LOAD_C/LOAD_D/TUNE_C/TUNE_D env toggles (create_network.py:20-28)."""
    short = {"C": "canonical_mlp", "D": "non_rigid_motion_mlp"}
    for letter, mod in short.items():
        if os.environ.get(f"LOAD_{letter}", "") == "0":
            cfg.modules[mod].reinit = True
        if int(os.environ.get(f"TUNE_{letter}", 0)) == 1:
            cfg.modules[mod].tune = True
    return cfg


def apply_pretrained_modules(cfg, params):
    """Warm-start params from cfg.modules.pretrained_path.

    Returns (params, frozen_modules): modules loaded from the pretrained
    checkpoint and not marked `tune` are frozen (create_network.py:30-63).
    """
    cfg = _env_overrides(cfg)
    frozen = []
    path = cfg.modules.pretrained_path
    if path == "empty" or not path:
        return params, frozen

    from humannerf_tpu.train import checkpoint as ckpt
    if path.endswith(".tar"):  # reference torch checkpoint
        from humannerf_tpu.tools.convert_torch_ckpt import (
            convert_state_dict, load_torch_checkpoint)
        _it, sd = load_torch_checkpoint(path)
        pretrained = convert_state_dict(sd)
    else:
        pretrained = ckpt.load_checkpoint(os.path.dirname(path) or ".",
                                          path)["params"]

    for mod in MODULE_NAMES:
        mcfg = cfg.modules[mod]
        pkey = _PARAM_KEY[mod]
        if pkey not in params or pkey not in pretrained:
            continue
        if mcfg.reinit:
            continue  # keep fresh init
        params[pkey] = pretrained[pkey]
        if not mcfg.tune:
            frozen.append(pkey)
    return params, frozen
