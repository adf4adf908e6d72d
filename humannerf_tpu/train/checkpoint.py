"""Atomic pickle checkpoints: {iter, params, opt_state}.

Reference cadence (trainer.py:356-377, configs/default.yaml:275-276):
'init' at iter 0, 'latest' every save_checkpt_interval, 'iter_N' every
save_model_interval; load restores iter+1 and both states. Writes are
atomic (tmp + fsync + rename) so a preempted save never corrupts 'latest'
-- the crash-resume story the reference lacked.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def ckpt_path(logdir: str, name: str) -> str:
    return os.path.join(logdir, f"{name}.ckpt")


def ckpt_exists(logdir: str, name: str) -> bool:
    return os.path.isfile(ckpt_path(logdir, name))


def save_checkpoint(logdir: str, name: str, iter_val: int, params,
                    opt_state=None):
    os.makedirs(logdir, exist_ok=True)
    path = ckpt_path(logdir, name)
    tmp = path + ".tmp"
    payload = {
        "iter": int(iter_val),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
    }
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(logdir: str, name: str) -> dict:
    path = name if os.path.isfile(name) else ckpt_path(logdir, name)
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_into(payload: dict, params, opt_state=None):
    """Map saved arrays back onto (possibly sharded/jax) templates,
    tolerating missing keys like the reference's strict=False load."""
    def merge(saved, template):
        if isinstance(template, dict):
            return {k: merge(saved.get(k), template[k])
                    if isinstance(saved, dict) else template[k]
                    for k in template}
        if isinstance(template, (list, tuple)):
            if saved is None or len(saved) != len(template):
                return template
            merged = [merge(s, t) for s, t in zip(saved, template)]
            return type(template)(merged)
        return template if saved is None else saved

    new_params = merge(payload["params"], params)
    if opt_state is not None and payload.get("opt_state") is not None:
        flat_saved, _ = jax.tree.flatten(payload["opt_state"])
        flat_tmpl, treedef = jax.tree.flatten(opt_state)
        if len(flat_saved) == len(flat_tmpl):
            opt_state = jax.tree.unflatten(treedef, flat_saved)
    return new_params, opt_state
