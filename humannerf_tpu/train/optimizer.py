"""Optimizer: Adam with per-module learning rates + exponential decay.

Reference semantics (core/train/optimizers/human_nerf/optimizer.py:12-43 +
lr_updaters/exp_decay.py:7-17): params whose name contains one of the
cfg.train.lr_<name> keys get that base LR; all LRs decay as
base * 0.1^(iter / (lrate_decay * 1000)). Implemented as
optax.multi_transform with one Adam per LR group, each driven by its own
exponential schedule off the shared step count.
"""

from __future__ import annotations

import optax


def customized_lr_names(cfg) -> list[str]:
    return [k[3:] for k in cfg.train.keys() if k.startswith("lr_")]


def label_params(cfg, params) -> dict:
    """Label each top-level module subtree by its LR group.

    The reference matches name substrings against full param names
    (optimizer.py:22-28); our param tree is keyed by the same module names
    at the top level, so a prefix match is equivalent.
    """
    names = customized_lr_names(cfg)

    def label_for(module_name: str) -> str:
        for n in names:
            if n in module_name:
                return n
        return "base"

    import jax
    return {k: jax.tree.map(lambda _: label_for(k), v)
            for k, v in params.items()}


def make_optimizer(cfg, params, frozen_modules=()):
    """Build the optax GradientTransformation + initial state.

    frozen_modules: top-level param keys that get zero updates -- the
    functional equivalent of the reference's requires_grad=False freezing
    (create_network.py:40-63, network_util.py:298-304).
    """
    decay_steps = cfg.train.lrate_decay * 1000

    def sched(base_lr):
        return optax.exponential_decay(
            init_value=base_lr, transition_steps=decay_steps,
            decay_rate=0.1, staircase=False)

    transforms = {"base": optax.adam(sched(cfg.train.lr), b1=0.9, b2=0.999),
                  "frozen": optax.set_to_zero()}
    for name in customized_lr_names(cfg):
        transforms[name] = optax.adam(sched(cfg.train[f"lr_{name}"]),
                                      b1=0.9, b2=0.999)
    labels = label_params(cfg, params)
    import jax
    for key in frozen_modules:
        labels[key] = jax.tree.map(lambda _: "frozen", params[key])
    tx = optax.multi_transform(transforms, labels)
    return tx, tx.init(params)
