"""Training-step tests: loss decreases, per-module LRs, checkpoint
round-trip, patch-gather loss correctness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.config import make_cfg
from humannerf_tpu.train.loss import gather_patch_images
from humannerf_tpu.train.optimizer import label_params, make_optimizer

from synthetic_data import write_synthetic_dataset


def small_cfg(tmp_path, **extra):
    opts = [
        "N_samples", "8", "patch.size", "8", "patch.N_patches", "2",
        "warp.grid_size", "16",
        "mweight_volume.volume_size", "16", "mweight_volume.embedding_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_mlp.mlp_width", "16", "non_rigid_motion_mlp.mlp_depth", "3",
        "non_rigid_motion_mlp.skips", "[]", "non_rigid_motion_mlp.kick_in_iter", "0",
        "non_rigid_motion_mlp.full_band_iter", "0",
        "pose_decoder.mlp_width", "16", "pose_decoder.mlp_depth", "2",
        "train.lossweights.lpips", "0.0",  # keep the smoke step light
        "train.lossweights.mse", "1.0",
        "train.log_interval", "1000000",
        "progress.dump_interval", "1000000",
        "train.save_checkpt_interval", "1000000",
        "save_all", "False",
    ]
    for k, v in extra.items():
        opts += [k, str(v)]
    cfg = make_cfg(opts=opts, base_dir=str(tmp_path))
    cfg.logdir = str(tmp_path / "logs")
    return cfg


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    return write_synthetic_dataset(
        str(tmp_path_factory.mktemp("train_synth")), n_frames=3, size=96)


def test_gather_patch_images():
    rgb = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    idx = jnp.asarray(np.array([[[0, 1], [-1, 3]]], np.int32))
    bg = jnp.asarray([9.0, 9.0, 9.0])
    out = np.asarray(gather_patch_images(rgb, idx, bg))
    np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[0, 0, 1], [3, 4, 5])
    np.testing.assert_array_equal(out[0, 1, 0], [9, 9, 9])
    np.testing.assert_array_equal(out[0, 1, 1], [9, 10, 11])


def test_optimizer_labels(tmp_path, data_path):
    from humannerf_tpu.models.network import HumanNeRF
    cfg = small_cfg(tmp_path)
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    labels = label_params(cfg, params)
    assert set(jax.tree.leaves(labels)) <= {
        "base", "mweight_vol_decoder", "pose_decoder", "non_rigid_mlp",
        "time_embed_fn"}
    leaves = jax.tree.leaves(labels["cnl_mlp"])
    assert all(l == "base" for l in leaves)
    leaves = jax.tree.leaves(labels["non_rigid_mlp"])
    assert all(l == "non_rigid_mlp" for l in leaves)
    tx, state = make_optimizer(cfg, params)
    # one update step runs
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # per-group LR honored at step 0: adam update magnitude ~= lr
    up = np.abs(np.asarray(updates["cnl_mlp"]["output"]["w"])).mean()
    up_nr = np.abs(np.asarray(updates["non_rigid_mlp"]["output"]["w"])).mean()
    assert up == pytest.approx(cfg.train.lr, rel=0.01)
    assert up_nr == pytest.approx(cfg.train.lr_non_rigid_mlp, rel=0.01)


def test_loss_decreases_and_checkpoint_roundtrip(tmp_path, data_path):
    from humannerf_tpu.train.trainer import Trainer
    from humannerf_tpu.data.loader import Loader
    from humannerf_tpu.data.datasets import Dataset
    from humannerf_tpu.train import checkpoint as ckpt

    cfg = small_cfg(tmp_path)
    cfg.train.dataset = data_path
    # 1-device mesh: 8 virtual devices on this 1-core host trip XLA:CPU's
    # hardcoded 40s collective-rendezvous abort over a 30-step run
    from humannerf_tpu.parallel import mesh as mesh_lib
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=lambda *a: None)
    ds = Dataset(cfg, data_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    loader = Loader(ds, shuffle=True, seed=0, prefetch=0)

    # capture losses across steps on the same data
    losses = []
    orig_step = trainer._train_step

    def spy(params, opt, batch, rng, it):
        p, o, l, d = orig_step(params, opt, batch, rng, it)
        losses.append(float(l))
        return p, o, l, d

    trainer._train_step = spy
    trainer.train(loader=loader, max_steps=30)
    assert len(losses) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # checkpoint roundtrip
    ckpt.save_checkpoint(cfg.logdir, "latest", trainer.iter, trainer.params,
                         trainer.opt_state)
    payload = ckpt.load_checkpoint(cfg.logdir, "latest")
    p2, o2 = ckpt.restore_into(payload, trainer.params, trainer.opt_state)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume constructs at iter+1
    cfg2 = small_cfg(tmp_path)
    cfg2.logdir = cfg.logdir
    cfg2.train.dataset = data_path
    trainer2 = Trainer(cfg2, mesh=mesh_lib.make_mesh(1), log=lambda *a: None)
    assert trainer2.iter == payload["iter"] + 1
