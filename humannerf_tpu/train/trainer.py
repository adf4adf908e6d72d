"""Training loop: one jitted, mesh-sharded step; host-side data + logging.

Replaces the reference Trainer (core/train/trainers/human_nerf/trainer.py):
forward + loss + backward fuse into a single XLA program with donated
buffers; rays shard over the device mesh; LPIPS runs in-graph. AMP/GradScaler
(trainer.py:57-58,206-220) has no TPU equivalent -- bf16 compute with fp32
params/optimizer needs no loss scaling.

Cadence parity: log every train.log_interval; progress renders at
{start, 100, 300, 1000, 2500} + every progress.dump_interval; 'latest'
checkpoint every save_checkpt_interval; 'iter_N' every save_model_interval
(trainer.py:222-255).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from humannerf_tpu.data.loader import Loader, create_dataset
from humannerf_tpu.models.lpips import init_lpips_params
from humannerf_tpu.models.network import HumanNeRF
from humannerf_tpu.parallel import mesh as mesh_lib
from humannerf_tpu.train import checkpoint as ckpt
from humannerf_tpu.train.loss import (argmin_multihead_loss,
                                      gather_patch_images, image_losses,
                                      total_loss)
from humannerf_tpu.train.optimizer import make_optimizer
from humannerf_tpu.utils.image import tile_images, to_8b_image, unpack_to_image

FRAME_KEYS = ("dst_Rs", "dst_Ts", "cnl_gtfms", "motion_weights_priors",
              "dst_posevec", "cnl_bbox_min_xyz", "cnl_bbox_scale_xyz",
              "dst_bbox_min_xyz", "dst_bbox_max_xyz",
              "bgcolor", "pose_condition", "pose_condition_cmlp",
              "frame_id", "dir_idx", "dst_Rs_history", "dst_Ts_history",
              "dst_posevec_history", "w2c_history", "rgb_history")
RAY_KEYS = ("rays_o", "rays_d", "rays_d_camera", "near", "far")


def split_batch(batch: dict):
    frame = {k: batch[k] for k in FRAME_KEYS if k in batch}
    rays = {k: batch[k] for k in RAY_KEYS}
    return frame, rays


class EvalRenderer:
    """Jitted full-image renderer with ray padding to bucketed block sizes.

    Pads the variable masked-ray count to `chunk * 2^k` (the reference's
    eval chunk, default.yaml:362, is the smallest bucket), so a whole
    sequence with arbitrary per-frame masked-ray counts compiles at most
    log2(max_rays / chunk) + 1 programs -- not one per distinct chunk
    multiple.
    """

    def __init__(self, net: HumanNeRF, chunk: int = 8192, mesh=None):
        self.net = net
        self.chunk = chunk
        self.mesh = mesh          # optional: shard eval rays over the mesh
        if mesh is not None and mesh.devices.size > 1:
            net.data_mesh = mesh  # pallas MLP runs in a shard_map region
        self._jitted = {}

    def _fn(self, n_padded: int, full_outputs: bool, head_mode: str):
        key = (n_padded, full_outputs, head_mode)
        if key not in self._jitted:
            net, chunk = self.net, self.chunk

            @jax.jit
            def render(params, frame, rays, iter_val, head_id):
                return net.render_rays(params, frame, rays, iter_val,
                                       chunk=min(chunk, n_padded),
                                       perturb=False,
                                       full_outputs=full_outputs,
                                       head_id=head_id, head_mode=head_mode)
            self._jitted[key] = render
        return self._jitted[key]

    def render_frame(self, params, item: dict, iter_val: float,
                     full_outputs: bool = False, head_mode: str = "single",
                     head_id: int = 0) -> dict:
        n = item["rays_o"].shape[0]
        n_pad = self.chunk
        while n_pad < n:
            n_pad *= 2
        rays = {}
        for k in RAY_KEYS:
            v = item[k]
            pad = np.zeros((n_pad - n,) + v.shape[1:], v.dtype)
            rays[k] = np.concatenate([v, pad], axis=0)
        if self.mesh is not None and self.mesh.devices.size > 1:
            rays = mesh_lib.put_batch(rays, self.mesh)  # ray-dim sharded
        else:
            rays = {k: jnp.asarray(v) for k, v in rays.items()}
        frame = {k: jnp.asarray(item[k]) for k in FRAME_KEYS if k in item}
        out = self._fn(n_pad, full_outputs, head_mode)(
            params, frame, rays, jnp.asarray(float(iter_val)),
            jnp.asarray(max(head_id, 0), jnp.int32))
        if head_mode == "all":
            return jax.tree.map(lambda x: np.asarray(x)[:, :n], out)
        return jax.tree.map(lambda x: np.asarray(x)[:n], out)


class Trainer:
    def __init__(self, cfg, mesh=None, log=print):
        self.cfg = cfg
        self.log = log
        self.net = HumanNeRF(cfg)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.rng = jax.random.key(cfg.random_seed)

        if self.mesh.devices.size > 1:
            if int(cfg.train.frames_per_step) == 1:
                # ray-sharded batches: run the pallas MLP in a shard_map
                # region over the data axis
                self.net.data_mesh = self.mesh
            else:
                # frame-DP shards the vmapped frame axis; a pallas call
                # inside that layout is not partitionable -- use the jnp
                # paths (MLP and resample), which GSPMD handles
                self.net.pallas_mlp_plans = (None, None)
                self.net.force_jnp_resample = True

        init_key, self.rng = jax.random.split(self.rng)
        self.params = self.net.init_params(init_key)
        from humannerf_tpu.train.modules import apply_pretrained_modules
        self.params, frozen = apply_pretrained_modules(cfg, self.params)
        if frozen:
            self.log(f"frozen pretrained modules: {frozen}")
        self.tx, self.opt_state = make_optimizer(cfg, self.params, frozen)
        self.lpips_params = None
        if cfg.train.lossweights.get("lpips", 0) > 0:
            self.lpips_params = init_lpips_params(cfg.lpips.weights)
            from humannerf_tpu.models.lpips import lpips_trunk_kind
            if lpips_trunk_kind(cfg.lpips.weights) == "random":
                self.log("WARNING: LPIPS loss is running on the RANDOM VGG "
                         "trunk (no converted weights at "
                         f"{cfg.lpips.weights!r}); logged lpips values are "
                         "uncalibrated")

        self.iter = 1
        if cfg.resume and ckpt.ckpt_exists(cfg.logdir, cfg.load_net):
            payload = ckpt.load_checkpoint(cfg.logdir, cfg.load_net)
            self.params, self.opt_state = ckpt.restore_into(
                payload, self.params, self.opt_state)
            self.iter = payload["iter"] + 1
            self.log(f"resumed from {cfg.load_net} at iter {self.iter}")
        else:
            ckpt.save_checkpoint(cfg.logdir, "init", 0, self.params,
                                 self.opt_state)
        self.start_iter = self.iter

        self._train_step = self._build_train_step()
        self.renderer = EvalRenderer(self.net, chunk=min(cfg.chunk, 8192),
                                     mesh=self.mesh)

    # -- jitted step -----------------------------------------------------------

    def _build_train_step(self):
        cfg, net, tx = self.cfg, self.net, self.tx
        lossweights = {k: float(v) for k, v in cfg.train.lossweights.items()}
        loss_names = [k for k, w in lossweights.items() if w > 0]
        lpips_params = self.lpips_params
        lpips_layers = tuple(cfg.lpips.layers)
        perturb = cfg.train.perturb > 0
        # multihead training mode is static per run (trainer.py:124-161):
        # argmin split renders all heads; view/random/file select one
        if cfg.multihead.head_num > 1:
            head_mode = "all" if cfg.multihead.split == "argmin" else "select"
        else:
            head_mode = "single"
        argmin_cfg = cfg.multihead.argmin_cfg

        frames_per_step = int(cfg.train.frames_per_step)

        def loss_fn(params, batch, rng, iter_val):
            frame, rays = split_batch(batch)
            out = net.render_rays(params, frame, rays, iter_val, rng,
                                  perturb=perturb, remat=bool(cfg.train.get('remat', True)),
                                  head_id=batch.get("head_id", 0),
                                  head_mode=head_mode, train=True)
            if head_mode == "all":
                return argmin_multihead_loss(
                    out["rgb"], batch["patch_ray_idx"],
                    batch["bgcolor"] / 255.0, batch["target_patches"],
                    lossweights, argmin_cfg, lpips_params, lpips_layers)
            patch_imgs = gather_patch_images(
                out["rgb"], batch["patch_ray_idx"], batch["bgcolor"] / 255.0)
            losses = image_losses(patch_imgs, batch["target_patches"],
                                  loss_names, lpips_params, lpips_layers)
            return total_loss(losses, lossweights)

        def batched_loss_fn(params, batch, rng, iter_val):
            """Mean loss over a leading frame axis (true data parallelism:
            cfg.train.frames_per_step frames per step, sharded over the
            mesh; the reference is pinned at 1 image/step,
            default.yaml:263)."""
            if frames_per_step == 1:
                return loss_fn(params, batch, rng, iter_val)
            rngs = jax.random.split(rng, frames_per_step)
            losses, loss_dicts = jax.vmap(
                loss_fn, in_axes=(None, 0, 0, None))(params, batch, rngs,
                                                     iter_val)
            return jnp.mean(losses), jax.tree.map(jnp.mean, loss_dicts)

        # exposed for parity tests: gradients are the honest layout-parity
        # signal (one Adam step normalizes away grad scale -- post-update
        # params are ~invariant to even badly wrong reductions)
        self._loss_fn = batched_loss_fn

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng, iter_val):
            (loss, loss_dict), grads = jax.value_and_grad(
                batched_loss_fn, has_aux=True)(params, batch, rng, iter_val)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss, loss_dict

        return train_step

    # -- loop ------------------------------------------------------------------

    def train(self, loader: Loader | None = None, max_steps=None):
        cfg = self.cfg
        if loader is None:
            dataset = create_dataset(cfg, "train", seed=cfg.random_seed)
            loader = Loader(dataset, shuffle=cfg.train.shuffle,
                            seed=cfg.random_seed)
        maxiter = cfg.train.maxiter if max_steps is None \
            else self.iter + max_steps - 1

        from humannerf_tpu.utils.tracing import (ExperimentLogger, Profiler,
                                                 StepTimer)
        os.makedirs(cfg.logdir, exist_ok=True)
        timer = StepTimer()
        profiler = Profiler()
        exp_log = ExperimentLogger(cfg.logdir, name=cfg.experiment)
        fps = int(cfg.train.frames_per_step)
        stream = loader.endless()

        def next_batch():
            if fps == 1:
                item = next(stream)
                return mesh_lib.put_batch(
                    {k: v for k, v in item.items()
                     if k not in ("frame_name", "num_valid_rays")}, self.mesh)
            items = [next(stream) for _ in range(fps)]
            return mesh_lib.put_frame_batch(
                mesh_lib.collate_frames(items), self.mesh)

        while self.iter <= maxiter:
            device_batch = next_batch()
            step_key, self.rng = jax.random.split(self.rng)
            with profiler.trace(f"iter_{self.iter}"):
                self.params, self.opt_state, loss, loss_dict = \
                    self._train_step(
                        self.params, self.opt_state, device_batch, step_key,
                        jnp.asarray(float(self.iter)))

            timer.tick()
            if self.iter % cfg.train.log_interval == 0:
                loss_v = float(loss)
                metrics = {k: float(v) for k, v in loss_dict.items()}
                items = " ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
                self.log(f"[iter {self.iter}] loss {loss_v:.4f} [{items}] "
                         f"({timer.rate():.2f} it/s)")
                exp_log.log({"loss": loss_v, "it_per_sec": timer.rate(),
                             **metrics}, step=self.iter)

            if (self.iter in (self.start_iter, 100, 300, 1000, 2500)
                    or self.iter % cfg.progress.dump_interval == 0):
                try:
                    self.progress()
                except FileNotFoundError:
                    pass  # no progress dataset configured (smoke runs)

            if (self.iter % cfg.train.save_checkpt_interval == 0
                    or self.iter == self.start_iter):
                ckpt.save_checkpoint(cfg.logdir, "latest", self.iter,
                                     self.params, self.opt_state)
            if cfg.save_all and self.iter % cfg.train.save_model_interval == 0:
                ckpt.save_checkpoint(cfg.logdir, f"iter_{self.iter}",
                                     self.iter, self.params, self.opt_state)
            self.iter += 1

    def finalize(self):
        ckpt.save_checkpoint(self.cfg.logdir, "latest", self.iter,
                             self.params, self.opt_state)

    # -- progress renders --------------------------------------------------------

    def progress(self) -> bool:
        """Render held-out frames against ground truth into prog_{iter}.jpg.
        Returns the reference's empty-image divergence signal
        (trainer.py:271-350)."""
        cfg = self.cfg
        if "dataset" not in cfg.progress:
            raise FileNotFoundError("no progress dataset configured")
        dataset = create_dataset(cfg, "progress")
        images = []
        is_empty = False
        for i in range(len(dataset)):
            item = dataset[i]
            out = self.renderer.render_frame(self.params, item, self.iter)
            W, H = item["img_width"], item["img_height"]
            bg = np.array(cfg.bgcolor, np.float32) / 255.0
            rgb_img, _, truth_img = unpack_to_image(
                W, H, item["ray_mask"], bg, out["rgb"],
                truth=item.get("target_rgbs"))
            pair = np.concatenate(
                [rgb_img, truth_img if truth_img is not None else rgb_img],
                axis=1)
            images.append(pair)
            if self.iter <= 5000 and np.allclose(
                    rgb_img, np.array(cfg.bgcolor), atol=5.0):
                is_empty = True
        os.makedirs(cfg.logdir, exist_ok=True)
        from PIL import Image
        Image.fromarray(tile_images(images)).save(
            os.path.join(cfg.logdir, f"prog_{self.iter:06d}.jpg"))
        if is_empty:
            self.log("progress renders are empty (divergence signal)")
        return is_empty
