"""Rendering / evaluation drivers (reference run.py:18-449).

Run types: movement, freeview, tpose, tpose_pose_condition, novelview,
novelview_all, novelpose, novelpose_eval, train_render. Each loads a
checkpoint, iterates the matching dataset, renders with the jitted
block renderer, scatters rays back into images, and writes PNG/mp4 +
PSNR/SSIM/LPIPS metrics where ground truth exists.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from humannerf_tpu.data.loader import Loader, create_dataset
from humannerf_tpu.models.lpips import (init_lpips_params,
                                        lpips_trunk_kind,
                                        make_lpips_metric_fn)
from humannerf_tpu.models.network import HumanNeRF
from humannerf_tpu.train import checkpoint as ckpt
from humannerf_tpu.train.trainer import EvalRenderer
from humannerf_tpu.utils.image import ImageWriter, to_8b_image, unpack_to_image
from humannerf_tpu.utils.metrics import MetricsWriter

# run types whose dataset yields ground truth for metrics
_EVAL_TYPES = {"movement", "novelview", "novelview_all", "novelpose_eval",
               "train_render"}


def load_network(cfg):
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(cfg.random_seed))
    payload = ckpt.load_checkpoint(cfg.logdir, cfg.load_net)
    params, _ = ckpt.restore_into(payload, params)
    print(f"loaded checkpoint {cfg.load_net} (iter {payload['iter']})")
    return net, params


def resolve_render_mode(cfg, run_type: str, environ=None):
    """Output folder name + non-rigid gating per run type.

    tpose renders the canonical pose without the non-rigid field
    (run.py:167-172); tpose_pose_condition likewise unless
    FORCE_NON_RIGID_MOTIONS=1, which keeps the delta and renders into a
    '_w-delta' folder (run.py:175-188). cfg.render_folder_name overrides
    the folder in every mode."""
    environ = os.environ if environ is None else environ
    named = cfg.get_path("render_folder_name", "")
    folder = named or run_type
    ignore_nr = bool(cfg.ignore_non_rigid_motions)
    if run_type == "tpose":
        ignore_nr = True
    elif run_type == "tpose_pose_condition":
        if int(environ.get("FORCE_NON_RIGID_MOTIONS", 0)) == 1:
            if not named:
                folder = run_type + "_w-delta"
        else:
            ignore_nr = True
    return folder, ignore_nr


def run(cfg, run_type: str):
    folder, cfg.ignore_non_rigid_motions = resolve_render_mode(cfg, run_type)
    # RETURN_POSE=true dumps each frame's refined pose (run.py:241,347,442).
    # Upstream the dict construction is commented out (network.py:678-686,
    # so the env toggle raises UnboundLocalError there); we dump the intended
    # payload: the pose decoder's correction output per frame.
    return_pose = os.environ.get("RETURN_POSE", "False").lower() == "true"
    pose_dump = {}
    net, params = load_network(cfg)
    from humannerf_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    renderer = EvalRenderer(net, chunk=min(cfg.chunk, 8192),
                            mesh=mesh if mesh.devices.size > 1 else None)
    dataset = create_dataset(cfg, run_type)
    loader = Loader(dataset, shuffle=False, prefetch=2)

    out_dir = os.path.join(cfg.logdir, cfg.load_net + cfg.eval_output_tag)
    writer = ImageWriter(out_dir, folder)

    # multihead eval: head_id -1 renders every head (run.py:75-82)
    multi = cfg.multihead.head_num > 1 and cfg.test.head_id == -1
    head_mode = "all" if multi else (
        "select" if cfg.multihead.head_num > 1 else "single")
    head_writers = None
    if multi:
        head_writers = [ImageWriter(out_dir + f"_h{h}", folder)
                        for h in range(cfg.multihead.head_num)]

    # one LPIPS net shared by every writer (per-head copies would load and
    # jit K identical VGG trunks)
    lpips_fn = make_lpips_metric_fn(init_lpips_params(cfg.lpips.weights)) \
        if "lpips" in cfg.eval.metrics else None

    def _make_metrics(d):
        kw = {}
        if lpips_fn is not None:
            kw = {"lpips_fn": lpips_fn,
                  "lpips_trunk": lpips_trunk_kind(cfg.lpips.weights)}
        return MetricsWriter(d, folder,
                             dataset=cfg[run_type].get("dataset", "?"),
                             metrics=cfg.eval.metrics, **kw)

    # metric writers: one per head in multihead eval (the reference evaluates
    # each rendered head, run.py:235-238), else a single writer
    metrics = None
    head_metrics = None
    if run_type in _EVAL_TYPES:
        if multi:
            head_metrics = [_make_metrics(out_dir + f"_h{h}")
                            for h in range(cfg.multihead.head_num)]
        else:
            metrics = _make_metrics(out_dir)

    bg = np.array(cfg.bgcolor, np.float32) / 255.0
    save_together = {}
    full_outputs = cfg.test.save_3d or cfg.test.save_3d_together
    for step, item in enumerate(loader):
        out = renderer.render_frame(params, item, cfg.eval_iter,
                                    full_outputs=full_outputs,
                                    head_mode=head_mode,
                                    head_id=int(cfg.test.head_id))
        W, H = item["img_width"], item["img_height"]
        truth = item.get("target_rgbs")
        name = item.get("frame_name", f"{step:06d}").replace("/", "-")
        if return_pose and not cfg.pose_decoder_off:
            from humannerf_tpu.models import mlps
            po = mlps.apply_pose_refiner(
                params["pose_decoder"], item["dst_posevec"],
                total_bones=cfg.total_bones, dtype=net.compute_dtype)
            pose_dump[name] = jax.tree.map(np.asarray, po)
        heads = range(cfg.multihead.head_num) if multi else (None,)
        for h in heads:
            o = jax.tree.map(lambda x: x[h], out) if multi else out
            rgb_img, alpha_img, truth_img = unpack_to_image(
                W, H, item["ray_mask"], bg, o["rgb"], alpha=o["alpha"],
                truth=truth if truth is not None and truth.ndim == 2 else None)
            if truth is not None and truth.ndim == 3:
                truth_img = to_8b_image(truth)

            imgs = [rgb_img]
            if cfg.show_truth and truth_img is not None:
                imgs.append(truth_img)
            if cfg.show_alpha and alpha_img is not None:
                imgs.append(alpha_img)
            w_ = head_writers[h] if multi else writer
            w_.append(np.concatenate(imgs, axis=1), img_name=f"{step:06d}")

            m_ = head_metrics[h] if multi and head_metrics else metrics
            if m_ is not None and truth_img is not None:
                m_.append(name if name not in m_.per_image
                          else f"{name}_{step}", rgb_img, truth_img)

            if cfg.test.save_3d or cfg.test.save_3d_together:
                w = o["weights_on_rays"]                   # (R, S)
                wmax = w.max(axis=1)
                keep = wmax > cfg.test.weight_threshold
                xyz = (o["xyz_on_rays"][keep]
                       * w[keep][..., None]).sum(axis=1)
                rgbp = (o["rgb_on_rays"][keep]
                        * w[keep][..., None]).sum(axis=1)
                if cfg.test.save_3d:
                    w_.append_cnl_3d(xyz, rgbp, obj_name=f"{step}-cnl")
                if cfg.test.save_3d_together and not multi:
                    # one pickle of all frames' canonical points in the
                    # reference's (N, 10) layout [xyz, rgb, wmax, row, col,
                    # lbs_argmax] (run.py:388-404) consumed by the
                    # segment / distance / warp-img analysis subcommands
                    rgb_gt = truth[keep] \
                        if truth is not None and truth.ndim == 2 else rgbp
                    pos = np.argwhere(
                        np.asarray(item["ray_mask"]).reshape(H, W))[keep]
                    lbs = (w[..., None] * o["backward_motion_weights"]
                           ).sum(axis=1).argmax(axis=1)[keep]
                    save_together[name] = np.concatenate(
                        [xyz, rgb_gt, wmax[keep, None],
                         pos.astype(np.float32), lbs[:, None]], axis=-1)

    if save_together:
        writer.save_pkl(save_together, "name-2-3d")
    if pose_dump:
        import pickle
        with open(os.path.join(out_dir,
                               f"{folder}-pose_refine_output.pkl"),
                  "wb") as f:
            pickle.dump(pose_dump, f)
    writer.finalize()
    if head_writers:
        for w_ in head_writers:
            w_.finalize()
    if head_metrics is not None:
        avgs = {}
        for h, m_ in enumerate(head_metrics):
            avg = m_.finalize()
            print(f"metrics[h{h}]:",
                  {k: round(v, 4) for k, v in avg.items()})
            avgs[f"h{h}"] = avg
        return avgs
    if metrics is not None:
        avg = metrics.finalize()
        print("metrics:", {k: round(v, 4) for k, v in avg.items()})
        return avg
    return None
