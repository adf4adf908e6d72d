"""Host-side datasets (numpy) for training and rendering.

Covers the reference's core/data/human_nerf/{train,freeview,tpose}.py with a
TPU-shaped output contract:

  * patch mode emits FIXED-SHAPE arrays: rays padded to N_patches * size^2
    plus `patch_ray_idx` -- an int32 (N_patches, size, size) map from patch
    pixel to ray slot (-1 = background). This turns the reference's boolean
    mask scatter (trainer.py:28-37) into an XLA-friendly gather.
  * image mode emits the masked-ray arrays + ray_mask; the eval driver pads
    to a block multiple before jit.

Also restores the two dataset modules the reference configs point at but
which are missing on disk (core.data.human_nerf.novelpose /
tpose_pose_condition -- SURVEY.md §2.2 "fork rot"): novelpose rendering is
the image-mode Dataset over a pose directory, and tpose_pose_condition is
TposeDataset with per-frame pose conditions.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from humannerf_tpu.utils.body import (approx_gaussian_bone_volumes,
                                      body_pose_to_body_RTs,
                                      get_canonical_global_tfms, rodrigues,
                                      skeleton_to_bbox)
from humannerf_tpu.utils.camera import (apply_global_tfm_to_camera,
                                        get_camrot,
                                        rotate_camera_by_frame_idx)
# ray generation + AABB culling run per item over H*W rays: use the C++
# host kernels (humannerf_tpu/native) with automatic numpy fallback
from humannerf_tpu.native.hostops import (get_rays_from_KRT,
                                          rays_intersect_3d_bbox)
from humannerf_tpu.utils.image import load_image, to_3ch_image


def load_zju_raw_mask(source_path: str, img_name: str) -> np.ndarray:
    """Union of 'mask' and 'mask_cihp' from a raw ZJU capture
    (tools/prepare_zju_mocap/prepare_dataset.py:45-59). Returns uint8 {0,255}."""
    base = img_name[:-4] + ".png"
    m1 = np.array(load_image(os.path.join(source_path, "mask", base)))[:, :, 0]
    m2 = np.array(load_image(
        os.path.join(source_path, "mask_cihp", base)))[:, :, 0]
    msk = ((m1 != 0) | (m2 != 0)).astype(np.uint8) * 255
    return msk


def _parse_frame_camera(name: str):
    """'frame_000563_view_12' / 'Camera_B13/000299.jpg' / '000123' ->
    (frame, camera) ints (reference train.py:145-162)."""
    stem = name.split(".")[0]
    if "frame" in stem:
        if "_view_" in stem:
            f, c = stem.split("_view_")
            return int(f.split("frame_")[1]), int(c)
        return int(stem.split("frame_")[1]), 0
    if "Camera" in stem:
        c, f = stem.split("/")
        return int(f), int(c.split("Camera_B")[1])
    return int(stem), 0


class _LRU:
    """Tiny bounded cache for deterministic per-frame host work. dict ops
    are GIL-atomic, so the prefetch worker and the main thread can share it
    (worst case: a duplicated recompute)."""

    def __init__(self, max_items: int):
        self.max_items = int(max_items)
        self._d = {}

    def get(self, key):
        v = self._d.pop(key, None)
        if v is not None:
            self._d[key] = v            # refresh recency
        return v

    def put(self, key, value):
        if self.max_items <= 0:
            return value
        while len(self._d) >= self.max_items:
            self._d.pop(next(iter(self._d)))
        self._d[key] = value
        return value


class BaseHumanDataset:
    """Shared loading of canonical joints, bone prior, cameras, mesh infos."""

    def __init__(self, cfg, dataset_path, keyfilter=None):
        self.cfg = cfg
        self.dataset_path = dataset_path
        self.keyfilter = keyfilter or []
        # deterministic per-frame host work (decode/undistort; ray-bbox
        # intersections) is recomputed every epoch by the reference; at
        # 9+ it/s on one chip the host pipeline must keep up, so both are
        # cached (bounded; ~1.5 MB/frame decoded at 512px)
        self._decode_cache = _LRU(cfg.get_path("host_cache.decoded", 1024))
        self._isect_cache = _LRU(cfg.get_path("host_cache.isect", 4096))
        with open(os.path.join(dataset_path, "canonical_joints.pkl"), "rb") as f:
            self.canonical_joints = pickle.load(f)["joints"].astype(np.float32)
        self.canonical_bbox = skeleton_to_bbox(self.canonical_joints,
                                               cfg.bbox_offset)
        if "motion_weights_priors" in self.keyfilter:
            self.motion_weights_priors = approx_gaussian_bone_volumes(
                self.canonical_joints,
                self.canonical_bbox["min_xyz"], self.canonical_bbox["max_xyz"],
                grid_size=cfg.mweight_volume.volume_size).astype(np.float32)

    def frame_common(self) -> dict:
        """Keys shared by every item: canonical bbox + weight prior."""
        out = {}
        if "motion_weights_priors" in self.keyfilter:
            out["motion_weights_priors"] = self.motion_weights_priors
        if "cnl_bbox" in self.keyfilter:
            mn = self.canonical_bbox["min_xyz"].astype(np.float32)
            mx = self.canonical_bbox["max_xyz"].astype(np.float32)
            out.update({
                "cnl_bbox_min_xyz": mn,
                "cnl_bbox_max_xyz": mx,
                "cnl_bbox_scale_xyz": (2.0 / (mx - mn)).astype(np.float32),
            })
        return out

    def motion_keys(self, poses, tpose_joints) -> dict:
        out = {}
        if "motion_bases" in self.keyfilter:
            dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, tpose_joints)
            out.update({
                "dst_Rs": dst_Rs, "dst_Ts": dst_Ts,
                "cnl_gtfms": get_canonical_global_tfms(self.canonical_joints),
            })
        if "dst_posevec_69" in self.keyfilter:
            out["dst_posevec"] = (poses[3:] + 1e-2).astype(np.float32)
        return out


class Dataset(BaseHumanDataset):
    """Preprocessed-capture dataset: training (patch rays) and eval (image rays).

    Reference: core/data/human_nerf/train.py:25-755 minus the rgb-history /
    multihead branches (later milestones).
    """

    def __init__(self, cfg, dataset_path, source_path=None, keyfilter=None,
                 maxframes=-1, bgcolor=None, ray_shoot_mode="image", skip=1,
                 select_views="all", pose_condition_file=None,
                 pose_condition_file_cmlp=None, seed=None, **_):
        super().__init__(cfg, dataset_path, keyfilter)
        self.source_path = source_path
        self.image_dir = (os.path.join(dataset_path, "images")
                          if source_path is None else source_path)
        with open(os.path.join(dataset_path, "cameras.pkl"), "rb") as f:
            self.cameras = pickle.load(f)
        with open(os.path.join(dataset_path, "mesh_infos.pkl"), "rb") as f:
            self.mesh_infos = pickle.load(f)
        for name, info in self.mesh_infos.items():
            info["bbox"] = skeleton_to_bbox(info["joints"], cfg.bbox_offset)

        framelist = self._load_frame_list()
        self.framelist_all = framelist
        if select_views != "all":
            framelist = [f for f in framelist
                         if _parse_frame_camera(f)[1] in select_views]
        self.framelist = framelist[::skip]
        if maxframes > 0:
            self.framelist = self.framelist[:maxframes]
        self.views = sorted({_parse_frame_camera(f)[1]
                             for f in self.framelist})
        self.bgcolor = bgcolor
        self.ray_shoot_mode = ray_shoot_mode
        self.rng = np.random.RandomState(seed)

        self.pose_condition_list = self._load_pose_condition(
            pose_condition_file)
        self.pose_condition_list_cmlp = self._load_pose_condition(
            pose_condition_file_cmlp)

    def _load_pose_condition(self, path):
        if path is None or path == "empty":
            return None
        table = np.load(path)
        return [table[_parse_frame_camera(f)[0]] for f in self.framelist]

    def _load_frame_list(self):
        if self.source_path is None:
            img_dir = os.path.join(self.dataset_path, "images")
            frames = sorted(os.path.splitext(f)[0]
                            for f in os.listdir(img_dir)
                            if f.endswith(".png"))
        else:
            frames = list(self.mesh_infos.keys())
        sel = self.cfg.train.selected_frame
        if sel != "all" and os.path.isfile(sel):
            selected = [l.strip() for l in open(sel)]
            frames = [f for f in selected if f in frames]
        return frames

    def __len__(self):
        return len(self.framelist)

    # -- image loading -------------------------------------------------------

    def _decode_frame(self, frame_name):
        """Disk -> post-undistort (img, mask) arrays; deterministic, cached.
        Cached arrays are frozen -- every consumer below copies on write."""
        hit = self._decode_cache.get(frame_name)
        if hit is not None:
            return hit
        if self.source_path is None:
            img_path = os.path.join(self.image_dir, frame_name + ".png")
            mask = np.array(load_image(
                os.path.join(self.dataset_path, "masks", frame_name + ".png")))
            if mask.max() == 1:
                mask = mask * 255
        else:
            img_path = os.path.join(self.image_dir, frame_name)
            mask = to_3ch_image(load_zju_raw_mask(self.source_path, frame_name))
        img = np.array(load_image(img_path))

        cam = self.cameras.get(frame_name)
        if cam is not None and "distortions" in cam:
            import cv2
            K, D = cam["intrinsics"], cam["distortions"]
            img = cv2.undistort(img, K, D)
            mask = cv2.undistort(mask, K, D)
        img.flags.writeable = False
        mask.flags.writeable = False
        return self._decode_cache.put(frame_name, (img, mask))

    def load_image(self, frame_name, bg_color):
        cfg = self.cfg
        img, mask = self._decode_frame(frame_name)
        mask = mask / 255.0
        img = self._color_perturb_per_view(img, frame_name)
        img = mask * img + (1.0 - mask) * bg_color[None, None, :]
        if cfg.resize_img_scale != 1.0:
            import cv2
            img = cv2.resize(img, None, fx=cfg.resize_img_scale,
                             fy=cfg.resize_img_scale,
                             interpolation=cv2.INTER_LANCZOS4)
            mask = cv2.resize(mask, None, fx=cfg.resize_img_scale,
                              fy=cfg.resize_img_scale,
                              interpolation=cv2.INTER_LINEAR)
        return img.astype(np.float32), mask.astype(np.float32)

    # -- color perturbation experiments (train.py:342-405) ---------------------

    def _color_perturb_per_view(self, img, frame_name):
        """Per-view color perturbation ablation (train.py:375-405)."""
        exp = self.cfg.experiments
        if exp.color_perturbation != "per_view":
            return img
        _, camera = _parse_frame_camera(frame_name)
        img = img.astype(np.float32)
        if exp.color_perturbation_strength == "strong":
            if camera == 0:
                img[:, :, 0] = np.clip(img[:, :, 0] * 0.8 - 0.2, 0, 1)
            elif camera == 6:
                img[:, :, 1] = np.clip(img[:, :, 1] * 1.2 + 0.2, 0, 1)
            elif camera == 12:
                img = img * 0.5
        elif exp.color_perturbation_strength == "weak":
            scale = {0: 0.6, 6: 0.8, 12: 1.2}.get(camera)
            if scale is not None:
                img = np.clip(img * scale, 0, 255)
        return img

    def _color_perturb_per_pixel(self, img, alpha, rays_d):
        """Direction-dependent pixel perturbation (train.py:342-349)."""
        scale = (rays_d @ np.array([1.0, 1.0, 1.0]) + 2.0) / 2.5
        perturbed = np.clip(img * scale[..., None], 0, 1)
        return (perturbed * alpha + img * (1 - alpha)).astype(np.float32)

    # -- patch sampling --------------------------------------------------------

    def _sample_patch(self, candidate_mask, ray_mask_flat, masked_indices,
                      patch_size, H, W):
        """One patch: random center in candidate_mask, clipped to the image.
        Returns (ray slot indices into the masked-ray array, patch pixel mask,
        xy_min, xy_max). Reference train.py:293-340. masked_indices is the
        caller's cumsum(ray_mask)-1 (hoisted: it is patch-independent)."""
        ys, xs = np.where(candidate_mask)
        pick = self.rng.randint(len(ys))
        cx, cy = xs[pick], ys[pick]
        half = patch_size // 2
        x_min = np.clip(cx - half, 0, W - patch_size)
        y_min = np.clip(cy - half, 0, H - patch_size)
        x_max, y_max = x_min + patch_size, y_min + patch_size

        rm = ray_mask_flat.reshape(H, W)[y_min:y_max, x_min:x_max]
        mi = masked_indices.reshape(H, W)[y_min:y_max, x_min:x_max]
        ray_idx = mi[rm]
        return ray_idx, rm, (x_min, y_min), (x_max, y_max)

    def sample_patch_rays(self, img, H, W, subject_mask, ray_mask_flat):
        """N_patches patches; subject area w.p. sample_subject_ratio else
        bbox-minus-subject (train.py:259-266). Emits the gather map."""
        cfg = self.cfg
        n_patches, psize = cfg.patch.N_patches, cfg.patch.size
        bbox_mask = ray_mask_flat.reshape(H, W)
        bbox_not_subject = bbox_mask & ~subject_mask
        masked_indices = np.cumsum(ray_mask_flat) - 1

        select_inds, targets = [], []
        patch_ray_idx = np.full((n_patches, psize, psize), -1, np.int32)
        total = 0
        for p in range(n_patches):
            use_subject = self.rng.rand() < cfg.patch.sample_subject_ratio
            cand = subject_mask if use_subject else bbox_not_subject
            if not cand.any():
                cand = subject_mask if subject_mask.any() else bbox_mask
            ray_idx, pmask, (x0, y0), (x1, y1) = self._sample_patch(
                cand, ray_mask_flat, masked_indices, psize, H, W)
            slots = np.arange(total, total + len(ray_idx), dtype=np.int32)
            patch_ray_idx[p][pmask] = slots
            total += len(ray_idx)
            select_inds.append(ray_idx)
            targets.append(img[y0:y1, x0:x1])
        return (np.concatenate(select_inds, axis=0),
                np.stack(targets, axis=0).astype(np.float32),
                patch_ray_idx, total)

    # -- item ------------------------------------------------------------------

    def _frame_name_for(self, frame_int: int, camera_int: int) -> str:
        """Inverse of _parse_frame_camera for ZJU v2 naming (train.py:164-169)."""
        name = f"Camera_B{camera_int}/{frame_int:06d}.jpg"
        if name in self.framelist_all or name in self.mesh_infos:
            return name
        name = f"frame_{frame_int:06d}_view_{camera_int:02d}"
        if name in self.mesh_infos:
            return name
        return f"frame_{frame_int:06d}"

    def _history_keys(self, frame_name: str, bgcolor) -> dict:
        """RGB-history inputs: per past frame, SMPL bases + every view's
        K@E and image (reference train.py:667-720). Only consecutive frame
        numbering is supported, like the reference."""
        cfg = self.cfg
        frame_id, _cam = _parse_frame_camera(frame_name)
        views = sorted({_parse_frame_camera(f)[1]
                        for f in self.framelist_all})
        Rs_h, Ts_h, posevec_h, w2c_h, rgb_h = [], [], [], [], []
        for i in np.arange(1, cfg.rgb_history.last_num + 1) \
                * cfg.rgb_history.step:
            fid = max(frame_id - int(i), 0)
            name_any = self._frame_name_for(fid, views[0])
            info = self.mesh_infos[name_any]
            dst_Rs, dst_Ts = body_pose_to_body_RTs(
                info["poses"].astype(np.float32),
                info["tpose_joints"].astype(np.float32))
            Rs_h.append(dst_Rs)
            Ts_h.append(dst_Ts)
            posevec_h.append(info["poses"][3:].astype(np.float32) + 1e-2)
            view_w2c, view_rgb = [], []
            for cid in views:
                nm = self._frame_name_for(fid, cid)
                K = self.cameras[nm]["intrinsics"][:3, :3].copy()
                K[:2] *= cfg.resize_img_scale
                E = apply_global_tfm_to_camera(
                    self.cameras[nm]["extrinsics"], info["Rh"], info["Th"])
                view_w2c.append((K @ E[:3, :]).astype(np.float32))
                img, _a = self.load_image(nm, bgcolor)
                view_rgb.append((img / 255.0).astype(np.float32))
            w2c_h.append(np.stack(view_w2c))
            rgb_h.append(np.stack(view_rgb))
        return {
            "dst_Rs_history": np.stack(Rs_h),
            "dst_Ts_history": np.stack(Ts_h),
            "dst_posevec_history": np.stack(posevec_h),
            "w2c_history": np.stack(w2c_h),
            "rgb_history": np.stack(rgb_h),
        }

    def _head_id_for(self, frame_name: str) -> int:
        """Multihead head assignment per split mode (train.py:489-537)."""
        cfg = self.cfg
        if cfg.multihead.head_num == 1:
            return 0
        if self.ray_shoot_mode == "image":
            return int(cfg.test.head_id)
        split = cfg.multihead.split
        if split == "view":
            return self.views.index(_parse_frame_camera(frame_name)[1])
        if split == "random":
            return int(self.rng.randint(cfg.multihead.head_num))
        if split == "argmin":
            return -1
        if os.path.isfile(split):
            import json
            if not hasattr(self, "_sample2head"):
                with open(split) as f:
                    self._sample2head = json.load(f)
            return int(self._sample2head[frame_name])
        raise ValueError(f"unknown multihead split {split}")

    def get_item(self, idx: int) -> dict:
        cfg = self.cfg
        frame_name = self.framelist[idx]
        results = {
            "frame_name": frame_name,
            "frame_id": np.int32(_parse_frame_camera(frame_name)[0]),
            "dir_idx": np.int32(self.views.index(
                _parse_frame_camera(frame_name)[1])),
            "head_id": np.int32(self._head_id_for(frame_name)),
        }

        if self.bgcolor is None:
            bgcolor = (self.rng.rand(3) * 255.0).astype(np.float32)
        else:
            bgcolor = np.array(self.bgcolor, dtype=np.float32)

        img, alpha = self.load_image(frame_name, bgcolor)
        img = (img / 255.0).astype(np.float32)
        H, W = img.shape[:2]

        info = self.mesh_infos[frame_name]
        dst_bbox = info["bbox"]
        poses = info["poses"].astype(np.float32)
        tpose_joints = info["tpose_joints"].astype(np.float32)

        cached = self._isect_cache.get(frame_name)
        if cached is None:
            K = self.cameras[frame_name]["intrinsics"][:3, :3].copy()
            K[:2] *= cfg.resize_img_scale
            E0 = self.cameras[frame_name]["extrinsics"]
            _, rays_d_camera = get_rays_from_KRT(H, W, K, E0[:3, :3],
                                                 E0[:3, 3])
            E = apply_global_tfm_to_camera(E0, info["Rh"], info["Th"])
            rays_o, rays_d = get_rays_from_KRT(H, W, K, E[:3, :3], E[:3, 3])
            rays_o = rays_o.reshape(-1, 3)
            rays_d = rays_d.reshape(-1, 3)
            rays_d_camera = rays_d_camera.reshape(-1, 3)
            near, far, ray_mask = rays_intersect_3d_bbox(dst_bbox, rays_o,
                                                         rays_d)
            if cfg.experiments.color_perturbation == "per_pixel":
                # full pre-mask grids, kept only for this experiment
                rays_d_full, rays_d_camera_full = rays_d, rays_d_camera
            else:
                rays_d_full = rays_d_camera_full = None
            rays_o, rays_d = rays_o[ray_mask], rays_d[ray_mask]
            rays_d_camera = rays_d_camera[ray_mask]
            cached = (rays_o, rays_d, rays_d_camera, near, far, ray_mask,
                      rays_d_full, rays_d_camera_full)
            for a in cached:
                if a is not None:
                    a.flags.writeable = False
            self._isect_cache.put(frame_name, cached)
        (rays_o, rays_d, rays_d_camera, near, far, ray_mask,
         rays_d_full, rays_d_camera_full) = cached

        if cfg.experiments.color_perturbation == "per_pixel":
            d = rays_d_camera_full if (cfg.experiments
                                       .color_perturbation_according_to
                                       == "camera") else rays_d_full
            img = self._color_perturb_per_pixel(img, alpha,
                                                d.reshape(H, W, 3))

        ray_img = img.reshape(-1, 3)[ray_mask]

        # view-direction generalization probe: substitute the ray directions
        # of a different training camera (reference TEST_DIR env toggle,
        # train.py:598-613) -- configured as cfg.test.dir_view here
        dir_view = cfg.test.get("dir_view", None)
        if dir_view is not None and self.ray_shoot_mode == "image":
            probe_name = next(
                (f for f in self.framelist_all
                 if _parse_frame_camera(f)[1] == int(dir_view)), None)
            if probe_name is not None:
                Kp = self.cameras[probe_name]["intrinsics"][:3, :3].copy()
                Kp[:2] *= cfg.resize_img_scale
                Ep = apply_global_tfm_to_camera(
                    self.cameras[probe_name]["extrinsics"],
                    info["Rh"], info["Th"])
                _, rays_dp = get_rays_from_KRT(H, W, Kp, Ep[:3, :3],
                                               Ep[:3, 3])
                rays_d_camera = rays_dp.reshape(-1, 3)[ray_mask]

        if self.ray_shoot_mode == "patch":
            sel, targets, patch_ray_idx, n_valid = self.sample_patch_rays(
                img, H, W, alpha[:, :, 0] > 0.0, ray_mask)
            cap = cfg.patch.N_patches * cfg.patch.size ** 2

            def pad(a):
                out = np.zeros((cap,) + a.shape[1:], a.dtype)
                out[:len(sel)] = a[sel]
                return out

            results.update({
                "rays_o": pad(rays_o.astype(np.float32)),
                "rays_d": pad(rays_d.astype(np.float32)),
                "rays_d_camera": pad(rays_d_camera.astype(np.float32)),
                "near": pad(near.astype(np.float32)),
                "far": pad(far.astype(np.float32)),
                "target_patches": targets,
                "patch_ray_idx": patch_ray_idx,
                "num_valid_rays": np.int32(n_valid),
                "bgcolor": bgcolor,
            })
        elif self.ray_shoot_mode == "image":
            results.update({
                "img_width": W, "img_height": H,
                "ray_mask": ray_mask,
                "rays_o": rays_o.astype(np.float32),
                "rays_d": rays_d.astype(np.float32),
                "rays_d_camera": rays_d_camera.astype(np.float32),
                "near": near.astype(np.float32),
                "far": far.astype(np.float32),
                "bgcolor": bgcolor,
                "raw_rgbs": img,
            })
            if "target_rgbs" in self.keyfilter:
                results["target_rgbs"] = ray_img.astype(np.float32)
        else:
            raise ValueError(f"invalid ray_shoot_mode {self.ray_shoot_mode}")

        results.update(self.motion_keys(poses, tpose_joints))
        results.update(self.frame_common())
        results["dst_bbox_min_xyz"] = dst_bbox["min_xyz"].astype(np.float32)
        results["dst_bbox_max_xyz"] = dst_bbox["max_xyz"].astype(np.float32)
        if cfg.rgb_history.last_num > 0 and "motion_bases" in self.keyfilter:
            results.update(self._history_keys(frame_name, bgcolor))
        if self.pose_condition_list is not None:
            pc = np.array(self.pose_condition_list[idx], np.float32)
            if (cfg.pose_condition_random_mask == "second-half"
                    and self.ray_shoot_mode == "patch"
                    and self.rng.rand() < cfg.pose_condition_mask_prob):
                pc[len(pc) // 2:] = 0
            results["pose_condition"] = pc
        if self.pose_condition_list_cmlp is not None:
            results["pose_condition_cmlp"] = np.array(
                self.pose_condition_list_cmlp[idx], np.float32)
        elif "pose_condition" in results:
            results["pose_condition_cmlp"] = results["pose_condition"]
        return results

    __getitem__ = get_item


class FreeviewDataset(BaseHumanDataset):
    """Fixed frame, orbiting camera (core/data/human_nerf/freeview.py).

    Fixes the reference fork bug that packed only 2 ray rows where the
    network unpacks 3 (freeview.py:232 vs network.py:771): rays_d_camera is
    emitted explicitly.
    """

    # orbit conventions per source (freeview.py:25-28)
    ROT_CAM_PARAMS = {
        "zju_mocap": {"rotate_axis": "z", "inv_angle": True},
        "wild": {"rotate_axis": "y", "inv_angle": False},
    }

    def __init__(self, cfg, dataset_path, keyfilter=None, frame_idx=None,
                 bgcolor=None, src_type="zju_mocap", total_frames=None, **_):
        super().__init__(cfg, dataset_path, keyfilter)
        with open(os.path.join(dataset_path, "cameras.pkl"), "rb") as f:
            cameras = pickle.load(f)
        with open(os.path.join(dataset_path, "mesh_infos.pkl"), "rb") as f:
            mesh_infos = pickle.load(f)
        self.image_dir = os.path.join(dataset_path, "images")
        frames = sorted(os.path.splitext(f)[0]
                        for f in os.listdir(self.image_dir)
                        if f.endswith(".png"))
        if frame_idx is None:
            frame_idx = cfg.freeview.frame_idx
        self.frame_name = frames[frame_idx] if isinstance(frame_idx, int) \
            else frame_idx
        self.info = mesh_infos[self.frame_name]
        self.info["bbox"] = skeleton_to_bbox(self.info["joints"],
                                             cfg.bbox_offset)
        self.camera = cameras[self.frame_name]
        self.total_frames = total_frames or cfg.render_frames
        self.bgcolor = bgcolor if bgcolor is not None else [255.0, 255.0, 255.0]
        self.src_type = src_type

    def __len__(self):
        return self.total_frames

    def _load_train_image(self, bgcolor):
        img = np.array(load_image(
            os.path.join(self.image_dir, self.frame_name + ".png")))
        mask = np.array(load_image(os.path.join(
            self.dataset_path, "masks", self.frame_name + ".png")))
        if "distortions" in self.camera:
            import cv2
            img = cv2.undistort(img, self.camera["intrinsics"],
                                self.camera["distortions"])
            mask = cv2.undistort(mask, self.camera["intrinsics"],
                                 self.camera["distortions"])
        mask = mask / 255.0
        img = mask * img + (1.0 - mask) * bgcolor[None, None, :]
        if self.cfg.resize_img_scale != 1.0:
            import cv2
            img = cv2.resize(img, None, fx=self.cfg.resize_img_scale,
                             fy=self.cfg.resize_img_scale,
                             interpolation=cv2.INTER_LANCZOS4)
        return img.astype(np.float32)

    def get_item(self, idx: int) -> dict:
        cfg = self.cfg
        info = self.info
        bgcolor = np.array(self.bgcolor, np.float32)
        img = self._load_train_image(bgcolor) / 255.0
        H, W = img.shape[:2]

        # orbit around the subject's world translation (freeview.py:209-213)
        E_rot = rotate_camera_by_frame_idx(
            self.camera["extrinsics"], idx, period=self.total_frames,
            trans=info["Th"].astype(np.float64),
            **self.ROT_CAM_PARAMS[self.src_type])
        K = self.camera["intrinsics"][:3, :3].copy()
        K[:2] *= cfg.resize_img_scale
        _, rays_d_camera = get_rays_from_KRT(H, W, K, E_rot[:3, :3],
                                             E_rot[:3, 3])
        E = apply_global_tfm_to_camera(E_rot, info["Rh"], info["Th"])
        rays_o, rays_d = get_rays_from_KRT(H, W, K, E[:3, :3], E[:3, 3])
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        rays_d_camera = rays_d_camera.reshape(-1, 3)
        near, far, ray_mask = rays_intersect_3d_bbox(
            info["bbox"], rays_o, rays_d)

        results = {
            "frame_name": self.frame_name,
            "img_width": W, "img_height": H,
            "ray_mask": ray_mask,
            "rays_o": rays_o[ray_mask].astype(np.float32),
            "rays_d": rays_d[ray_mask].astype(np.float32),
            "rays_d_camera": rays_d_camera[ray_mask].astype(np.float32),
            "near": near.astype(np.float32),
            "far": far.astype(np.float32),
            "bgcolor": bgcolor,
        }
        if "target_rgbs" in self.keyfilter:
            results["target_rgbs"] = img
        results.update(self.motion_keys(info["poses"].astype(np.float32),
                                        info["tpose_joints"].astype(np.float32)))
        results.update(self.frame_common())
        results["dst_bbox_min_xyz"] = info["bbox"]["min_xyz"].astype(np.float32)
        results["dst_bbox_max_xyz"] = info["bbox"]["max_xyz"].astype(np.float32)
        return results

    __getitem__ = get_item


class TposeDataset(BaseHumanDataset):
    """Canonical-pose rendering with a synthetic orbiting root + fixed camera
    (core/data/human_nerf/tpose.py:21-227)."""

    RENDER_SIZE = 512
    CAM_PARAMS = {"radius": 6.0, "focal": 1250.0}

    def __init__(self, cfg, dataset_path, keyfilter=None, bgcolor=None,
                 total_frames=None, pose_condition_file=None, **_):
        super().__init__(cfg, dataset_path, keyfilter)
        self.total_frames = total_frames or cfg.render_frames
        self.bgcolor = bgcolor if bgcolor is not None else [255.0, 255.0, 255.0]
        K, E = self.setup_camera(self.RENDER_SIZE, **self.CAM_PARAMS)
        self.camera = {"K": K, "E": E}
        if pose_condition_file not in (None, "empty"):
            self.pose_condition = np.load(pose_condition_file)
        else:
            self.pose_condition = None

    @staticmethod
    def setup_camera(img_size, radius, focal):
        campos = np.array([0.0, -0.25, radius], np.float32)
        camrot = get_camrot(campos, lookat=np.array([0.0, -0.25, 0.0]),
                            inv_camera=True)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = camrot
        E[:3, 3] = -camrot @ campos
        K = np.eye(3, dtype=np.float32)
        K[0, 0] = K[1, 1] = focal
        K[:2, 2] = img_size / 2.0
        return K, E

    @staticmethod
    def rotate_bbox(bbox, rmtx):
        mn, mx = bbox["min_xyz"], bbox["max_xyz"]
        corners = np.array([[x, y, z] for x in (mn[0], mx[0])
                            for y in (mn[1], mx[1]) for z in (mn[2], mx[2])])
        rot = corners @ rmtx
        return {"min_xyz": rot.min(axis=0), "max_xyz": rot.max(axis=0)}

    def __len__(self):
        return self.total_frames

    def get_item(self, idx: int) -> dict:
        H = W = self.RENDER_SIZE
        dst_poses = np.zeros(72, np.float32)
        # rotate root around y (tpose.py:156-161)
        angle = 2.0 * np.pi / self.total_frames * idx
        add_rmtx = rodrigues(np.array([0.0, -angle, 0.0]))
        root = rodrigues(dst_poses[:3])
        new_root = add_rmtx @ root
        # matrix -> axis-angle via numpy (inverse rodrigues)
        dst_poses[:3] = _matrix_to_axis_angle(new_root)
        dst_bbox = self.rotate_bbox(self.canonical_bbox, add_rmtx)

        K = self.camera["K"]
        E = self.camera["E"]
        rays_o, rays_d = get_rays_from_KRT(H, W, K, E[:3, :3], E[:3, 3])
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        near, far, ray_mask = rays_intersect_3d_bbox(dst_bbox, rays_o, rays_d)

        results = {
            "frame_name": f"tpose_{idx:06d}",
            "img_width": W, "img_height": H,
            "ray_mask": ray_mask,
            "rays_o": rays_o[ray_mask].astype(np.float32),
            "rays_d": rays_d[ray_mask].astype(np.float32),
            "rays_d_camera": rays_d[ray_mask].astype(np.float32),
            "near": near.astype(np.float32),
            "far": far.astype(np.float32),
            "bgcolor": np.array(self.bgcolor, np.float32),
        }
        results.update(self.motion_keys(dst_poses, self.canonical_joints))
        results.update(self.frame_common())
        results["dst_bbox_min_xyz"] = dst_bbox["min_xyz"].astype(np.float32)
        results["dst_bbox_max_xyz"] = dst_bbox["max_xyz"].astype(np.float32)
        if self.pose_condition is not None:
            results["pose_condition"] = np.array(
                self.pose_condition[idx % len(self.pose_condition)],
                np.float32)
        return results

    __getitem__ = get_item


def _matrix_to_axis_angle(R: np.ndarray) -> np.ndarray:
    """Inverse Rodrigues (3,3)->(3,) via quaternion extraction (Shepperd's
    method) -- numerically robust for all angles including theta ~ pi."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2.0
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    q = q / np.linalg.norm(q)
    w = np.clip(q[0], -1.0, 1.0)
    theta = 2.0 * np.arccos(w)
    sin_half = np.sqrt(max(1.0 - w * w, 0.0))
    if sin_half < 1e-9:
        return np.zeros(3, np.float32)
    if theta > np.pi:
        theta -= 2.0 * np.pi
    return (q[1:] / sin_half * theta).astype(np.float32)
