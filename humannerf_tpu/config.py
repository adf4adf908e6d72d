"""Config system: typed-ish nested dict with 3-layer merge.

Replaces the reference's vendored yacs fork (third_parties/yacs/yacs.py) and
configs/config.py. Semantics preserved:

  * defaults (here, in Python) <- experiment yaml <- CLI ``key value`` pairs
    (configs/config.py:58-69)
  * unknown keys in yaml are accepted and added (the reference's patched
    ``_merge_a_into_b``, third_parties/yacs/yacs.py:386-394)
  * dotted CLI overrides: ``train.maxiter 1000``
  * derived fields: ``logdir = experiments/{category}/{task}/{subject}/{experiment}``
    (configs/config.py:38)

Dropped on purpose: primary/secondary GPU topology (configs/config.py:41-55)
-- the TPU build uses a device mesh (parallel/mesh.py); and the known config
rot (``cfg.mƒultihead`` unicode typo, unconditional ``train.selected_frame``).
"""

from __future__ import annotations

import ast
import copy
import os

import yaml


class CN(dict):
    """A nested dict with attribute access. Values are plain Python objects."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        new = CN()
        for k, v in self.items():
            new[k] = copy.deepcopy(v, memo)
        return new

    @staticmethod
    def from_nested(d):
        if isinstance(d, dict):
            return CN({k: CN.from_nested(v) for k, v in d.items()})
        if isinstance(d, list):
            return [CN.from_nested(v) for v in d]
        return d

    def merge_from(self, other):
        """Recursively merge ``other`` into self. Unknown keys are added."""
        for k, v in other.items():
            if k in self and isinstance(self[k], CN) and isinstance(v, dict):
                self[k].merge_from(v)
            else:
                self[k] = CN.from_nested(v) if isinstance(v, dict) else v
        return self

    def merge_from_list(self, opts):
        """Merge dotted key/value pairs, e.g. ['train.maxiter', '1000']."""
        assert len(opts) % 2 == 0, f"override list must be key/value pairs: {opts}"
        for key, raw in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], CN):
                    node[p] = CN()
                node = node[p]
            node[parts[-1]] = _parse_value(raw)
        return self

    def get_path(self, dotted, default=None):
        node = self
        for p in dotted.split("."):
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node


def _parse_value(raw):
    if not isinstance(raw, str):
        return raw
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


# ---------------------------------------------------------------------------
# Defaults. Mirrors the tunables of the reference configs/default.yaml:1-404,
# minus the GPU-topology / imp.load_source module-path plumbing.
# Module choices are enum strings resolved by small registries, not file paths.
# ---------------------------------------------------------------------------

def default_config() -> CN:
    return CN.from_nested({
        "category": "human_nerf",
        "task": "experiment",
        "subject": "subject",
        "experiment": "default",
        "random_seed": 42,
        "resume": True,
        "bgcolor": [0.0, 0.0, 0.0],
        "resize_img_scale": 1.0,
        "render_frames": 100,
        "eval_iter": 10_000_000,
        "eval_output_tag": "",
        # overrides the render output folder name (default: the run type;
        # reference run.py passes render_folder_name through every run_*)
        "render_folder_name": "",
        "sex": "neutral",
        "total_bones": 24,
        "bbox_offset": 0.3,
        "load_net": "latest",
        "save_all": True,
        "N_samples": 128,
        "perturb": 1.0,
        "chunk": 32768,          # rays per render block at eval
        "netchunk": 300000,      # retained for config-surface parity (unused: XLA fuses)
        "show_alpha": False,
        "show_truth": False,
        "ignore_non_rigid_motions": False,
        "pose_decoder_off": False,
        "secondary_gpus": [0],   # parity shim; TPU build uses the mesh instead
        # compute dtype for the MLP stack. bfloat16 is the shipped default:
        # the measured quality tax vs float32 is 0.1 dB (PARITY.md
        # "Measured quality", benchmarks/quality_tax.py) while f32 renders
        # ~3.4x slower on v5e. float32 remains the reference-parity mode
        # (tests/test_reference_oracle.py pins it explicitly).
        "dtype": "bfloat16",
        "experiments": {
            "color_perturbation": "empty",
            "color_perturbation_strength": "strong",
            "color_perturbation_according_to": "camera",
        },
        "embedder": {"module": "fourier"},
        "vocab_embedder": {"module": "vocab"},
        "non_rigid_embedder": {"module": "hannw_fourier"},
        "condition_code": {
            "type": "global",
            "local": {
                "part2joints_file": "empty",
                "fg_threshold": 0.2,
                "threshold": -1.0,
            },
        },
        "rgb_history": {
            "last_num": 0,
            "step": 1,
            "feature_cfg": {"net": "resnet34", "layer": 6},
            "spatial_dim": 32,
            "temporal_dim": 32,
            "precompute_dir": "empty",
        },
        "canonical_mlp": {
            "module": "mlp_rgb_sigma",
            "mlp_depth": 8,
            "mlp_depth_plus": 0,
            "mlp_width": 256,
            "multires": 10,
            "i_embed": 0,
            "view_dir": False,
            "view_embed": "mlp",
            "view_dir_camera_only": False,
            "view_vocab_n": 4,
            "view_vocab_dim": 27,
            "pose_color": "wo",
            "pose_ch": 69,
            "multires_dir": 4,
            "last_linear_scale": 1,
            "condition_code_dim": 0,
            "condition_code_encoder": "none",
            "condition_code_delay": False,
            "kick_in_iter": 10000,
            "full_band_iter": 50000,
            "mlpseq": {"hidden_dim": 128, "output_dim": 64, "seq_len": 8,
                       "non_linear": True, "depth": 1},
            "selfattention": {"hidden_dim": 128, "output_dim": 64,
                              "positional_encoding_type": "learnable",
                              "pe_order": "after_fc", "pe_dim": 32,
                              "max_length": 8, "in_proj": "fc-relu"},
            "input_encoder": {
                "enable": False,
                "version": "v1",
                "seq_len": 8,
                "temporal_enc_method": "selfattention",
                "temporal_enc_cfg_selfattention": {
                    "hidden_dim": 64, "output_dim": 32,
                    "positional_encoding_type": "sine_fourier", "pe_dim": 8},
                "temporal_enc_cfg_mlp": {"hidden_dim": 64, "output_dim": 32,
                                         "non_linear": True, "depth": 1},
                "spatial_localize_cfg": {"enable": True, "threshold": -1.0,
                                         "part2joints_file": "empty",
                                         "fg_threshold": 0.2},
                "spatial_enc_method": "mlp",
                "spatial_enc_cfg_mlp": {"hidden_dim": 64, "output_dim": 32,
                                        "non_linear": True, "depth": 1},
                "fuse_method": "concat",
                "fuse_enc_cfg_tmlp": {"hidden_dim": 1, "output_dim": 0,
                                      "non_linear": True, "depth": 1},
            },
            "time_input": False,
            "time_embed": "vocab",
            "time_vocab_n": 654,
            "time_dim": 128,
            "multihead": {"enable": False, "head_depth": 1},
        },
        "mweight_volume": {
            "module": "deconv_vol_decoder",
            "embedding_size": 256,
            "volume_size": 32,
            "dst_voxel_size": 0.0625,
        },
        "posevec": {"type": "axis_angle"},
        "non_rigid_motion_model": "mlp",
        "non_rigid_motion_mlp": {
            "module": "mlp_offset",
            "condition_code_size": 69,
            "pose_input": True,
            "time_input": False,
            "time_embed": "vocab",
            "time_vocab_n": 654,
            "time_vocab_dim": 128,
            "multires_time": 2,
            "time_dim": 128,
            "mlp_width": 128,
            "mlp_depth_plus": 0,
            "mlp_depth": 6,
            "skips": [4],
            "multires": 6,
            "i_embed": 0,
            "kick_in_iter": 10000,
            "full_band_iter": 50000,
            "last_linear_scale": 1,
            "multihead": {"enable": False, "head_depth": 1},
        },
        "non_rigid_motion_mlp_sa": {
            "module": "mlp_offset_SA",
            "sa": {"version": 1, "sa_dim": 128,
                   "condition_embedding": "learnable",
                   "condition_max_length": 4},
            "condition_code_size": 69,
            "pose_input": True,
            "time_input": False,
            "time_embed": "vocab",
            "time_vocab_n": 654,
            "time_vocab_dim": 128,
            "multires_time": 2,
            "time_dim": 128,
            "mlp_width": 128,
            "mlp_depth_plus": 0,
            "mlp_depth": 5,
            "skips": [4],
            "multires": 6,
            "i_embed": 0,
            "kick_in_iter": 10000,
            "full_band_iter": 50000,
            "last_linear_scale": 1,
            "multihead": {"enable": False, "head_depth": 1},
        },
        "non_rigid_motion_transformer": {
            "d_model": 128, "nhead": 4, "num_encoder_layers": 2,
            "num_decoder_layers": 2, "dim_feedforward": 256,
            "joint_embedding": "learnable", "time_embedding": "learnable",
            "time_embedding_max_length": 20, "joint_embedding_max_length": 23,
        },
        "non_rigid_motion_transformer_encoder": {
            "d_model": 128, "nhead": 4, "num_encoder_layers": 4,
            "dim_feedforward": 256, "joint_embedding_type": "learnable",
            "time_embedding_type": "learnable",
            "time_embedding_max_length": 20, "joint_embedding_max_length": 23,
            "condition_input_dim": 9,
        },
        "non_rigid_motion_TStransformer_encoder": {
            "attention_order": "TS",
            "condition_input_dim": 3,
            "encoder1": {"d_model": 32, "nhead": 1, "num_encoder_layers": 1,
                         "dim_feedforward": 64, "embedding_type": "learnable",
                         "embedding_max_length": 4},
            "encoder2": {"d_model": 128, "nhead": 4, "num_encoder_layers": 1,
                         "dim_feedforward": 256,
                         "embedding_type": "learnable",
                         "embedding_max_length": 23},
        },
        "pose_decoder": {
            "module": "mlp_delta_body_pose",
            "embedding_size": 69,
            "mlp_width": 256,
            "mlp_depth": 4,
            "kick_in_iter": 0,
        },
        "train_keyfilter": ["rays", "motion_bases", "motion_weights_priors",
                            "cnl_bbox", "dst_posevec_69"],
        "test_keyfilter": ["rays", "target_rgbs", "motion_bases",
                           "motion_weights_priors", "cnl_bbox", "dst_posevec_69"],
        "pose_condition_file": "empty",
        "pose_condition_file_cmlp": "empty",
        "pose_condition_random_mask": "empty",
        "pose_condition_mask_prob": 0.5,
        "eval": {"metrics": ["lpips", "psnr", "ssim"]},
        "train": {
            "perturb": 1.0,
            "batch_size": 1,
            "shuffle": True,
            "drop_last": False,
            "maxiter": 400000,
            "lr": 0.0005,
            "lr_mweight_vol_decoder": 0.00005,
            "lr_pose_decoder": 0.00005,
            "lr_non_rigid_mlp": 0.00005,
            "lr_time_embed_fn": 0.00005,
            "lrate_decay": 500,
            "optimizer": "adam",
            "log_interval": 20,
            "save_checkpt_interval": 2000,
            "save_model_interval": 50000,
            "ray_shoot_mode": "patch",
            "remat": True,
            "lossweights": {"lpips": 1.0, "mse": 0.2, "l1": 0.0},
            "selected_frame": "all",
            "frames_per_step": 1,
        },
        "test": {"head_id": -1, "weight_threshold": 0.3, "type": "skip",
                 "save_3d": False, "save_3d_together": False,
                 "dir_view": None},
        "train_render": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "progress": {"batch_size": 1, "shuffle": False, "drop_last": False,
                     "dump_interval": 5000},
        "movement": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "novelview": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "novelview_all": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "novelpose": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "novelpose_eval": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "freeview": {"batch_size": 1, "shuffle": False, "drop_last": False,
                     "frame_idx": 0},
        "tpose": {"batch_size": 1, "shuffle": False, "drop_last": False},
        "tpose_pose_condition": {"batch_size": 1, "shuffle": False,
                                 "drop_last": False},
        "patch": {"sample_subject_ratio": 0.8, "N_patches": 6, "size": 32},
        "lpips": {"lpips": True, "layers": [0, 1, 2, 3, 4],
                  "weights": "empty"},
        "multihead": {
            "split": "view",
            "head_num": 1,
            "argmin_cfg": {
                "selector_criteria": {"lpips": 1.0, "mse": 0.2, "ssim": 0.0},
                "unselected_lossweights": {"lpips": 0.0, "mse": 0.0},
            },
        },
        "modules": {
            "pretrained_path": "empty",
            "canonical_mlp": {"reinit": False, "tune": False, "tune_last": -1},
            "non_rigid_motion_mlp": {"reinit": False, "tune": False},
            "pose_decoder": {"reinit": False, "tune": False},
            "mweight_vol_decoder": {"reinit": False, "tune": False},
        },
        "mesh": {"data_axis": -1},  # -1: use all local devices on the data axis
        # inverse-LBS warp execution strategy (ops/fused_warp.py):
        #   fused: per-frame fused observation-space volume (fast, mild
        #          double-interpolation smoothing)
        #   exact: reference-parity per-bone trilerp (slow XLA gathers)
        # Pallas TPU kernels (both numerically parity-tested vs the jnp path):
        #   composite: fused per-ray integration (ops/pallas_composite.py)
        #   mlp: fused embed+non-rigid+canonical MLP query (ops/pallas_mlp.py),
        #        active on TPU for kernel-eligible configs (default model
        #        family); mlp_block / mlp_block_bwd tune the sample block
        #   resample: all-bone obs-grid weight resample in one VMEM kernel
        #   scatter: train-time packed-volume sample whose backward scatters
        #            the volume cotangent via a windowed one-hot MXU kernel
        #            (ops/pallas_scatter.py) instead of XLA's scatter-add
        #   skip_empty: exact empty-space skip inside the MLP kernel --
        #            sample blocks whose fg likelihood is <= skip_eps
        #            everywhere bypass the matmul chain (the compositor
        #            multiplies alpha by fg, so they contribute nothing)
        # mlp_block 1024: finer forward-skip granularity saves ~1.8 ms in
        # the train step (A/B on v5e); eval renders measure identical
        # throughput at 1024 vs 2048
        "pallas": {"composite": False, "mlp": True, "mlp_interpret": False,
                   "mlp_block": 1024, "mlp_block_bwd": 512,
                   "resample": True, "resample_block": 512,
                   # resample_window: restrict the resample backward's
                   # per-(block, bone) contractions to support windows
                   # (ops/pallas_resample._DW) -- exact; False forces the
                   # full-width kernel (debugging escape hatch)
                   "resample_window": True,
                   # resample_support_skip: the resample backward also
                   # skips (block, bone) pairs whose warped stencil misses
                   # the bone's nonzero-weight support (exact through the
                   # softmax motion-weight chain; see
                   # ops/pallas_resample.resample_all_bones)
                   "resample_support_skip": True,
                   "scatter": True, "scatter_block": 1024,
                   "scatter_window": 256,
                   "skip_empty": True, "skip_eps": 0.0,
                   # analytic_bands: eval renders derive each ray's live
                   # depth band from bone-support geometry BEFORE the
                   # packed-volume gather (ops/liveness.py) -- rays sort
                   # and the warp math runs once in the kernel's z-major
                   # lane-dense layout (models/network.py
                   # _render_block_analytic); output is exactly the
                   # legacy path's. Default OFF: measured v5e end-to-end
                   # (64K rays x 128 samples, bf16) it renders 57-75 M
                   # samples/s vs the legacy path's 86.8 M -- the Pallas
                   # trilerp route materializes the gathered (N, 128) rows
                   # to HBM (2.1 GB at that shape) where XLA fuses the
                   # gather into the trilerp einsum in one pass. Kept as
                   # an opt-in (exactness pinned by
                   # test_analytic_render_path_parity).
                   "analytic_bands": False,
                   # band_gather: mark band-dead samples BEFORE the
                   # packed-volume gather (training steps and the legacy
                   # eval path) -- dead rows clamp to the shared row 0
                   # (cache-hot gather) and the scatter backward sorts
                   # them onto the padding key, where whole dead sample
                   # blocks skip the one-hot matmul and collapse their
                   # DMAs. Exact: band-dead => every packed channel is 0
                   # forward, and the forward mask zeroes their
                   # cotangents by construction.
                   "band_gather": True,
                   # skip_reorder: stable-partition live sample GROUPS
                   # first so dead blocks concentrate (skip_group samples
                   # per group; row gathers are latency-bound per row, so
                   # group granularity costs 1/group the gathers of the
                   # per-sample partition, which measured net-negative:
                   # ~470 ms at 8.4M samples, 3.5x the whole render).
                   # "train": reorder only inside training steps -- the
                   # measured win there (v5e, 6x32^2 patches x 128 samples,
                   # group 8: 103.2 -> 84.1 ms/step) comes from the 3x
                   # backward cost of every non-skipped block; eval renders
                   # (8.4M samples, forward-only) lose more to the permute
                   # than the skip saves (45.4 -> 36.6 M samp/s), so they
                   # stay unordered. true/false force it on/off everywhere.
                   "skip_reorder": "train", "skip_group": 8,
                   # skip_zmajor: feed the kernel samples in (sample, ray)
                   # order instead of (ray, sample). A ray's live samples
                   # are a contiguous z-band, so ray-major blocks almost
                   # never die wholesale; z-major blocks hold many rays at
                   # ONE depth slot and go fully dead outside the shared
                   # band. The relayout is a contiguous transpose, not the
                   # group permute's latency-bound row gathers.
                   # skip_sort_rays: additionally sort rays by live-band
                   # center (argsort of R keys + ray-granularity row
                   # gathers) so dead z-major blocks approach the
                   # per-sample compaction ideal (measured 68.5% dead vs
                   # 10.2% unsorted, ideal 73.5%, at 64K rays).
                   "skip_zmajor": True, "skip_sort_rays": True},
        "warp": {"mode": "fused", "grid_size": 48, "packed": True,
                 "include_bone_weights": False, "bbox_margin": 0.05},
        # host-side per-frame caches (data layer): decoded+undistorted
        # images (~1.5 MB/frame at 512px) and ray-bbox intersection results
        # (~2 MB/frame). Both are deterministic per frame; at 9+ it/s the
        # host pipeline must keep up with the chip. 0 disables.
        "host_cache": {"decoded": 1024, "isect": 1024},
    })


def load_yaml(path: str) -> CN:
    with open(path) as f:
        return CN.from_nested(yaml.safe_load(f) or {})


def make_cfg(cfg_file: str | None = None, opts: list | None = None,
             base_dir: str | None = None) -> CN:
    """Build the final config: defaults <- yaml file <- CLI dot overrides."""
    cfg = default_config()
    if cfg_file is not None:
        cfg.merge_from(load_yaml(cfg_file))
        if "experiment" not in (load_yaml(cfg_file) or {}):
            cfg.experiment = os.path.splitext(os.path.basename(cfg_file))[0]
    if opts:
        cfg.merge_from_list(list(opts))
    base = base_dir if base_dir is not None else os.environ.get(
        "HUMANNERF_LOGDIR_BASE", "experiments")
    cfg.logdir = os.path.join(
        base, cfg.category, str(cfg.task), str(cfg.subject), str(cfg.experiment))
    return cfg
