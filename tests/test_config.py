"""Config merge semantics (defaults <- yaml <- CLI dot-overrides)."""

import textwrap

from humannerf_tpu.config import CN, default_config, make_cfg


def test_defaults_have_reference_surface():
    cfg = default_config()
    assert cfg.N_samples == 128
    assert cfg.patch.N_patches == 6 and cfg.patch.size == 32
    assert cfg.train.lossweights.lpips == 1.0
    assert cfg.train.lossweights.mse == 0.2
    assert cfg.train.lr == 5e-4
    assert cfg.train.lr_non_rigid_mlp == 5e-5
    assert cfg.non_rigid_motion_mlp.kick_in_iter == 10000


def test_yaml_merge_adds_unknown_keys(tmp_path):
    y = tmp_path / "exp.yaml"
    y.write_text(textwrap.dedent("""
        task: zju_mocap
        subject: '387'
        experiment: adventure
        train:
          dataset: zju_387_train
          maxiter: 1234
          selected_frame: all
        novel_key: 42
    """))
    cfg = make_cfg(str(y))
    assert cfg.train.dataset == "zju_387_train"     # unknown key accepted
    assert cfg.train.maxiter == 1234                # override
    assert cfg.train.lr == 5e-4                     # default preserved
    assert cfg.novel_key == 42
    assert cfg.logdir.endswith("human_nerf/zju_mocap/387/adventure")


def test_cli_dot_overrides():
    cfg = make_cfg(opts=["train.maxiter", "7", "resize_img_scale", "0.5",
                         "patch.size", "20", "new.nested.key", "'x'"])
    assert cfg.train.maxiter == 7
    assert cfg.resize_img_scale == 0.5
    assert cfg.patch.size == 20
    assert cfg.new.nested.key == "x"


def test_deepcopy_independent():
    import copy
    a = default_config()
    b = copy.deepcopy(a)
    b.train.maxiter = 1
    assert a.train.maxiter == 400000


def test_cn_attribute_access():
    c = CN.from_nested({"a": {"b": [1, {"c": 2}]}})
    assert c.a.b[1].c == 2
    assert c.get_path("a.b") == c.a.b
    assert c.get_path("a.z", "dflt") == "dflt"


def test_every_shipped_yaml_instantiates():
    """Config-surface closure (VERDICT r2 next #7): every yaml under
    humannerf_tpu/configs/ must survive make_cfg and resolve every
    run-type dataset binding through the named-dataset registry."""
    import glob
    import os

    from humannerf_tpu.data.dataset_args import get_dataset_args

    cfg_root = os.path.join(os.path.dirname(__file__), "..",
                            "humannerf_tpu", "configs")
    yamls = sorted(glob.glob(os.path.join(cfg_root, "**", "*.yaml"),
                             recursive=True))
    # the documented reference surface is 14 experiment yamls; ours maps
    # single_gpu->single_chip etc. but the count must not regress
    assert len(yamls) >= 14, yamls

    run_types = ("train", "progress", "movement", "freeview", "tpose",
                 "tpose_pose_condition", "novelview", "novelview_all",
                 "novelpose", "novelpose_eval", "train_render")
    for y in yamls:
        cfg = make_cfg(y)
        assert cfg.logdir
        for rt in run_types:
            sub = cfg.get(rt)
            if isinstance(sub, CN) and "dataset" in sub:
                args = get_dataset_args(cfg, sub.dataset)
                assert args["dataset_path"], (y, rt)


def test_resolve_render_mode():
    """Run-type folder/non-rigid gating incl. the FORCE_NON_RIGID_MOTIONS
    escape hatch (reference run.py:167-188)."""
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.render import resolve_render_mode
    cfg = make_cfg(opts=[])

    assert resolve_render_mode(cfg, "movement", {}) == ("movement", False)
    assert resolve_render_mode(cfg, "tpose", {}) == ("tpose", True)
    assert resolve_render_mode(cfg, "tpose_pose_condition", {}) == \
        ("tpose_pose_condition", True)
    assert resolve_render_mode(
        cfg, "tpose_pose_condition", {"FORCE_NON_RIGID_MOTIONS": "1"}) == \
        ("tpose_pose_condition_w-delta", False)
    cfg.render_folder_name = "custom"
    assert resolve_render_mode(cfg, "movement", {}) == ("custom", False)
    assert resolve_render_mode(
        cfg, "tpose_pose_condition", {"FORCE_NON_RIGID_MOTIONS": "1"}) == \
        ("custom", False)
