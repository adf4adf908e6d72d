"""Named-dataset registry.

Mirrors the reference's registry surface (core/data/dataset_args.py:3-253):
~30 named configs per ZJU subject (train/test, tava/nb splits, n-view
variants, novelview/novelpose, pjlab) plus wild monocular. Entries are
generated programmatically from split descriptors instead of the reference's
literal dict blocks.
"""

from __future__ import annotations

SUBJECTS = ["313", "315", "377", "386", "387", "390", "392", "393", "394",
            "xiao"]


def _zju_entries(sub: str, cfg) -> dict:
    train_mode = cfg.train.ray_shoot_mode
    tk, ek = cfg.train_keyfilter, cfg.test_keyfilter
    raw = f"data/zju/CoreView_{sub}"
    d = {}

    def train(name, path, **kw):
        d[name] = {"dataset_path": path, "keyfilter": tk,
                   "ray_shoot_mode": train_mode, "subject": sub, **kw}

    def test(name, path, **kw):
        d[name] = {"dataset_path": path, "keyfilter": ek,
                   "ray_shoot_mode": "image", "subject": sub, **kw}

    train(f"zju_{sub}_train", f"dataset/zju_mocap/{sub}")
    test(f"zju_{sub}_test", f"dataset/zju_mocap/{sub}", src_type="zju_mocap")
    train(f"zju_{sub}_tava_train", f"dataset/zju_mocap/{sub}_tava")
    test(f"zju_{sub}_tava_test", f"dataset/zju_mocap/{sub}_tava",
         src_type="zju_mocap")
    test(f"zju_{sub}_tava_train_render", f"dataset/zju_mocap/{sub}_tava")
    for views in ("1view", "1view_camera6", "1view_camera12",
                  "1view_camera18", "2view"):
        src = {} if views in ("1view", "1view_camera6") else \
            {"source_path": raw}
        train(f"zju_{sub}_tava_train_{views}",
              f"dataset/zju_mocap/{sub}_tava_{views}", **src)
        test(f"zju_{sub}_tava_test_{views}",
             f"dataset/zju_mocap/{sub}_tava_{views}", src_type="zju_mocap",
             **src)
    train(f"zju_{sub}_nb_4view_train",
          f"dataset/zju_mocap/{sub}_nb_4view_train", source_path=raw)
    test(f"zju_{sub}_nb_1view_test", f"dataset/zju_mocap/{sub}_nb_4view_train",
         source_path=raw, src_type="zju_mocap", select_views=[1], skip=4)
    test(f"zju_{sub}_nb_1view_test_progress",
         f"dataset/zju_mocap/{sub}_nb_4view_train", source_path=raw,
         src_type="zju_mocap", select_views=[1], skip=18)
    for split in ("nb_4view_novelpose", "nb_4view_novelview"):
        test(f"zju_{sub}_{split}", f"dataset/zju_mocap/{sub}_{split}",
             source_path=raw, src_type="zju_mocap")
    test(f"zju_{sub}_nb_1view_novelpose",
         f"dataset/zju_mocap/{sub}_nb_1view_novelpose_all",
         source_path=raw, src_type="zju_mocap")
    for split in ("fr-tv_vw-novel-all", "fr-tv_vw-3-9-15-22_ood",
                  "fr-hn_vw-3-9-15-22", "fr-tv_vw-3-9-15-22"):
        test(f"zju_{sub}_test_{split}", f"dataset/zju_mocap/{sub}_{split}",
             source_path=raw, src_type="zju_mocap")
    # pjlab capture splits
    test(f"pjlab_{sub}_view14_after-800_step4",
         f"dataset/pjlab/{sub}/view14_after-800_step4")
    test(f"pjlab_{sub}_view14_500-800_step5",
         f"dataset/pjlab/{sub}/view14_500-800_step5")
    train(f"pjlab_{sub}_view0235_500-800",
          f"dataset/pjlab/{sub}/view0235_500-800")
    train(f"pjlab_{sub}_train-all_view00", f"dataset/pjlab/{sub}/00")
    return d


def build_registry(cfg) -> dict:
    reg = {}
    if cfg.category == "human_nerf" and cfg.task == "zju_mocap":
        for sub in SUBJECTS:
            reg.update(_zju_entries(sub, cfg))
        reg["zju_387_tava_pose1-529"] = {
            "dataset_path": "dataset/zju_mocap/387_tava_pose1-529",
            "keyfilter": cfg.test_keyfilter, "ray_shoot_mode": "image",
            "subject": "387"}
        reg["zju_387_nb_rightlimb_32"] = {
            "dataset_path": "dataset/zju_mocap/387_nb_pose_rightlimb_32",
            "keyfilter": cfg.test_keyfilter, "ray_shoot_mode": "image",
            "subject": "387"}
    if cfg.category == "human_nerf" and cfg.task == "wild":
        reg["monocular_train"] = {
            "dataset_path": "dataset/wild/monocular",
            "keyfilter": cfg.train_keyfilter,
            "ray_shoot_mode": cfg.train.ray_shoot_mode}
        reg["monocular_test"] = {
            "dataset_path": "dataset/wild/monocular",
            "keyfilter": cfg.test_keyfilter, "ray_shoot_mode": "image",
            "src_type": "wild"}
    return reg


def get_dataset_args(cfg, name: str) -> dict:
    """Resolve a named dataset. Names that look like paths are accepted
    directly (dataset_path=name) so tests and ad-hoc runs need no registry."""
    reg = build_registry(cfg)
    if name in reg:
        return dict(reg[name])
    import os
    if os.path.isdir(name):
        return {"dataset_path": name, "keyfilter": cfg.train_keyfilter,
                "ray_shoot_mode": cfg.train.ray_shoot_mode}
    raise KeyError(f"unknown dataset '{name}'; known: {sorted(reg)[:10]}...")
