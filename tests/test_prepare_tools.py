"""End-to-end tests for the raw-data preparation pipeline (VERDICT r2 #2).

The prepare tools are the entry point for all real data and parse intricate
external formats; this file drives them on synthetic *raw* captures and then
loads their output through the real Dataset (and, for ZJU, one actual train
step), pinning the format quirks:

  * prepare_zju_mocap: annots.npy cameras (T in mm), new_params/{i}.npy,
    the 313/315 in-image frame-number indexing, mask/mask_cihp union
    (tools/prepare_zju_mocap/prepare_dataset.py:62-221)
  * prepare_wild: metadata.json, the Rh/Th fold-in (Th = pelvis,
    Rh = poses[:3], poses[:3] = 0 -- prepare_wild/prepare_dataset.py:61-88)
  * transfer_pose: shape-from-A poses-from-B, the idx+1 indexing for
    313/315 (transfer_pose.py:115-138), novelpose dataset load
"""

import json
import os
import pickle
import shutil
import sys

import numpy as np
import pytest
import yaml
from PIL import Image
from synthetic_data import humanoid_joints

from humannerf_tpu.config import make_cfg
from humannerf_tpu.utils.body import PARENT

SIZE = 64


# -- synthetic SMPL model -----------------------------------------------------

@pytest.fixture(scope="session")
def smpl_model_dir(tmp_path_factory):
    """A tiny but structurally-real SMPL pickle: 3 verts per joint, the real
    kinematic tree, joint regressor = per-joint vertex average."""
    rng = np.random.RandomState(7)
    joints = humanoid_joints().astype(np.float64)
    n_verts = 24 * 3
    offsets = rng.uniform(-0.03, 0.03, (n_verts, 3))
    v_template = np.repeat(joints, 3, axis=0) + offsets

    J_regressor = np.zeros((24, n_verts))
    for j in range(24):
        J_regressor[j, 3 * j:3 * j + 3] = 1.0 / 3.0
    # regress exactly the joint centers out of the offset vertices
    v_template -= np.repeat(J_regressor @ offsets, 3, axis=0)

    weights = np.zeros((n_verts, 24))
    for j in range(24):
        weights[3 * j:3 * j + 3, j] = 1.0

    kintree = np.zeros((2, 24), np.int64)
    kintree[1] = np.arange(24)
    kintree[0, 0] = 2 ** 32 - 1          # root: parent id not in the table
    kintree[0, 1:] = PARENT[1:]

    model = {
        "J_regressor": J_regressor,
        "weights": weights,
        "posedirs": np.zeros((n_verts, 3, 207)),
        "v_template": v_template,
        "shapedirs": rng.uniform(-0.01, 0.01, (n_verts, 3, 10)),
        "f": np.zeros((1, 3), np.int64),
        "kintree_table": kintree,
    }
    d = tmp_path_factory.mktemp("smpl_models")
    for fn in ("basicModel_neutral_lbs_10_207_0_v1.0.0.pkl",
               "basicmodel_m_lbs_10_207_0_v1.0.0.pkl"):
        with open(d / fn, "wb") as f:
            pickle.dump(model, f)
    return str(d)


def _disk_images(root, rel_name, with_cihp=True):
    """Write a jpg frame + mask/mask_cihp pngs for a raw ZJU capture."""
    yy, xx = np.mgrid[:SIZE, :SIZE]
    disk = ((yy - SIZE / 2) ** 2 + (xx - SIZE / 2) ** 2) < (SIZE / 3) ** 2
    img = np.zeros((SIZE, SIZE, 3), np.uint8)
    img[disk] = [180, 120, 90]
    ipath = os.path.join(root, rel_name)
    os.makedirs(os.path.dirname(ipath), exist_ok=True)
    Image.fromarray(img).save(ipath)

    base = os.path.splitext(rel_name)[0] + ".png"
    # split the subject between mask and mask_cihp: only their UNION is the
    # full disk (pins the mask-union semantics)
    m1 = np.zeros((SIZE, SIZE), np.uint8)
    m1[disk & (xx < SIZE / 2)] = 255
    m2 = np.zeros((SIZE, SIZE), np.uint8)
    m2[disk & (xx >= SIZE / 2)] = 255
    for sub, m in (("mask", m1), ("mask_cihp", m2 if with_cihp else m1)):
        p = os.path.join(root, sub, base)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(np.repeat(m[:, :, None], 3, axis=2)).save(p)


def _write_zju_capture(zju_root, subject, n_frames, views=(0,), seed=0,
                       params_offset=0, name_fn=None):
    """Raw ZJU-MoCap layout: CoreView_{s}/annots.npy + new_params + images."""
    rng = np.random.RandomState(seed)
    sdir = os.path.join(zju_root, f"CoreView_{subject}")
    os.makedirs(os.path.join(sdir, "new_params"), exist_ok=True)

    K = np.eye(3)
    K[0, 0] = K[1, 1] = SIZE * 1.2
    K[:2, 2] = SIZE / 2.0
    nv = max(views) + 1
    cams = {"K": [K.copy() for _ in range(nv)],
            "R": [np.eye(3) for _ in range(nv)],
            # annots store T in millimeters (prepare divides by 1000)
            "T": [np.array([[0.0], [0.0], [3000.0]]) for _ in range(nv)],
            "D": [np.zeros((5, 1)) for _ in range(nv)]}
    ims = []
    for i in range(n_frames):
        row = []
        for v in range(nv):
            rel = (name_fn(i, v) if name_fn
                   else f"Camera_B{v}/{i:06d}.jpg")
            row.append(rel)
            if v in views:
                _disk_images(sdir, rel)
        ims.append({"ims": row})
        poses = rng.uniform(-0.1, 0.1, (1, 72)).astype(np.float32)
        poses[0, :3] = 0
        np.save(os.path.join(sdir, "new_params",
                             f"{i + params_offset}.npy"),
                {"poses": poses,
                 "shapes": rng.uniform(-0.5, 0.5, (1, 10)).astype(np.float32),
                 "Rh": np.zeros((1, 3), np.float32),
                 "Th": np.zeros((1, 3), np.float32)},
                allow_pickle=True)
    np.save(os.path.join(sdir, "annots.npy"),
            {"cams": cams, "ims": ims}, allow_pickle=True)
    return sdir


def _prep_yaml(path, zju_root, subject, out_dir, smpl_dir, n_frames,
               views=0):
    cfg = {"dataset": {"zju_mocap_path": zju_root, "subject": subject,
                       "sex": "neutral"},
           "training_view": views, "max_frames": n_frames,
           "output": {"dir": out_dir}, "smpl_model_dir": smpl_dir}
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _tiny_cfg(tmp_path, **extra):
    opts = [
        "N_samples", "8", "patch.size", "8", "patch.N_patches", "1",
        "warp.grid_size", "16",
        "mweight_volume.volume_size", "8",
        "mweight_volume.embedding_size", "8",
        "canonical_mlp.mlp_width", "16", "canonical_mlp.mlp_depth", "2",
        "canonical_mlp.skips", "[]",
        "non_rigid_motion_mlp.mlp_width", "16",
        "non_rigid_motion_mlp.mlp_depth", "2",
        "non_rigid_motion_mlp.skips", "[]",
        "pose_decoder.mlp_width", "16", "pose_decoder.mlp_depth", "2",
        "train.lossweights.lpips", "0.0", "train.lossweights.mse", "1.0",
        "train.log_interval", "1000000",
        "progress.dump_interval", "1000000",
        "train.save_checkpt_interval", "1000000",
    ]
    for k, v in extra.items():
        opts += [k, str(v)]
    cfg = make_cfg(opts=opts, base_dir=str(tmp_path))
    cfg.logdir = str(tmp_path / "logs")
    return cfg


# -- prepare_zju_mocap --------------------------------------------------------

def test_prepare_zju_to_train_step(tmp_path, smpl_model_dir, monkeypatch):
    """Raw ZJU capture -> prepare -> Dataset(source_path) -> one real train
    step. Pins the annots T mm->m conversion and the mask union."""
    from humannerf_tpu.tools import prepare_zju_mocap

    zju_root = str(tmp_path / "zju")
    sdir = _write_zju_capture(zju_root, "387", n_frames=3, views=(0, 1))
    out_root = str(tmp_path / "prepared")
    ycfg = _prep_yaml(str(tmp_path / "387.yaml"), zju_root, "387", out_root,
                      smpl_model_dir, n_frames=3, views=[0, 1])

    monkeypatch.setattr(sys, "argv",
                        ["prepare_zju_mocap", "--cfg", ycfg])
    prepare_zju_mocap.main()

    out_dir = os.path.join(out_root, "387")
    with open(os.path.join(out_dir, "cameras.pkl"), "rb") as f:
        cameras = pickle.load(f)
    with open(os.path.join(out_dir, "mesh_infos.pkl"), "rb") as f:
        mesh_infos = pickle.load(f)
    with open(os.path.join(out_dir, "canonical_joints.pkl"), "rb") as f:
        cj = pickle.load(f)

    assert len(mesh_infos) == 3 * 2                    # frames x views
    name = "Camera_B0/000000.jpg"
    # annots T is millimeters; prepared extrinsics must be meters
    np.testing.assert_allclose(cameras[name]["extrinsics"][2, 3], 3.0)
    assert cameras[name]["distortions"].shape == (5,)
    info = mesh_infos[name]
    assert info["joints"].shape == (24, 3)
    assert info["tpose_joints"].shape == (24, 3)
    assert cj["joints"].shape == (24, 3)
    # tpose joints come from the zero pose: close to the template skeleton
    assert np.abs(info["tpose_joints"] - humanoid_joints()).max() < 0.1

    # -> the real Dataset (raw-source layout), then one real train step
    from humannerf_tpu.data.datasets import Dataset
    from humannerf_tpu.data.loader import Loader
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path)
    cfg.train.dataset = out_dir
    ds = Dataset(cfg, out_dir, source_path=sdir,
                 keyfilter=cfg.train_keyfilter, ray_shoot_mode="patch",
                 bgcolor=[0, 0, 0], seed=0)
    assert len(ds) == 6
    # the subject disk must survive the mask/mask_cihp UNION: each file
    # holds only half the disk
    _, alpha = ds.load_image("Camera_B0/000000.jpg",
                             np.zeros(3, np.float32))
    assert alpha[:, :SIZE // 2].max() > 0.5     # left half (mask only)
    assert alpha[:, SIZE // 2:].max() > 0.5     # right half (mask_cihp only)
    item = ds[0]
    assert item["target_patches"].shape[-1] == 3

    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=lambda *a: None)
    trainer.train(loader=Loader(ds, shuffle=True, seed=0, prefetch=0),
                  max_steps=2)
    assert trainer.iter == 3
    leaves = [np.asarray(x) for x in
              __import__("jax").tree.leaves(trainer.params)]
    assert all(np.isfinite(a).all() for a in leaves)


def test_prepare_zju_313_smpl_index_quirk(tmp_path, smpl_model_dir,
                                          monkeypatch):
    """Subjects 313/315 index new_params by the in-image frame number parsed
    from the file name, not the annots position
    (prepare_dataset.py:161-168)."""
    from humannerf_tpu.tools import prepare_zju_mocap

    zju_root = str(tmp_path / "zju")
    # image names carry frame number i+1 (ZJU 313 starts at 1);
    # new_params files exist ONLY at those i+1 indices
    _write_zju_capture(
        zju_root, "313", n_frames=2, views=(0,), params_offset=1,
        name_fn=lambda i, v:
            f"Camera_B{v}/CoreView_313_Camera_({v + 1})_{i + 1:04d}_x.jpg")
    out_root = str(tmp_path / "prepared")
    ycfg = _prep_yaml(str(tmp_path / "313.yaml"), zju_root, "313", out_root,
                      smpl_model_dir, n_frames=2)
    monkeypatch.setattr(sys, "argv", ["prepare_zju_mocap", "--cfg", ycfg])
    prepare_zju_mocap.main()            # would IOError on {0}.npy otherwise

    with open(os.path.join(out_root, "313", "mesh_infos.pkl"), "rb") as f:
        mesh_infos = pickle.load(f)
    sdir = os.path.join(zju_root, "CoreView_313")
    for i, (name, info) in enumerate(mesh_infos.items()):
        want = np.load(os.path.join(sdir, "new_params", f"{i + 1}.npy"),
                       allow_pickle=True).item()
        np.testing.assert_array_equal(info["poses"], want["poses"][0])


# -- prepare_wild -------------------------------------------------------------

def test_prepare_wild_rh_th_foldin(tmp_path, smpl_model_dir):
    """metadata.json -> pickles; the global rotation moves from the pose
    into Rh with Th = tpose pelvis and pelvis-centered joints
    (prepare_wild/prepare_dataset.py:61-88). Output loads as a Dataset."""
    from humannerf_tpu.tools.prepare_wild import prepare_wild
    from humannerf_tpu.utils.smpl import SMPL

    sdir = tmp_path / "wild" / "monocular"
    os.makedirs(sdir / "images")
    os.makedirs(sdir / "masks")
    K = np.eye(3)
    K[0, 0] = K[1, 1] = SIZE * 1.2
    K[:2, 2] = SIZE / 2.0
    E = np.eye(4)
    E[2, 3] = 3.0
    rng = np.random.RandomState(3)
    meta = {}
    for i in range(2):
        name = f"frame_{i:06d}"
        poses = rng.uniform(-0.1, 0.1, 72)
        poses[:3] = [0.3, -0.2, 0.1]    # nonzero global rotation to fold in
        meta[name] = {"poses": poses.tolist(),
                      "betas": rng.uniform(-0.5, 0.5, 10).tolist(),
                      "cam_intrinsics": K.tolist(),
                      "cam_extrinsics": E.tolist()}
        yy, xx = np.mgrid[:SIZE, :SIZE]
        disk = ((yy - SIZE / 2) ** 2 + (xx - SIZE / 2) ** 2) < (SIZE / 3) ** 2
        img = np.zeros((SIZE, SIZE, 3), np.uint8)
        img[disk] = [150, 150, 100]
        Image.fromarray(img).save(sdir / "images" / f"{name}.png")
        m = np.zeros((SIZE, SIZE, 3), np.uint8)
        m[disk] = 255
        Image.fromarray(m).save(sdir / "masks" / f"{name}.png")
    with open(sdir / "metadata.json", "w") as f:
        json.dump(meta, f)

    prepare_wild(str(sdir), "neutral", smpl_model_dir)

    with open(sdir / "mesh_infos.pkl", "rb") as f:
        mesh_infos = pickle.load(f)
    smpl = SMPL(sex="neutral", model_dir=smpl_model_dir)
    for name, src in meta.items():
        info = mesh_infos[name]
        np.testing.assert_allclose(info["Rh"], src["poses"][:3], atol=1e-6)
        assert np.all(info["poses"][:3] == 0)
        _, tpose = smpl(np.zeros(72), np.array(src["betas"], np.float32))
        np.testing.assert_allclose(info["Th"], tpose[0], atol=1e-5)
        # joints are pelvis-centered after the fold-in
        np.testing.assert_allclose(info["tpose_joints"][0], 0.0, atol=1e-5)

    from humannerf_tpu.data.datasets import Dataset
    cfg = _tiny_cfg(tmp_path)
    ds = Dataset(cfg, str(sdir), keyfilter=cfg.test_keyfilter,
                 ray_shoot_mode="image", bgcolor=[0, 0, 0])
    item = ds[0]
    assert item["ray_mask"].sum() > 0
    assert item["rays_o"].shape[-1] == 3


# -- transfer_pose ------------------------------------------------------------

def test_transfer_pose_novelpose_load(tmp_path, smpl_model_dir, monkeypatch):
    """Shape from subject A (387) + poses from subject B (313, exercising the
    idx+1 quirk) -> novelpose pickles -> Dataset loads the transferred
    frames."""
    from humannerf_tpu.tools import prepare_zju_mocap
    from humannerf_tpu.tools.transfer_pose import transfer_pose
    from humannerf_tpu.utils.smpl import SMPL

    zju_root = str(tmp_path / "zju")
    _write_zju_capture(zju_root, "387", n_frames=2, views=(0,), seed=1)
    # pose subject 313: params files shifted by +1 (the quirk)
    _write_zju_capture(zju_root, "313", n_frames=2, views=(0,), seed=2,
                       params_offset=1)
    out_root = str(tmp_path / "prepared")

    # prepare the shape subject normally (gives canonical_joints.pkl)
    ycfg = _prep_yaml(str(tmp_path / "387.yaml"), zju_root, "387", out_root,
                      smpl_model_dir, n_frames=2)
    monkeypatch.setattr(sys, "argv", ["prepare_zju_mocap", "--cfg", ycfg])
    prepare_zju_mocap.main()

    shape_cfg = {"dataset": {"zju_mocap_path": zju_root, "subject": "387",
                             "sex": "neutral"},
                 "training_view": 0, "max_frames": 2,
                 "output": {"dir": out_root}, "smpl_model_dir": smpl_model_dir}
    pose_cfg = {"dataset": {"zju_mocap_path": zju_root, "subject": "313",
                            "sex": "neutral"},
                "training_view": 0, "max_frames": 2,
                "output": {"dir": out_root}, "smpl_model_dir": smpl_model_dir}
    out_dir = transfer_pose(shape_cfg, pose_cfg, copy_images=True)

    with open(os.path.join(out_dir, "mesh_infos_pose313.pkl"), "rb") as f:
        mesh_infos = pickle.load(f)
    assert list(mesh_infos) == ["frame_000000", "frame_000001"]

    smpl = SMPL(sex="neutral", model_dir=smpl_model_dir)
    sdir_313 = os.path.join(zju_root, "CoreView_313")
    sdir_387 = os.path.join(zju_root, "CoreView_387")
    for i, (name, info) in enumerate(mesh_infos.items()):
        # poses come from B, indexed with the +1 quirk
        pose_p = np.load(os.path.join(sdir_313, "new_params",
                                      f"{i + 1}.npy"),
                         allow_pickle=True).item()
        np.testing.assert_array_equal(info["poses"], pose_p["poses"][0])
        # tpose joints come from A's betas (frame i's fit)
        shape_p = np.load(os.path.join(sdir_387, "new_params", f"{i}.npy"),
                          allow_pickle=True).item()
        _, want_tpose = smpl(np.zeros(72), shape_p["shapes"][0])
        np.testing.assert_allclose(info["tpose_joints"], want_tpose,
                                   atol=1e-5)

    # assemble the novelpose dataset dir and load it through Dataset
    np_dir = tmp_path / "novelpose_ds"
    os.makedirs(np_dir / "images")
    os.makedirs(np_dir / "masks")
    shutil.copyfile(os.path.join(out_dir, "mesh_infos_pose313.pkl"),
                    np_dir / "mesh_infos.pkl")
    shutil.copyfile(os.path.join(out_dir, "cameras_pose313.pkl"),
                    np_dir / "cameras.pkl")
    shutil.copyfile(os.path.join(out_dir, "canonical_joints.pkl"),
                    np_dir / "canonical_joints.pkl")
    yy, xx = np.mgrid[:SIZE, :SIZE]
    disk = ((yy - SIZE / 2) ** 2 + (xx - SIZE / 2) ** 2) < (SIZE / 3) ** 2
    for name in mesh_infos:
        img = np.zeros((SIZE, SIZE, 3), np.uint8)
        img[disk] = 128
        Image.fromarray(img).save(np_dir / "images" / f"{name}.png")
        Image.fromarray(img).save(np_dir / "masks" / f"{name}.png")

    from humannerf_tpu.data.datasets import Dataset
    cfg = _tiny_cfg(tmp_path)
    ds = Dataset(cfg, str(np_dir), keyfilter=cfg.test_keyfilter,
                 ray_shoot_mode="image", bgcolor=[0, 0, 0])
    assert len(ds) == 2
    item = ds[0]
    assert item["ray_mask"].sum() > 0
    assert item["dst_posevec"].shape == (69,)
