"""Full-forward pixel parity against the actual reference implementation.

Builds the reference Network (core/nets/human_nerf/network.py:647-789) with
random torch init on CPU, converts its state_dict through our shipped
converter (tools/convert_torch_ckpt.convert_state_dict), renders one full
synthetic frame with both implementations (ours: warp.mode=exact, f32), and
asserts per-pixel agreement. This upgrades per-module converter parity into
"the converted model IS the same model".

The run pins the documented default model: 8x256 canonical MLP (multires 10),
6x128 non-rigid MLP (multires 6), pose refiner on, motion-weight volume 32^3,
pose condition active (iter_val=1e7 > all kick-ins), perturb off.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))

from ref_oracle import build_reference_network  # noqa: E402
from synthetic_data import humanoid_joints  # noqa: E402

from humannerf_tpu.config import make_cfg
from humannerf_tpu.tools.convert_torch_ckpt import convert_state_dict
from humannerf_tpu.utils.body import (approx_gaussian_bone_volumes,
                                      body_pose_to_body_RTs,
                                      get_canonical_global_tfms,
                                      skeleton_to_bbox)
from humannerf_tpu.utils.camera import (get_rays_from_KRT,
                                        rays_intersect_3d_bbox)

H = W = 32
N_SAMPLES = 32
BGCOLOR = np.array([30.0, 128.0, 220.0], np.float32)


def _scene(seed=3):
    """One synthetic posed frame + full-frame rays (shared by both sides)."""
    rng = np.random.RandomState(seed)
    joints = humanoid_joints()
    poses = rng.uniform(-0.25, 0.25, 72).astype(np.float32)
    poses[:3] = 0.0
    dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, joints)
    cnl_gtfms = get_canonical_global_tfms(joints)
    cnl_bbox = skeleton_to_bbox(joints)
    priors = approx_gaussian_bone_volumes(
        joints, cnl_bbox["min_xyz"], cnl_bbox["max_xyz"], grid_size=32)

    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = W * 1.1
    K[0, 2] = W / 2.0
    K[1, 2] = H / 2.0
    R = np.eye(3, dtype=np.float32)
    T = np.array([0.0, 0.2, 2.6], np.float32)   # camera 2.6m in front
    rays_o, rays_d = get_rays_from_KRT(H, W, K, R, T)
    rays_o = rays_o.reshape(-1, 3).astype(np.float32)
    rays_d = rays_d.reshape(-1, 3).astype(np.float32)
    # small joint angles + zero root: the canonical bbox (0.3m margin,
    # skeleton_to_bbox) still bounds the posed body
    dst_bbox = skeleton_to_bbox(joints)
    near, far, mask = rays_intersect_3d_bbox(
        (dst_bbox["min_xyz"], dst_bbox["max_xyz"]), rays_o, rays_d)
    near_full = np.zeros(rays_o.shape[0], np.float32)
    far_full = np.zeros(rays_o.shape[0], np.float32)
    near_full[mask] = near
    far_full[mask] = far
    assert mask.sum() > 200, "camera must see the subject"

    return {
        "joints": joints, "poses": poses,
        "dst_Rs": dst_Rs.astype(np.float32), "dst_Ts": dst_Ts.astype(np.float32),
        "cnl_gtfms": cnl_gtfms.astype(np.float32),
        "priors": priors.astype(np.float32),
        "cnl_bbox_min": cnl_bbox["min_xyz"].astype(np.float32),
        "cnl_bbox_scale": (2.0 / (cnl_bbox["max_xyz"]
                                  - cnl_bbox["min_xyz"])).astype(np.float32),
        "posevec": poses[3:].astype(np.float32) + 1e-2,
        "rays_o": rays_o, "rays_d": rays_d,
        "near": near_full, "far": far_full, "n_fg": int(mask.sum()),
    }


@pytest.fixture(scope="module")
def oracle_pair():
    sc = _scene()
    net = build_reference_network(seed=0)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    with torch.no_grad():
        out = net(
            rays=(torch.from_numpy(sc["rays_o"]),
                  torch.from_numpy(sc["rays_d"]),
                  torch.from_numpy(sc["rays_d"])),
            dst_Rs=torch.from_numpy(sc["dst_Rs"]),
            dst_Ts=torch.from_numpy(sc["dst_Ts"]),
            cnl_gtfms=torch.from_numpy(sc["cnl_gtfms"]),
            motion_weights_priors=torch.from_numpy(sc["priors"]),
            dst_posevec=torch.from_numpy(sc["posevec"]),
            near=torch.from_numpy(sc["near"][:, None]),
            far=torch.from_numpy(sc["far"][:, None]),
            iter_val=10_000_000,
            cnl_bbox_min_xyz=torch.from_numpy(sc["cnl_bbox_min"]),
            cnl_bbox_scale_xyz=torch.from_numpy(sc["cnl_bbox_scale"]),
            bgcolor=torch.from_numpy(BGCOLOR),
            head_id=torch.tensor(0),
        )
    ref = {k: out[k].numpy() for k in ("rgb", "alpha", "depth")}

    import jax
    import jax.numpy as jnp
    from humannerf_tpu.models.network import HumanNeRF

    cfg = make_cfg(opts=[
        "N_samples", str(N_SAMPLES), "perturb", "0.",
        "warp.mode", "exact", "dtype", "float32",
        "mweight_volume.volume_size", "32",
    ])
    ours_net = HumanNeRF(cfg)
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd))
    frame = {
        "dst_Rs": jnp.asarray(sc["dst_Rs"]),
        "dst_Ts": jnp.asarray(sc["dst_Ts"]),
        "cnl_gtfms": jnp.asarray(sc["cnl_gtfms"]),
        "motion_weights_priors": jnp.asarray(sc["priors"]),
        "dst_posevec": jnp.asarray(sc["posevec"]),
        "cnl_bbox_min_xyz": jnp.asarray(sc["cnl_bbox_min"]),
        "cnl_bbox_scale_xyz": jnp.asarray(sc["cnl_bbox_scale"]),
        "bgcolor": jnp.asarray(BGCOLOR),
    }
    rays = {
        "rays_o": jnp.asarray(sc["rays_o"]),
        "rays_d": jnp.asarray(sc["rays_d"]),
        "rays_d_camera": jnp.asarray(sc["rays_d"]),
        "near": jnp.asarray(sc["near"]),
        "far": jnp.asarray(sc["far"]),
    }
    got = jax.jit(
        lambda p, f, r: ours_net.render_rays(p, f, r, 1e7, perturb=False)
    )(params, frame, rays)
    ours = {k: np.asarray(got[k]) for k in ("rgb", "alpha", "depth")}
    return ref, ours, sc


def test_full_frame_rgb_parity(oracle_pair):
    ref, ours, sc = oracle_pair
    d = np.abs(ref["rgb"] - ours["rgb"])
    mse = float(np.mean((ref["rgb"] - ours["rgb"]) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-20))
    print(f"\nfull-frame parity: max|drgb|={d.max():.3e} "
          f"mean|drgb|={d.mean():.3e} PSNR_vs_ref={psnr:.1f}dB "
          f"({sc['n_fg']} fg rays of {H*W})")
    assert d.max() < 2e-3, d.max()
    assert d.mean() < 5e-5, d.mean()
    assert psnr > 60.0, psnr


def test_full_frame_alpha_depth_parity(oracle_pair):
    ref, ours, _ = oracle_pair
    np.testing.assert_allclose(ours["alpha"], ref["alpha"],
                               atol=1e-3, rtol=1e-3)
    # depth only matters where something is hit
    hit = ref["alpha"] > 1e-3
    np.testing.assert_allclose(ours["depth"][hit], ref["depth"][hit],
                               atol=5e-3, rtol=5e-3)


def test_background_rays_exact_background(oracle_pair):
    """Rays missing the bbox (near=far=0) composite to bgcolor/255 exactly."""
    ref, ours, sc = oracle_pair
    miss = sc["far"] == 0.0
    assert miss.sum() > 0
    np.testing.assert_allclose(ours["rgb"][miss],
                               np.tile(BGCOLOR / 255.0, (int(miss.sum()), 1)),
                               atol=1e-4)
    np.testing.assert_allclose(ref["rgb"][miss], ours["rgb"][miss], atol=1e-4)
