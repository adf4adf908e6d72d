"""Device mesh + sharding layout.

Replaces the reference's primary/secondary GPU split + nn.DataParallel
scatter/gather (configs/config.py:41-55, network.py:68-72,115-119) with the
TPU-native recipe: a 1-D `jax.sharding.Mesh` over the chips, parameters
replicated, the ray dimension of each batch sharded, XLA inserting the
gradient psum and the tiny rgb all-gather (the patch-assembly gather crosses
shards; rgb is (6144, 3) -- 72KB over ICI).

Written so a multi-slice axis is a config change: `make_mesh` accepts any
device list/shape; batch sharding only names the 'data' axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys whose leading dim is the ray dimension
RAY_KEYS = ("rays_o", "rays_d", "rays_d_camera", "near", "far")


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """NamedShardings for a train batch: rays sharded, the rest replicated."""
    shardings = {}
    n_dev = mesh.devices.size
    for k, v in batch.items():
        if k in RAY_KEYS and hasattr(v, "shape") and v.shape \
                and v.shape[0] % n_dev == 0:
            spec = P("data") if np.ndim(v) == 1 else \
                P(*(("data",) + (None,) * (np.ndim(v) - 1)))
            shardings[k] = NamedSharding(mesh, spec)
        else:
            shardings[k] = NamedSharding(mesh, P())
    return shardings


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the training sharding layout."""
    sh = batch_shardings(mesh, batch)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}


def put_frame_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a multi-frame batch: every leaf's leading dim is the frame
    axis, sharded over 'data' (true data parallelism: one frame per chip
    when frames_per_step == mesh size)."""
    n_dev = mesh.devices.size

    def place(v):
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] % n_dev == 0:
            spec = P(*(("data",) + (None,) * (v.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: place(v) for k, v in batch.items()}


def collate_frames(items: list[dict]) -> dict:
    """Stack per-frame dataset items into a leading frame axis."""
    import numpy as _np
    keys = [k for k in items[0] if k != "frame_name"]
    return {k: _np.stack([_np.asarray(it[k]) for it in items], axis=0)
            for k in keys}
