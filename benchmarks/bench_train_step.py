import time, numpy as np, jax, jax.numpy as jnp
from humannerf_tpu import runtime; runtime.setup()
from humannerf_tpu.config import make_cfg
from humannerf_tpu.train.trainer import Trainer
from humannerf_tpu.parallel import mesh as mesh_lib
from __graft_entry__ import _synthetic_inputs
import tempfile

cfg = make_cfg(opts=[
    "N_samples", "128", "dtype", "bfloat16",
    "patch.size", "32", "patch.N_patches", "6",
    "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
])
cfg.logdir = tempfile.mkdtemp(); cfg.resume = False
trainer = Trainer(cfg, log=lambda *a: None)

n_rays = 6 * 32 * 32
frame, rays = _synthetic_inputs(cfg, n_rays=n_rays)
rng = np.random.RandomState(0)
batch = dict(frame); batch.update(rays)
batch["target_patches"] = jnp.asarray(rng.rand(6, 32, 32, 3).astype(np.float32))
batch["patch_ray_idx"] = jnp.asarray(np.arange(n_rays, dtype=np.int32).reshape(6, 32, 32))
batch["bgcolor"] = jnp.zeros(3, jnp.float32)
db = mesh_lib.put_batch(batch, trainer.mesh)

t0 = time.perf_counter()
p, o, loss, d = trainer._train_step(trainer.params, trainer.opt_state, db, jax.random.key(0), jnp.asarray(1.0))
print("first step (compile):", time.perf_counter()-t0, "loss", float(loss), flush=True)
trainer.params, trainer.opt_state = p, o

times = []
for i in range(10):
    t0 = time.perf_counter()
    trainer.params, trainer.opt_state, loss, d = trainer._train_step(
        trainer.params, trainer.opt_state, db, jax.random.key(i), jnp.asarray(float(i+2)))
    lv = float(loss)  # host fetch = honest sync
    times.append(time.perf_counter()-t0)
dt = float(np.median(times))
print(f"train step: {dt*1e3:.1f} ms -> {1/dt:.2f} it/s  (loss {lv:.4f})", flush=True)
print(f"samples/sec through both MLPs (fwd+bwd): {n_rays*128/dt/1e6:.2f} M", flush=True)
