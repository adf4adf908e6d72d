"""humannerf_tpu: a TPU-native (JAX/XLA/Pallas) re-implementation of HumanNeRF.

A from-scratch framework with the capabilities of the reference HumanNeRF
codebase (CVPR 2022, Weng et al. + research-fork extensions), re-designed for
TPU hardware:

  * pure-functional model (`models.network`): one jittable function over
    fixed-size ray blocks instead of chunk loops + nn.DataParallel
  * vectorized inverse-LBS warp (`ops.trilinear`): a single 8-corner gather
    replaces the reference's 24 sequential grid_sample calls
  * iteration-scheduled behavior (hann-window band unlock, kick-in gates)
    as traced scalars -- no recompilation across training
  * data-parallel scaling via `jax.sharding.Mesh` + jit sharding
    annotations (`parallel.mesh`) instead of primary/secondary GPU splits

Reference behavior citations use ``file:line`` into the upstream repo.
"""

__version__ = "0.1.0"
