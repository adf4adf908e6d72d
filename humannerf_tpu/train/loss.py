"""Training loss: rendered rays -> patch images -> LPIPS + MSE (+ L1).

The reference scatters rays into patch images through boolean masks
(trainer.py:28-37). Here the data layer precomputes `patch_ray_idx` (an
int32 pixel->ray-slot map, -1 = background), so patch assembly is a single
gather -- static shapes, no host sync, fuses under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.lpips import lpips_distance, scale_for_lpips


def gather_patch_images(rgb: jnp.ndarray, patch_ray_idx: jnp.ndarray,
                        bgcolor01: jnp.ndarray) -> jnp.ndarray:
    """rgb (R_cap, 3) + idx (N, P, P) -> patch images (N, P, P, 3).

    Background pixels (idx == -1) get bgcolor (reference `_unpack_imgs`
    initializes patches to bgcolor, trainer.py:33).
    """
    safe = jnp.clip(patch_ray_idx, 0)
    gathered = rgb[safe]                                    # (N, P, P, 3)
    is_ray = (patch_ray_idx >= 0)[..., None]
    return jnp.where(is_ray, gathered, bgcolor01)


def image_losses(patch_imgs: jnp.ndarray, targets: jnp.ndarray,
                 loss_names, lpips_params=None, lpips_layers=(0, 1, 2, 3, 4)):
    """Per-loss dict over patch image pairs (trainer.py:97-113)."""
    losses = {}
    if "mse" in loss_names:
        losses["mse"] = jnp.mean((patch_imgs - targets) ** 2)
    if "l1" in loss_names:
        losses["l1"] = jnp.mean(jnp.abs(patch_imgs - targets))
    if "lpips" in loss_names:
        a = scale_for_lpips(patch_imgs).transpose(0, 3, 1, 2)
        b = scale_for_lpips(targets).transpose(0, 3, 1, 2)
        losses["lpips"] = jnp.mean(
            lpips_distance(lpips_params, a, b, layers=lpips_layers))
    return losses


def ssim_jax(pred: jnp.ndarray, target: jnp.ndarray, win_size: int = 7,
             data_range: float = 2.0) -> jnp.ndarray:
    """Batched SSIM over (B, H, W, C) images, skimage-default configuration
    (uniform window, unbiased covariance, border crop). data_range=2.0
    matches the reference's implicit skimage float convention -- see
    utils/metrics.compute_ssim."""
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    ns = win_size ** 2
    cov_norm = ns / (ns - 1.0)

    def uf(x):  # uniform filter over H, W (VALID: implicit border crop)
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, win_size, win_size, 1),
            (1, 1, 1, 1), "VALID") / ns

    ux, uy = uf(pred), uf(target)
    uxx, uyy, uxy = uf(pred * pred), uf(target * target), uf(pred * target)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    return jnp.mean((A1 * A2) / (B1 * B2), axis=(1, 2, 3))


def total_loss(losses: dict, lossweights: dict):
    """Weighted sum over cfg.train.lossweights with weight > 0."""
    total = 0.0
    out = {}
    for k, w in lossweights.items():
        if w > 0 and k in losses:
            out[k] = losses[k]
            total = total + w * losses[k]
    return total, out


def argmin_multihead_loss(rgb_heads: jnp.ndarray, patch_ray_idx, bgcolor01,
                          targets, lossweights: dict, argmin_cfg,
                          lpips_params=None, lpips_layers=(0, 1, 2, 3, 4)):
    """Argmin head selection (reference trainer.py:124-161): every head is
    rendered, the head minimizing the (stop-gradient) selector criteria gets
    the full loss weights, the others get `unselected_lossweights`.

    rgb_heads: (K, R_cap, 3). Returns (train_loss, loss_dict).
    """
    loss_names = [k for k, w in lossweights.items() if w > 0]
    sel_w = {k: float(v) for k, v in argmin_cfg.selector_criteria.items()
             if float(v) != 0.0}
    unsel_w = {k: float(v)
               for k, v in argmin_cfg.unselected_lossweights.items()}

    K = rgb_heads.shape[0]
    per_head_losses = []
    criteria = []
    for h in range(K):
        patch = gather_patch_images(rgb_heads[h], patch_ray_idx, bgcolor01)
        losses = image_losses(patch, targets, loss_names, lpips_params,
                              lpips_layers)
        per_head_losses.append(losses)
        crit = sum(w * losses[k] for k, w in sel_w.items() if k in losses)
        if sel_w.get("ssim", 0.0) != 0.0:
            # higher ssim is better -> negative weight (trainer.py:141-145)
            crit = crit - sel_w["ssim"] * jnp.mean(ssim_jax(patch, targets))
        criteria.append(jax.lax.stop_gradient(crit))

    criteria = jnp.stack(criteria)                        # (K,)
    best = jnp.argmin(criteria)
    total = 0.0
    loss_dict = {"best_head": best.astype(jnp.float32)}
    for h in range(K):
        sel = sum(lossweights[k] * per_head_losses[h][k] for k in loss_names)
        uns = sum(w * per_head_losses[h].get(k, 0.0)
                  for k, w in unsel_w.items() if w > 0)
        total = total + jnp.where(best == h, sel, uns)
        for k in loss_names:
            loss_dict[f"{k}_head{h}"] = per_head_losses[h][k]
    for k in loss_names:
        stacked = jnp.stack([per_head_losses[h][k] for h in range(K)])
        loss_dict[k] = stacked[best]
    return total, loss_dict
