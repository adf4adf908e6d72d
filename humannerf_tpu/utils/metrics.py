"""Quality metrics: PSNR, SSIM, metric writers.

Covers the reference core/utils/metrics_util.py. SSIM re-implements
skimage.metrics.structural_similarity's default configuration (uniform 7x7
window, unbiased covariance, border crop) in pure numpy -- including
skimage's float-input convention data_range=2.0 that the reference
implicitly used (metrics_util.py:98-106): reported SSIM numbers are only
comparable under that convention, so it is the default here too.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def compute_psnr(pred: np.ndarray, target: np.ndarray, mask=None) -> float:
    """PSNR assuming max pixel value 1 (metrics_util.py:81-88)."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    if mask is not None:
        mask = np.broadcast_to(np.asarray(mask, bool), pred.shape)
        pred, target = pred[mask], target[mask]
    mse = np.mean((pred - target) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def _uniform_filter(x: np.ndarray, win: int) -> np.ndarray:
    """Mean filter via 2D cumsum; interior values match ndimage.uniform_filter."""
    pad = win // 2
    xp = np.pad(x, pad, mode="edge")
    c = np.cumsum(np.cumsum(xp, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    h, w = x.shape
    out = (c[win:win + h, win:win + w] - c[:h, win:win + w]
           - c[win:win + h, :w] + c[:h, :w])
    return out / (win * win)


def compute_ssim(pred: np.ndarray, target: np.ndarray, mask=None,
                 win_size: int = 7, data_range: float = 2.0) -> float:
    """SSIM matching skimage defaults (see module docstring).

    pred/target: (H, W, C) or (H, W) in [0, 1].
    """
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    if mask is not None:
        import cv2
        x, y, w, h = cv2.boundingRect(np.asarray(mask, np.uint8))
        pred = pred[y:y + h, x:x + w]
        target = target[y:y + h, x:x + w]
    if pred.ndim == 2:
        pred, target = pred[..., None], target[..., None]

    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    ns = win_size ** 2
    cov_norm = ns / (ns - 1.0)
    pad = (win_size - 1) // 2

    vals = []
    for ch in range(pred.shape[-1]):
        x, y = pred[..., ch], target[..., ch]
        ux = _uniform_filter(x, win_size)
        uy = _uniform_filter(y, win_size)
        uxx = _uniform_filter(x * x, win_size)
        uyy = _uniform_filter(y * y, win_size)
        uxy = _uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


class MetricsWriter:
    """Append per-image psnr/ssim/lpips(x1000) + averages to text files
    (metrics_util.py:9-60). `lpips_fn(pred, target) -> float` is injected so
    the writer stays backend-agnostic."""

    def __init__(self, output_dir: str, exp_name: str, dataset: str,
                 metrics=("psnr", "ssim", "lpips"), lpips_fn=None,
                 lpips_trunk: str | None = None):
        os.makedirs(output_dir, exist_ok=True)
        self.per_img_f = open(
            os.path.join(output_dir, f"{exp_name}-metrics.perimg.txt"), "a")
        self.average_f = open(
            os.path.join(output_dir, f"{exp_name}-metrics.average.txt"), "a")
        self.per_img_f.write(f"========={dataset}==========\n")
        self.average_f.write(f"========={dataset}==========\n")
        if lpips_trunk is not None and lpips_trunk != "converted":
            # make uncalibrated LPIPS numbers self-describing in the output
            tag = (f"# lpips_trunk: {lpips_trunk} (UNCALIBRATED -- not "
                   "comparable to published LPIPS values)\n")
            self.per_img_f.write(tag)
            self.average_f.write(tag)
        self.metrics = list(metrics)
        self.lpips_fn = lpips_fn
        self.sums = defaultdict(float)
        self.N = 0
        self.per_image = {}

    @staticmethod
    def _normalize(img):
        img = np.asarray(img, np.float32)
        if img.max() > 2:
            img = img / 255.0
        return img

    def append(self, name: str, pred, target, mask=None):
        assert name not in self.per_image, name
        self.N += 1
        pred = self._normalize(pred)
        target = self._normalize(target)
        row = {}
        for k in self.metrics:
            if k == "psnr":
                v = compute_psnr(pred, target, mask)
            elif k == "ssim":
                v = compute_ssim(pred, target, mask)
            elif k == "lpips":
                v = 1000.0 * float(self.lpips_fn(pred, target)) \
                    if self.lpips_fn is not None else float("nan")
            else:
                raise KeyError(k)
            row[k] = v
            self.sums[k] += v
        self.per_image[name] = row
        self.per_img_f.write(
            f"{name}: " + " ".join(f"{k}-{v:.4f}" for k, v in row.items())
            + "\n")
        return row

    def finalize(self) -> dict:
        avg = {k: self.sums[k] / max(self.N, 1) for k in self.metrics}
        for k, v in avg.items():
            self.average_f.write(f"{k[0]}:{v:.4f}\n")
        self.per_img_f.close()
        self.average_f.close()
        return avg
