"""Image IO + writers (reference core/utils/image_util.py)."""

from __future__ import annotations

import os
import pickle

import numpy as np
from PIL import Image


def load_image(path: str) -> Image.Image:
    return Image.open(path)


def save_image(img: np.ndarray | Image.Image, path: str):
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img.save(path)


def to_8b_image(image: np.ndarray) -> np.ndarray:
    return (255.0 * np.clip(image, 0.0, 1.0)).astype(np.uint8)


def to_3ch_image(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 1:
        return np.concatenate([image] * 3, axis=-1)
    return image


def to_8b3ch_image(image: np.ndarray) -> np.ndarray:
    return to_3ch_image(to_8b_image(image))


def tile_images(images, imgs_per_row: int = 4) -> np.ndarray:
    """Tile same-size images into a grid (image_util.py:40-52)."""
    rows = []
    row = []
    for img in images:
        row.append(img)
        if len(row) == imgs_per_row:
            rows.append(np.concatenate(row, axis=1))
            row = []
    if row:
        pad = np.zeros_like(row[0])
        while len(row) < imgs_per_row:
            row.append(pad)
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def unpack_to_image(width, height, ray_mask, bgcolor, rgb, alpha=None,
                    truth=None):
    """Scatter per-ray values back into an H x W image (run.py:49-65)."""
    rgb_image = np.full((height * width, 3), bgcolor, dtype=np.float32)
    rgb_image[ray_mask] = rgb
    rgb_image = to_8b_image(rgb_image.reshape(height, width, 3))

    truth_image = None
    if truth is not None:
        truth_image = np.full((height * width, 3), bgcolor, dtype=np.float32)
        truth_image[ray_mask] = truth
        truth_image = to_8b_image(truth_image.reshape(height, width, 3))

    alpha_image = None
    if alpha is not None:
        alpha_map = np.zeros(height * width, dtype=np.float32)
        alpha_map[ray_mask] = alpha
        alpha_image = to_8b3ch_image(alpha_map.reshape(height, width))
    return rgb_image, alpha_image, truth_image


class ImageWriter:
    """Write per-frame PNGs (+ optional 3D dumps) and an mp4 at finalize
    (image_util.py:55-129)."""

    def __init__(self, output_dir: str, exp_name: str):
        self.image_dir = os.path.join(output_dir, exp_name)
        os.makedirs(self.image_dir, exist_ok=True)
        self.frame_idx = -1
        self.frames = []

    def append(self, image: np.ndarray, img_name: str | None = None):
        self.frame_idx += 1
        if img_name is None:
            img_name = f"{self.frame_idx:06d}"
        save_image(image, os.path.join(self.image_dir, img_name + ".png"))
        self.frames.append(image)
        return self.frame_idx, img_name

    def append_cnl_3d(self, xyz: np.ndarray, rgb: np.ndarray, obj_name: str):
        path = os.path.join(self.image_dir, obj_name + ".obj")
        with open(path, "w") as f:
            for p, c in zip(xyz, rgb):
                f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")

    def save_pkl(self, obj, name: str):
        with open(os.path.join(self.image_dir, name + ".pkl"), "wb") as f:
            pickle.dump(obj, f)

    def finalize(self, fps: int = 30):
        if not self.frames:
            return
        try:
            import imageio
            path = self.image_dir + ".mp4"
            imageio.mimwrite(path, self.frames, fps=fps, quality=8)
        except Exception as e:  # mp4 is best-effort (codec availability)
            print(f"[ImageWriter] skipping mp4 ({e})")
        self.frames = []
