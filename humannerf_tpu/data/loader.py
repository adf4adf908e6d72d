"""Dataset factory + host->device iteration.

Covers the reference's create_dataset/create_dataloader
(core/data/create_dataset.py:34-88): per-data_type customization (progress
renders 16 frames in image mode, movement skims 64 frames, ...), shuffling,
and per-worker RNG seeding. Instead of torch DataLoader worker processes, a
lightweight background-thread prefetcher overlaps host-side patch sampling
with device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from humannerf_tpu.data.dataset_args import get_dataset_args
from humannerf_tpu.data.datasets import Dataset, FreeviewDataset, TposeDataset


def create_dataset(cfg, data_type: str = "train", seed: int | None = None,
                   **overrides):
    """Instantiate the dataset for a run type (create_dataset.py:34-66)."""
    dataset_name = cfg[data_type].dataset
    args = get_dataset_args(cfg, dataset_name)

    if data_type in ("progress", "movement", "tpose", "freeview",
                     "novelview", "novelview_all", "novelpose",
                     "novelpose_eval", "train_render"):
        args["ray_shoot_mode"] = "image"
        args["keyfilter"] = cfg.test_keyfilter  # eval needs target_rgbs

    if data_type == "progress":
        total = _peek_total_frames(cfg, args)
        args["maxframes"] = 16
        args["skip"] = max(total // 16, 1)
        args["bgcolor"] = list(cfg.bgcolor)
    elif data_type in ("movement", "train_render"):
        total = _peek_total_frames(cfg, args)
        args["skip"] = max(total // 64, 1)
        args["maxframes"] = 64
        args["bgcolor"] = list(cfg.bgcolor)
    elif data_type != "train":
        args["bgcolor"] = list(cfg.bgcolor)

    pcf = cfg.pose_condition_file
    if pcf != "empty":
        args["pose_condition_file"] = pcf
    if cfg.pose_condition_file_cmlp != "empty":
        args["pose_condition_file_cmlp"] = cfg.pose_condition_file_cmlp

    args.update(overrides)
    args.pop("subject", None)
    src_type = args.pop("src_type", "zju_mocap")

    if data_type in ("tpose", "tpose_pose_condition"):
        return TposeDataset(cfg, **args)
    if data_type == "freeview":
        return FreeviewDataset(cfg, src_type=src_type, **args)
    return Dataset(cfg, seed=seed, **args)


def _peek_total_frames(cfg, args) -> int:
    """Count frames without building the full dataset (for skip math)."""
    import os
    path = args["dataset_path"]
    img_dir = os.path.join(path, "images")
    if os.path.isdir(img_dir):
        return len([f for f in os.listdir(img_dir) if f.endswith(".png")])
    import pickle
    with open(os.path.join(path, "mesh_infos.pkl"), "rb") as f:
        return len(pickle.load(f))


class Loader:
    """Epoch iterator with shuffling + optional background-thread prefetch."""

    def __init__(self, dataset, shuffle: bool = False, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.dataset)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self):
        order = self._order()
        if self.prefetch <= 0:
            for i in order:
                yield self.dataset[int(i)]
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for i in order:
                    q.put(self.dataset[int(i)])
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    def endless(self):
        """Infinite epoch-shuffled stream (training)."""
        while True:
            yield from self
