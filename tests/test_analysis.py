"""Analysis-tool tests: masked psnr, niqe machinery, distances, clustering."""

import os
import pickle

import numpy as np
import pytest

from humannerf_tpu.tools import analysis


def test_frame_distance_identical_is_large_and_symmetric():
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.rand(50, 3) * 0.1, rng.rand(50, 3),
                          np.full((50, 1), 0.9)], axis=1).astype(np.float32)
    d_self = analysis.frame_distance(pts, pts)
    assert d_self == 0.0  # identical points, zero rgb error
    other = pts.copy()
    other[:, 3:6] = np.clip(other[:, 3:6] + 0.1, 0, 1)
    d = analysis.frame_distance(pts, other)
    assert d > 0
    np.testing.assert_allclose(d, analysis.frame_distance(other, pts),
                               rtol=1e-6)


def test_greedy_maxmin_cluster_partitions():
    rng = np.random.RandomState(1)
    # two well-separated groups of 4
    D = np.full((8, 8), 10.0)
    for g in (range(4), range(4, 8)):
        for i in g:
            for j in g:
                D[i, j] = rng.rand() * 0.1
    np.fill_diagonal(D, 0)
    clusters = analysis.greedy_maxmin_cluster(D, 2)
    assert sorted(sum(clusters, [])) == list(range(8))
    assert {frozenset(c) for c in clusters} == \
        {frozenset(range(4)), frozenset(range(4, 8))}


def test_masked_psnr(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    for d in ("pred", "gt", "mask"):
        os.makedirs(tmp_path / d)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    noisy = np.clip(img.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 5
    Image.fromarray(noisy).save(tmp_path / "pred" / "f0.png")
    Image.fromarray(img).save(tmp_path / "gt" / "f0.png")
    Image.fromarray(mask).save(tmp_path / "mask" / "f0.png")
    rows = analysis.masked_psnr(str(tmp_path / "pred"), str(tmp_path / "gt"),
                                str(tmp_path / "mask"),
                                str(tmp_path / "out.txt"), part_ids=[5])
    assert len(rows) == 1 and 15 < rows[0][1] < 35
    assert "average" in (tmp_path / "out.txt").read_text()


def test_niqe_fit_and_score(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "imgs")
    # "natural" images: smooth blobs + mild noise
    for i in range(3):
        base = cv2.GaussianBlur(
            (rng.rand(256, 256) * 255).astype(np.float32), (31, 31), 8)
        img = np.clip(base + rng.randn(256, 256) * 5, 0, 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "imgs" / f"{i}.png"), img)
    model = str(tmp_path / "niqe.npz")
    analysis.niqe_fit(str(tmp_path / "imgs"), model, block=96)

    natural = cv2.imread(str(tmp_path / "imgs" / "0.png"),
                         cv2.IMREAD_GRAYSCALE)
    distorted = np.clip(natural.astype(np.float32)
                        + rng.randn(256, 256) * 60, 0, 255).astype(np.uint8)
    s_nat = analysis.niqe_score(natural, model)
    s_dist = analysis.niqe_score(distorted, model)
    assert np.isfinite(s_nat) and np.isfinite(s_dist)
    assert s_dist > s_nat  # heavier distortion scores worse


def test_pairwise_distance_matrix(tmp_path):
    rng = np.random.RandomState(2)
    dump = {}
    base = np.concatenate([rng.rand(30, 3) * 0.05, rng.rand(30, 3),
                           np.full((30, 1), 0.9)], axis=1)
    for i in range(3):
        v = base.copy()
        v[:, 3:6] = np.clip(v[:, 3:6] + i * 0.05, 0, 1)
        dump[f"f{i}"] = v.astype(np.float32)
    path = str(tmp_path / "name-2-3d.pkl")
    with open(path, "wb") as f:
        pickle.dump(dump, f)
    names, D = analysis.pairwise_distance_matrix(path,
                                                 str(tmp_path / "D.npy"))
    assert D.shape == (3, 3)
    assert np.allclose(np.diag(D), 0)
    assert D[0, 2] > D[0, 1] > 0
