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


def _dump10(rng, n, part_joint, size=64, weight=0.9):
    """(n, 10) dump rows: [xyz, rgb, w, row, col, lbs]."""
    xyz = rng.rand(n, 3).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)
    w = np.full((n, 1), weight, np.float32)
    pos = rng.randint(0, size, (n, 2)).astype(np.float32)
    lbs = np.full((n, 1), part_joint, np.float32)
    return np.concatenate([xyz, rgb, w, pos, lbs], axis=1)


def test_sharded_distance_matches_full(tmp_path):
    rng = np.random.RandomState(2)
    dump = {f"f{i}": _dump10(rng, 40, 15) for i in range(5)}
    p = tmp_path / "dump.pkl"
    with open(p, "wb") as f:
        pickle.dump(dump, f)
    _, full = analysis.pairwise_distance_matrix(
        str(p), str(tmp_path / "full.npy"), dist_thresh=0.2)
    shards = []
    for k in range(3):
        out = tmp_path / f"s{k}.npy"
        analysis.pairwise_distance_matrix(
            str(p), str(out), chunk_id=k, chunk_n=3, dist_thresh=0.2)
        shards.append(str(out))
    merged = analysis.merge_distance_shards(shards,
                                            str(tmp_path / "merged.npy"))
    np.testing.assert_allclose(merged, full, rtol=1e-6)
    assert full.max() > 0


def test_segment_dump_parts_and_dilation(tmp_path):
    rng = np.random.RandomState(3)
    # head points in the top-left pixel corner, lfoot far away
    head = _dump10(rng, 20, 15)
    head[:, 7:9] = rng.randint(0, 8, (20, 2))
    foot = _dump10(rng, 20, 7)
    foot[:, 7:9] = rng.randint(50, 60, (20, 2))
    dump = {"f0": np.concatenate([head, foot], axis=0)}
    p = tmp_path / "dump.pkl"
    with open(p, "wb") as f:
        pickle.dump(dump, f)
    paths = analysis.segment_dump(str(p), str(tmp_path / "seg"))
    with open(paths["head"], "rb") as f:
        seg_head = pickle.load(f)["f0"]
    with open(paths["lfoot"], "rb") as f:
        seg_foot = pickle.load(f)["f0"]
    with open(paths["belly"], "rb") as f:
        seg_belly = pickle.load(f)["f0"]
    # far-apart parts don't bleed into each other; 10px dilation keeps
    # every member point itself
    assert len(seg_head) == 20 and (seg_head[:, 9] == 15).all()
    assert len(seg_foot) == 20 and (seg_foot[:, 9] == 7).all()
    assert seg_belly is None   # no belly joints present

    # distance on a segment dump works (the _seg variant's use)
    dump2 = {"f0": seg_head, "f1": seg_head, "f2": None}
    p2 = tmp_path / "seg_dump.pkl"
    with open(p2, "wb") as f:
        pickle.dump(dump2, f)
    _, D = analysis.pairwise_distance_matrix(str(p2),
                                             str(tmp_path / "d.npy"))
    assert D.shape == (3, 3) and D[0, 1] == 0.0   # identical -> 0 rgb error
    assert (D[:, 2] == 0).all()                   # None frames skipped


def test_single_pair_distance_writes_obj(tmp_path):
    rng = np.random.RandomState(4)
    a = _dump10(rng, 30, 15)
    b = a.copy()
    b[:, 3:6] = np.clip(b[:, 3:6] + 0.2, 0, 1)
    p = tmp_path / "dump.pkl"
    with open(p, "wb") as f:
        pickle.dump({"a": a, "b": b}, f)
    obj = tmp_path / "pair.obj"
    d = analysis.single_pair_distance(str(p), "a", "b", obj_out=str(obj),
                                      dist_thresh=0.5)
    assert d > 0
    lines = obj.read_text().strip().splitlines()
    assert len(lines) == 2 * 30 and lines[0].startswith("v ")


def test_warp_images_strips(tmp_path):
    pytest.importorskip("cv2")
    rng = np.random.RandomState(5)
    a = _dump10(rng, 50, 15, size=32)
    b = a.copy()
    b[:, 7:9] = rng.randint(0, 32, (50, 2))     # same canon pts, moved pixels
    p = tmp_path / "dump.pkl"
    with open(p, "wb") as f:
        pickle.dump({"a": a, "b": b}, f)
    o01, o10 = analysis.warp_images(str(p), "a", "b", str(tmp_path / "w"),
                                    size=32)
    from PIL import Image
    img = np.asarray(Image.open(o01))
    assert img.shape == (32, 32 * 5, 3)         # 5-panel strip
    # warped panel (3rd) carries frame a's colors onto frame b's pixels
    warped = img[:, 2 * 32:3 * 32]
    assert warped.max() > 0
    assert os.path.isfile(o10)


def test_cluster_montage(tmp_path):
    """cluster-montage tiles each cluster's frames into grid x grid sheets
    (draw_sorted_image.py:30-50), supporting both index-list clusters (+ a
    names map) and the reference's {'names': [...]} dicts."""
    from PIL import Image
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for i in range(5):
        arr = np.full((16, 16, 3), 40 * i, np.uint8)
        Image.fromarray(arr).save(img_dir / f"f{i}.png")

    # index-list clusters (this repo's `cluster` output) + names file
    with open(tmp_path / "cl.pkl", "wb") as f:
        pickle.dump([[0, 1, 2], [3, 4]], f)
    names = tmp_path / "names.txt"
    names.write_text("".join(f"f{i}\n" for i in range(5)))
    out = analysis.cluster_montage(str(tmp_path / "cl.pkl"), str(img_dir),
                                   str(tmp_path / "m1"), tile=8, grid=2,
                                   names_file=str(names))
    assert [os.path.basename(p) for p in out] == \
        ["cluster0_0.png", "cluster1_0.png"]
    sheet = np.asarray(Image.open(out[0]))
    assert sheet.shape == (16, 16, 3)
    # tiles land row-major: top-left f0 (0), top-right f1 (40), b-l f2 (80)
    assert sheet[0, 0, 0] == 0 and sheet[0, 12, 0] == 40
    assert sheet[12, 4, 0] == 80 and sheet[12, 12, 0] == 0  # empty slot

    # reference-style dict clusters, >1 sheet per cluster
    with open(tmp_path / "cl2.pkl", "wb") as f:
        pickle.dump([{"names": [f"f{i}.png" for i in range(5)]}], f)
    out2 = analysis.cluster_montage(str(tmp_path / "cl2.pkl"), str(img_dir),
                                    str(tmp_path / "m2"), tile=8, grid=2)
    assert [os.path.basename(p) for p in out2] == \
        ["cluster0_0.png", "cluster0_1.png"]
