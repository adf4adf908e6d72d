"""Post-hoc analysis CLI: the reference's loose scripts as subcommands.

Covers (reference file -> subcommand):
  masked_psnr.py            -> masked-psnr   body-part-masked PSNR
  compute_niqe.py           -> niqe          no-reference NIQE (self-contained
                                             implementation; basicsr shipped
                                             pretrained pristine stats -- use
                                             `niqe-fit` to fit your own)
  tools/make_video.py       -> make-video    image dir -> mp4
  make_video.py             -> (same)
  tools/compute_distance.py -> pairwise-distance  canonical point-cloud
                                             appearance distance matrix
  tools/compute_distance_seg.py / _3.py -> pairwise-distance with
                                             --chunk-id/--chunk-n strided row
                                             sharding (run on a `segment`
                                             dump for the _seg variant; nested
                                             sharding = shard a sharded run's
                                             row list again) + distance-merge
  tools/compute_distance_single_pair.py -> distance-pair  one pair with an
                                             error-map .obj export
  tools/segment.py          -> segment       split a name-2-3d dump into
                                             per-body-part dumps (argmax-LBS
                                             parts + 10px dilation)
  warp_img.py               -> warp-img      cross-frame appearance warp
                                             comparison strips
  tools/cluster.py          -> cluster       greedy max-min clustering of a
                                             distance matrix
  compare_lbs_delta.py      -> compare-lbs   side-by-side LBS-only vs full
                                             renders with per-image PSNR

The canonical point dumps are the (N, 10) `name-2-3d` pickles written by
run.py with test.save_3d_together=True: columns [xyz(3), rgb(3), weight(1),
row, col, lbs_argmax] (reference run.py:388-404). The base 7-column layout
(no image positions) is accepted wherever positions aren't needed.

Usage: python -m humannerf_tpu.tools.analysis <subcommand> [args]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from humannerf_tpu.utils.metrics import compute_psnr


# -- masked PSNR ----------------------------------------------------------------

def masked_psnr(pred_dir: str, gt_dir: str, mask_dir: str, out_path: str,
                part_ids=None):
    """Per-image PSNR restricted to CIHP part-mask pixels
    (masked_psnr.py:105-117)."""
    from PIL import Image
    rows = []
    for fname in sorted(os.listdir(pred_dir)):
        if not fname.endswith(".png"):
            continue
        stem = os.path.splitext(fname)[0]
        pred = np.asarray(Image.open(os.path.join(pred_dir, fname)),
                          np.float32) / 255.0
        gt = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                        np.float32) / 255.0
        mpath = os.path.join(mask_dir, fname)
        if not os.path.isfile(mpath):
            continue
        m = np.asarray(Image.open(mpath))
        if m.ndim == 3:
            m = m[..., 0]
        mask = np.isin(m, part_ids) if part_ids else (m > 0)
        if not mask.any():
            continue
        v = compute_psnr(pred, gt, mask[..., None])
        rows.append((stem, v))
    with open(out_path, "w") as f:
        for stem, v in rows:
            f.write(f"{stem}: psnr-{v:.4f}\n")
        if rows:
            f.write(f"average: {np.mean([v for _, v in rows]):.4f}\n")
    return rows


# -- NIQE -------------------------------------------------------------------------

def _mscn(img: np.ndarray, sigma: float = 7.0 / 6.0):
    """Mean-subtracted contrast-normalized coefficients."""
    import cv2
    ksize = 7
    mu = cv2.GaussianBlur(img, (ksize, ksize), sigma)
    mu_sq = cv2.GaussianBlur(img * img, (ksize, ksize), sigma)
    var = np.sqrt(np.abs(mu_sq - mu * mu))
    return (img - mu) / (var + 1.0)


_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = None


def _aggd_fit(x: np.ndarray):
    """Asymmetric generalized Gaussian fit -> (alpha, bl, br)."""
    global _R_GAM
    from math import gamma
    if _R_GAM is None:
        g1 = np.array([gamma(2.0 / g) for g in _GAM])
        g2 = np.array([gamma(1.0 / g) * gamma(3.0 / g) for g in _GAM])
        _R_GAM = g1 * g1 / g2
    left = x[x < 0]
    right = x[x >= 0]
    sl = np.sqrt(np.mean(left ** 2)) if left.size else 1e-6
    sr = np.sqrt(np.mean(right ** 2)) if right.size else 1e-6
    gamma_hat = sl / sr
    rhat = np.mean(np.abs(x)) ** 2 / (np.mean(x ** 2) + 1e-12)
    rhat_norm = rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1) \
        / ((gamma_hat ** 2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhat_norm) ** 2)]
    return alpha, sl, sr


def niqe_features(gray: np.ndarray, block: int = 96) -> np.ndarray:
    """18-dim NIQE feature vector per block, two scales -> (n_blocks, 36)."""
    from math import gamma
    feats_all = []
    img = gray.astype(np.float64)
    h, w = img.shape
    nb_h, nb_w = h // block, w // block
    for scale in (1, 2):
        mscn = _mscn(img)
        feats_scale = []
        b = block // scale
        for i in range(nb_h):
            for j in range(nb_w):
                patch = mscn[i * b:(i + 1) * b, j * b:(j + 1) * b]
                f = []
                alpha, sl, sr = _aggd_fit(patch.ravel())
                f += [alpha, (sl ** 2 + sr ** 2) / 2.0]
                for (di, dj) in ((0, 1), (1, 0), (1, 1), (1, -1)):
                    shifted = np.roll(np.roll(patch, di, axis=0), dj, axis=1)
                    pair = (patch * shifted).ravel()
                    a, l_, r_ = _aggd_fit(pair)
                    const = np.sqrt(gamma(1 / a)) / np.sqrt(gamma(3 / a))
                    mean = (r_ - l_) * (gamma(2 / a) / gamma(1 / a)) * const
                    f += [a, mean, l_ ** 2, r_ ** 2]
                feats_scale.append(f)
        feats_all.append(np.asarray(feats_scale))
        if scale == 1:
            import cv2
            img = cv2.resize(img, (w // 2, h // 2),
                             interpolation=cv2.INTER_AREA)
            h, w = img.shape
    n = min(len(feats_all[0]), len(feats_all[1]))
    return np.concatenate([feats_all[0][:n], feats_all[1][:n]], axis=1)


def niqe_fit(image_dir: str, out_path: str, block: int = 96):
    """Fit the pristine MVG model from a directory of natural images."""
    import cv2
    feats = []
    for fname in sorted(os.listdir(image_dir)):
        img = cv2.imread(os.path.join(image_dir, fname),
                         cv2.IMREAD_GRAYSCALE)
        if img is None or min(img.shape) < 2 * block:
            continue
        feats.append(niqe_features(img, block))
    feats = np.concatenate(feats, axis=0)
    mu = np.nanmean(feats, axis=0)
    cov = np.cov(feats, rowvar=False)
    np.savez(out_path, mu=mu, cov=cov, block=block)
    return mu, cov


def niqe_score(img_gray: np.ndarray, model_path: str) -> float:
    model = np.load(model_path)
    mu_p, cov_p, block = model["mu"], model["cov"], int(model["block"])
    feats = niqe_features(img_gray, block)
    mu_d = np.nanmean(feats, axis=0)
    cov_d = np.cov(feats, rowvar=False)
    diff = mu_p - mu_d
    cov_avg = (cov_p + cov_d) / 2.0
    inv = np.linalg.pinv(cov_avg)
    return float(np.sqrt(max(diff @ inv @ diff, 0.0)))


# -- video -------------------------------------------------------------------------

def make_video(image_dir: str, out_path: str, fps: int = 10):
    """Stack a directory of frames into an mp4 (tools/make_video.py)."""
    import imageio
    from PIL import Image
    frames = [np.asarray(Image.open(os.path.join(image_dir, f)))
              for f in sorted(os.listdir(image_dir))
              if f.endswith((".png", ".jpg"))]
    imageio.mimwrite(out_path, frames, fps=fps, quality=8)
    return len(frames)


# -- canonical point-cloud distances / clustering ----------------------------------

def mutual_nearest_pairs(xa: np.ndarray, xb: np.ndarray):
    """Mutual nearest-neighbor pairs between two point sets
    (tools/compute_distance.py find_nearest_pair): returns (i0, i1, d01)
    where d01[k] = |xa[i0[k]] - xb[i1[k]]|."""
    d = np.linalg.norm(xa[:, None] - xb[None], axis=-1)
    n0 = d.argmin(axis=1)
    n1 = d.argmin(axis=0)
    mutual = n1[n0] == np.arange(len(xa))
    i0 = np.where(mutual)[0]
    i1 = n0[i0]
    return i0, i1, d[i0, i1]


def _valid_split(a: np.ndarray, weight_threshold: float):
    """Filter a dump by weight (column 6) -> (xyz, rgb, pos-or-None)."""
    m = a[:, 6] > weight_threshold
    pos = a[m, 7:9].astype(np.int64) if a.shape[1] >= 10 else None
    return a[m, :3], a[m, 3:6], pos


def frame_distance(a: np.ndarray, b: np.ndarray, dist_thresh: float = 0.002,
                   weight_threshold: float = 0.3) -> float:
    """Appearance distance between two frames' canonical dumps
    (tools/compute_distance.py:7-42): mutual-nearest canonical points closer
    than dist_thresh contribute their RGB error.

    a, b: (N, 7) or (N, 10) arrays [xyz, rgb, weight, ...] (run.py save_3d).
    """
    xa, ra, _ = _valid_split(a, weight_threshold)
    xb, rb, _ = _valid_split(b, weight_threshold)
    if len(xa) == 0 or len(xb) == 0:
        return 0.0
    i0, i1, d01 = mutual_nearest_pairs(xa, xb)
    close = d01 < dist_thresh
    return float(np.sum(np.linalg.norm(ra[i0[close]] - rb[i1[close]],
                                       axis=-1)))


def pairwise_distance_matrix(dump_path: str, out_path: str,
                             chunk_id: int = 0, chunk_n: int = 1, **kw):
    """Full (or row-sharded) distance matrix.

    chunk_id/chunk_n shard rows strided: shard k owns rows k, k+n, k+2n...
    Deliberate divergence from the reference (compute_distance_seg.py:65-67),
    whose last shard ALSO appends every row after its final strided row --
    rows other shards already own, so summing reference shards double-counts
    them. Plain striding covers each row exactly once, making the
    `distance-merge` summation exact.
    """
    with open(dump_path, "rb") as f:
        name2info = pickle.load(f)
    names = sorted(name2info)
    n = len(names)
    D = np.zeros((n, n), np.float64)
    rows = range(n) if chunk_n <= 1 else range(chunk_id, n, chunk_n)
    for i in rows:
        a = name2info[names[i]]
        if a is None:
            continue
        for j in range(i + 1, n):
            b = name2info[names[j]]
            if b is None:
                continue
            D[i, j] = D[j, i] = frame_distance(
                np.asarray(a), np.asarray(b), **kw)
    np.save(out_path, D)
    return names, D


def merge_distance_shards(paths: list, out_path: str) -> np.ndarray:
    """Sum row-sharded matrices into the full one (each pair is computed by
    exactly one shard, so summation == union)."""
    D = None
    for p in paths:
        part = np.load(p)
        D = part if D is None else D + part
    np.save(out_path, D)
    return D


def single_pair_distance(dump_path: str, name0: str, name1: str,
                         obj_out: str | None = None,
                         dist_thresh: float = 0.002,
                         weight_threshold: float = 0.3) -> float:
    """One-pair distance + optional error-map point cloud
    (compute_distance_single_pair.py:24-62): mutual pairs closer than
    dist_thresh written as a colored .obj, color = RGB-error heat."""
    with open(dump_path, "rb") as f:
        name2info = pickle.load(f)
    a, b = np.asarray(name2info[name0]), np.asarray(name2info[name1])
    xa, ra, _ = _valid_split(a, weight_threshold)
    xb, rb, _ = _valid_split(b, weight_threshold)
    i0, i1, d01 = mutual_nearest_pairs(xa, xb)
    close = d01 < dist_thresh
    errs = np.linalg.norm(ra[i0[close]] - rb[i1[close]], axis=-1)
    if obj_out:
        import cv2
        heat = cv2.applyColorMap(
            np.clip(errs[:, None] * 255, 0, 255).astype(np.uint8),
            cv2.COLORMAP_JET)[:, 0, ::-1] / 255.0      # BGR -> RGB
        os.makedirs(os.path.dirname(obj_out) or ".", exist_ok=True)
        with open(obj_out, "w") as f:
            for xyzs in (xa[i0[close]], xb[i1[close]]):
                for xyz, rgb in zip(xyzs, heat):
                    f.write(f"v {xyz[0]:.7f} {xyz[1]:.7f} {xyz[2]:.7f} "
                            f"{rgb[0]:.7f} {rgb[1]:.7f} {rgb[2]:.7f}\n")
    return float(errs.sum())


# -- body-part segmentation of canonical dumps --------------------------------------

# body-part -> SMPL joint ids (reference tools/segment.py:5-14; anatomy table)
PART_CLUSTERS = {
    "root": [0],
    "lhip": [1], "rhip": [2],
    "lknee": [4], "rknee": [5],
    "lfoot": [7, 10], "rfoot": [8, 11],
    "belly": [3], "spine": [6],
    "chest-inshoulder-neck": [9, 12, 13, 14],
    "head": [15],
    "lshoulder-elbow": [16, 18], "rshoulder-elbow": [17, 19],
    "lwrist-hand": [20, 22], "rwrist-hand": [21, 23],
}


def segment_dump(dump_path: str, out_dir: str, dilate_px: float = 10.0):
    """Split a (N, 10) name-2-3d dump into per-body-part dumps.

    Reference tools/segment.py:22-52: a point belongs to a part if its image
    position is within `dilate_px` L1 pixels of any point whose argmax-LBS
    joint is in the part (10px dilation smooths part borders). Frames with no
    member points store None. Writes one pickle per part.
    """
    with open(dump_path, "rb") as f:
        name2info = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    outs = {part: {} for part in PART_CLUSTERS}
    for name, arr in name2info.items():
        arr = np.asarray(arr)
        assert arr.shape[1] >= 10, "segment needs the 10-column dump layout"
        pos = arr[:, 7:9]
        lbs = arr[:, 9].astype(np.int64)
        for part, ids in PART_CLUSTERS.items():
            member = np.isin(lbs, ids)
            if not member.any():
                outs[part][name] = None
                continue
            mpos = pos[member]
            keep = np.zeros(len(arr), bool)
            # chunk the (N, M) L1 distance to bound memory on big frames
            step = max(1, 2_000_000 // max(len(mpos), 1))
            for s in range(0, len(arr), step):
                d = np.abs(pos[s:s + step, None] - mpos[None]).sum(-1)
                keep[s:s + step] = d.min(axis=1) < dilate_px
            outs[part][name] = arr[keep]
    paths = {}
    for part, data in outs.items():
        p = os.path.join(out_dir, f"name-2-3d.{part}.pkl")
        with open(p, "wb") as f:
            pickle.dump(data, f)
        paths[part] = p
    return paths


# -- cross-frame appearance warp strips ----------------------------------------------

def warp_images(dump_path: str, name0: str, name1: str, out_dir: str,
                size: int | None = None, dist_thresh: float = 1.0,
                weight_threshold: float = 0.0, max_dist: float = 0.02):
    """Warp frame0's appearance onto frame1 via canonical mutual-NN pairs
    (warp_img.py:95-190) and write two comparison strips per direction:
    [src, dst, warped, rgb-error heat, NN-distance heat]."""
    import cv2
    with open(dump_path, "rb") as f:
        name2info = pickle.load(f)
    a, b = np.asarray(name2info[name0]), np.asarray(name2info[name1])
    assert a.shape[1] >= 10 and b.shape[1] >= 10, \
        "warp-img needs the 10-column dump layout (image positions)"
    xa, ra, pa = _valid_split(a, weight_threshold)
    xb, rb, pb = _valid_split(b, weight_threshold)
    if size is None:
        size = int(max(pa.max(), pb.max())) + 1
    i0, i1, d01 = mutual_nearest_pairs(xa, xb)
    close = d01 < dist_thresh

    def splat(pos, rgb):
        img = np.zeros([size, size, 3], np.uint8)
        img[pos[:, 0], pos[:, 1]] = np.clip(rgb * 255, 0, 255).astype(np.uint8)
        return img

    img0, img1 = splat(pa, ra), splat(pb, rb)
    errs = np.linalg.norm(ra[i0] - rb[i1], axis=-1)
    heat = cv2.applyColorMap(
        np.clip(errs[:, None] * 255, 0, 255).astype(np.uint8),
        cv2.COLORMAP_JET)[:, 0, ::-1]

    img01 = np.zeros_like(img0)    # frame0's colors at frame1's pixels
    img10 = np.zeros_like(img0)
    err01 = np.zeros_like(img0)
    err10 = np.zeros_like(img0)
    p0c, p1c = pa[i0[close]], pb[i1[close]]
    img01[p1c[:, 0], p1c[:, 1]] = np.clip(
        ra[i0[close]] * 255, 0, 255).astype(np.uint8)
    img10[p0c[:, 0], p0c[:, 1]] = np.clip(
        rb[i1[close]] * 255, 0, 255).astype(np.uint8)
    err01[p1c[:, 0], p1c[:, 1]] = heat[close]
    err10[p0c[:, 0], p0c[:, 1]] = heat[close]

    def dist_heat(pos, idx, d):
        # explicit painted-pixel mask (reference warp_img.py:166-171):
        # zero-distance pairs must render JET(0), not vanish to background
        m = np.zeros([size, size, 3], np.float32)
        painted = np.zeros([size, size, 1], bool)
        m[pos[idx, 0], pos[idx, 1], :] = np.clip(d, 0, max_dist)[:, None]
        painted[pos[idx, 0], pos[idx, 1]] = True
        dm = cv2.applyColorMap((m / max_dist * 255).astype(np.uint8)[..., 0],
                               cv2.COLORMAP_JET)[:, :, ::-1]
        return dm * painted.astype(np.uint8)

    d0_map = dist_heat(pa, i0, d01)
    d1_map = dist_heat(pb, i1, d01)
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image
    strip01 = np.concatenate([img0, img1, img01, err01, d1_map], axis=1)
    strip10 = np.concatenate([img1, img0, img10, err10, d0_map], axis=1)
    o01 = os.path.join(out_dir, f"{name0}-to-{name1}.png")
    o10 = os.path.join(out_dir, f"{name1}-to-{name0}.png")
    Image.fromarray(strip01).save(o01)
    Image.fromarray(strip10).save(o10)
    return o01, o10


def greedy_maxmin_cluster(D: np.ndarray, n_clusters: int):
    """The reference's greedy clustering (tools/cluster.py:23-50): grow each
    cluster by repeatedly adding the sample minimizing its max distance to
    the cluster."""
    N = D.shape[0]
    M = N // n_clusters
    clustered: list[int] = []
    clusters = []
    for _ in range(n_clusters):
        remaining = [i for i in range(N) if i not in clustered]
        seeds = [remaining[0]]
        dist2cluster = D[seeds[0]].astype(np.float64).copy()
        dist2cluster[seeds + clustered] = np.inf
        while len(seeds) < M:
            i = int(np.argmin(dist2cluster))
            seeds.append(i)
            dist2cluster = np.maximum(dist2cluster, D[i])
            dist2cluster[seeds + clustered] = np.inf
        clusters.append(seeds)
        clustered.extend(seeds)
    return clusters


def cluster_montage(cluster_pkl: str, image_dir: str, out_dir: str,
                    tile: int = 256, grid: int = 8, names_file=None):
    """Tiled per-cluster montage grids (tools/draw_sorted_image.py:30-50):
    each cluster's member images are resized to tile x tile and pasted into
    grid x grid sheets, one or more PNGs per cluster.

    Accepts either this repo's `cluster` output (list of index lists, with
    --names mapping index -> image stem) or the reference's pickle of
    {'names': [...]} dicts."""
    from PIL import Image
    with open(cluster_pkl, "rb") as f:
        clusters = pickle.load(f)
    names = None
    if names_file:
        names = [ln.strip() for ln in open(names_file) if ln.strip()]
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for cid, cluster in enumerate(clusters):
        if isinstance(cluster, dict):
            members = list(cluster["names"])
        else:
            members = [names[i] if names is not None else str(i)
                       for i in cluster]
        paths = []
        for n in members:
            p = os.path.join(image_dir, n)
            if not os.path.splitext(n)[1]:
                p += ".png"
            paths.append(p)
        per = grid * grid
        for gi in range(0, len(paths), per):
            sheet = Image.new("RGB", (tile * grid, tile * grid))
            for idx, p in enumerate(paths[gi:gi + per]):
                img = Image.open(p).convert("RGB").resize(
                    (tile, tile), Image.LANCZOS)
                sheet.paste(img, (idx % grid * tile, idx // grid * tile))
            out = os.path.join(out_dir, f"cluster{cid}_{gi // per}.png")
            sheet.save(out)
            written.append(out)
    return written


# -- LBS-vs-full comparison ---------------------------------------------------------

def compare_lbs(full_dir: str, lbs_dir: str, out_dir: str,
                metric: str = "psnr"):
    """Side-by-side comparison grids with per-image metric in the filename
    (compare_lbs_delta.py). Expects <dir>/ PNGs + <dir>-metrics.perimg.txt."""
    import cv2
    os.makedirs(out_dir, exist_ok=True)

    def read_scores(d):
        scores = {}
        path = d.rstrip("/") + "-metrics.perimg.txt"
        if not os.path.isfile(path):
            return scores
        for line in open(path):
            if ":" not in line:
                continue
            name, rest = line.strip().split(":", 1)
            for tok in rest.split():
                if tok.startswith(metric + "-"):
                    scores[name] = float(tok.split("-", 1)[1])
        return scores

    s_full, s_lbs = read_scores(full_dir), read_scores(lbs_dir)
    count = 0
    for fname in sorted(os.listdir(full_dir)):
        if not fname.endswith(".png"):
            continue
        a = cv2.imread(os.path.join(lbs_dir, fname))
        b = cv2.imread(os.path.join(full_dir, fname))
        if a is None or b is None:
            continue
        stem = os.path.splitext(fname)[0]
        v_l = s_lbs.get(stem, float("nan"))
        v_f = s_full.get(stem, float("nan"))
        grid = np.concatenate([a, b], axis=1)
        cv2.imwrite(os.path.join(
            out_dir, f"{stem}_lbs-{v_l:.1f}_full-{v_f:.1f}.png"), grid)
        count += 1
    return count


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("masked-psnr")
    p.add_argument("--pred"), p.add_argument("--gt"), p.add_argument("--mask")
    p.add_argument("--out", required=True)
    p.add_argument("--parts", type=int, nargs="*", default=None)

    p = sub.add_parser("niqe-fit")
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("niqe")
    p.add_argument("--images", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("make-video")
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=int, default=10)

    p = sub.add_parser("pairwise-distance")
    p.add_argument("--dump", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--chunk-id", type=int, default=0)
    p.add_argument("--chunk-n", type=int, default=1)
    p.add_argument("--weight-threshold", type=float, default=0.3)
    p.add_argument("--dist-thresh", type=float, default=0.002)

    p = sub.add_parser("distance-merge")
    p.add_argument("--shards", nargs="+", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("distance-pair")
    p.add_argument("--dump", required=True)
    p.add_argument("--name0", required=True)
    p.add_argument("--name1", required=True)
    p.add_argument("--obj-out", default=None)
    p.add_argument("--weight-threshold", type=float, default=0.3)
    p.add_argument("--dist-thresh", type=float, default=0.002)

    p = sub.add_parser("segment")
    p.add_argument("--dump", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--dilate", type=float, default=10.0)

    p = sub.add_parser("warp-img")
    p.add_argument("--dump", required=True)
    p.add_argument("--name0", required=True)
    p.add_argument("--name1", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--weight-threshold", type=float, default=0.0)
    p.add_argument("--dist-thresh", type=float, default=1.0)

    p = sub.add_parser("cluster")
    p.add_argument("--matrix", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", required=True)

    p = sub.add_parser("cluster-montage")
    p.add_argument("--clusters", required=True, help="cluster pkl")
    p.add_argument("--images", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--grid", type=int, default=8)
    p.add_argument("--names", default=None,
                   help="text file mapping cluster indices to image stems")

    p = sub.add_parser("compare-lbs")
    p.add_argument("--full", required=True)
    p.add_argument("--lbs", required=True)
    p.add_argument("--out", required=True)

    args = ap.parse_args()
    if args.cmd == "masked-psnr":
        masked_psnr(args.pred, args.gt, args.mask, args.out, args.parts)
    elif args.cmd == "niqe-fit":
        niqe_fit(args.images, args.out)
    elif args.cmd == "niqe":
        import cv2
        with open(args.out, "w") as f:
            scores = []
            for fname in sorted(os.listdir(args.images)):
                img = cv2.imread(os.path.join(args.images, fname),
                                 cv2.IMREAD_GRAYSCALE)
                if img is None:
                    continue
                s = niqe_score(img, args.model)
                scores.append(s)
                f.write(f"{fname}: niqe-{s:.4f}\n")
            if scores:
                f.write(f"average: {np.mean(scores):.4f}\n")
    elif args.cmd == "make-video":
        make_video(args.images, args.out, args.fps)
    elif args.cmd == "pairwise-distance":
        pairwise_distance_matrix(
            args.dump, args.out, chunk_id=args.chunk_id,
            chunk_n=args.chunk_n, weight_threshold=args.weight_threshold,
            dist_thresh=args.dist_thresh)
    elif args.cmd == "distance-merge":
        merge_distance_shards(args.shards, args.out)
    elif args.cmd == "distance-pair":
        d = single_pair_distance(
            args.dump, args.name0, args.name1, obj_out=args.obj_out,
            weight_threshold=args.weight_threshold,
            dist_thresh=args.dist_thresh)
        print(f"distance({args.name0}, {args.name1}) = {d:.6f}")
    elif args.cmd == "segment":
        paths = segment_dump(args.dump, args.out_dir, dilate_px=args.dilate)
        for part, path in paths.items():
            print(f"{part}: {path}")
    elif args.cmd == "warp-img":
        o01, o10 = warp_images(
            args.dump, args.name0, args.name1, args.out_dir, size=args.size,
            weight_threshold=args.weight_threshold,
            dist_thresh=args.dist_thresh)
        print(o01)
        print(o10)
    elif args.cmd == "cluster":
        D = np.load(args.matrix)
        clusters = greedy_maxmin_cluster(D, args.n)
        with open(args.out, "wb") as f:
            pickle.dump(clusters, f)
    elif args.cmd == "cluster-montage":
        for path in cluster_montage(args.clusters, args.images, args.out_dir,
                                    tile=args.tile, grid=args.grid,
                                    names_file=args.names):
            print(path)
    elif args.cmd == "compare-lbs":
        compare_lbs(args.full, args.lbs, args.out)


if __name__ == "__main__":
    main()
