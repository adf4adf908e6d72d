"""Post-hoc analysis CLI: the reference's loose scripts as subcommands.

Covers (reference file -> subcommand):
  masked_psnr.py            -> masked-psnr   body-part-masked PSNR
  compute_niqe.py           -> niqe          no-reference NIQE (self-contained
                                             implementation; basicsr shipped
                                             pretrained pristine stats -- use
                                             `niqe-fit` to fit your own)
  tools/make_video.py       -> make-video    image dir -> mp4
  make_video.py             -> (same)
  tools/compute_distance*.py-> pairwise-distance  canonical point-cloud
                                             appearance distance matrix
  tools/cluster.py          -> cluster       greedy max-min clustering of a
                                             distance matrix
  compare_lbs_delta.py      -> compare-lbs   side-by-side LBS-only vs full
                                             renders with per-image PSNR

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

def frame_distance(a: np.ndarray, b: np.ndarray, dist_thresh: float = 0.002,
                   weight_threshold: float = 0.3) -> float:
    """Appearance distance between two frames' canonical dumps
    (tools/compute_distance.py:7-42): mutual-nearest canonical points closer
    than dist_thresh contribute their RGB error.

    a, b: (N, 7) arrays [xyz, rgb, weight] as written by run.py save_3d.
    """
    ma, mb = a[:, 6] > weight_threshold, b[:, 6] > weight_threshold
    xa, ra = a[ma, :3], a[ma, 3:6]
    xb, rb = b[mb, :3], b[mb, 3:6]
    if len(xa) == 0 or len(xb) == 0:
        return 0.0
    d = np.linalg.norm(xa[:, None] - xb[None], axis=-1)
    n0 = d.argmin(axis=1)
    n1 = d.argmin(axis=0)
    mutual = n1[n0] == np.arange(len(xa))
    i0 = np.where(mutual)[0]
    i1 = n0[i0]
    close = d[i0, i1] < dist_thresh
    return float(np.sum(np.linalg.norm(ra[i0[close]] - rb[i1[close]],
                                       axis=-1)))


def pairwise_distance_matrix(dump_path: str, out_path: str, **kw):
    with open(dump_path, "rb") as f:
        name2info = pickle.load(f)
    names = sorted(name2info)
    n = len(names)
    D = np.zeros((n, n), np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            D[i, j] = D[j, i] = frame_distance(
                np.asarray(name2info[names[i]]),
                np.asarray(name2info[names[j]]), **kw)
    np.save(out_path, D)
    return names, D


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

    p = sub.add_parser("cluster")
    p.add_argument("--matrix", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", required=True)

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
        pairwise_distance_matrix(args.dump, args.out)
    elif args.cmd == "cluster":
        D = np.load(args.matrix)
        clusters = greedy_maxmin_cluster(D, args.n)
        with open(args.out, "wb") as f:
            pickle.dump(clusters, f)
    elif args.cmd == "compare-lbs":
        compare_lbs(args.full, args.lbs, args.out)


if __name__ == "__main__":
    main()
