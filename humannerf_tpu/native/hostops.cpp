// Host-side data-path kernels (C ABI, loaded via ctypes).
//
// The per-item host work -- ray generation for every pixel and ray-AABB
// culling over H*W rays (reference core/utils/camera_util.py:132-208) -- is
// the host bottleneck that feeds the TPU; these OpenMP kernels keep the
// input pipeline ahead of device steps. Semantics match the numpy
// implementations in utils/camera.py exactly (same epsilons, same
// exactly-two-plane-hits rule); tests/test_native.py checks parity.

#include <cmath>
#include <cstdint>
#include <algorithm>

extern "C" {

// rays_o = -R^T t broadcast; rays_d[i,j] = ((x,y,1) K^{-T} - t) R - rays_o
// K_inv_T: 3x3 row-major (K^{-1})^T ; R: 3x3 row-major ; T: 3
void rays_from_krt(int H, int W,
                   const double* K_inv_T, const double* R, const double* T,
                   float* rays_o, float* rays_d) {
    double cam[3];
    // camera center: -R^T T
    for (int a = 0; a < 3; ++a)
        cam[a] = -(R[0 * 3 + a] * T[0] + R[1 * 3 + a] * T[1] +
                   R[2 * 3 + a] * T[2]);
#pragma omp parallel for schedule(static)
    for (int j = 0; j < H; ++j) {
        for (int i = 0; i < W; ++i) {
            double p[3] = {(double)i, (double)j, 1.0};
            double pc[3], pw[3];
            // pixel_camera = xy1 @ K^{-1 T}
            for (int a = 0; a < 3; ++a)
                pc[a] = p[0] * K_inv_T[0 * 3 + a] + p[1] * K_inv_T[1 * 3 + a] +
                        p[2] * K_inv_T[2 * 3 + a];
            // pixel_world = (pc - T) @ R
            for (int a = 0; a < 3; ++a)
                pw[a] = (pc[0] - T[0]) * R[0 * 3 + a] +
                        (pc[1] - T[1]) * R[1 * 3 + a] +
                        (pc[2] - T[2]) * R[2 * 3 + a];
            int64_t idx = (int64_t)(j * W + i) * 3;
            for (int a = 0; a < 3; ++a) {
                rays_o[idx + a] = (float)cam[a];
                rays_d[idx + a] = (float)(pw[a] - cam[a]);
            }
        }
    }
}

// Ray-AABB via the reference's six-plane / exactly-two-hits rule
// (camera_util.py:162-208): bounds inflated +-0.01, |d| clamped to 1e-5,
// plane hits accepted within 1e-6, near/far in units of |d|.
void rays_intersect_bbox(int64_t n,
                         const float* rays_o, const float* rays_d,
                         const double* bounds /* min xyz, max xyz */,
                         float* near, float* far, uint8_t* mask) {
    const double lo[3] = {bounds[0] - 0.01, bounds[1] - 0.01,
                          bounds[2] - 0.01};
    const double hi[3] = {bounds[3] + 0.01, bounds[4] + 0.01,
                          bounds[5] + 0.01};
    const double eps = 1e-6;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n; ++r) {
        double o[3], d[3];
        for (int a = 0; a < 3; ++a) {
            o[a] = rays_o[r * 3 + a];
            d[a] = rays_d[r * 3 + a];
            if (std::fabs(d[a]) < 1e-5) d[a] = 1e-5;
        }
        double hits[6][3];
        int nhit = 0;
        for (int plane = 0; plane < 6; ++plane) {
            int axis = plane % 3;
            double bound = plane < 3 ? lo[axis] : hi[axis];
            double t = (bound - o[axis]) / d[axis];
            double p[3] = {o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2]};
            bool inside = true;
            for (int a = 0; a < 3; ++a)
                inside = inside && p[a] >= lo[a] - eps && p[a] <= hi[a] + eps;
            if (inside && nhit < 6) {
                for (int a = 0; a < 3; ++a) hits[nhit][a] = p[a];
                ++nhit;
            }
        }
        if (nhit == 2) {
            double dn = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
            double t0 = 0, t1 = 0;
            for (int a = 0; a < 3; ++a) {
                t0 += (hits[0][a] - o[a]) * (hits[0][a] - o[a]);
                t1 += (hits[1][a] - o[a]) * (hits[1][a] - o[a]);
            }
            t0 = std::sqrt(t0) / dn;
            t1 = std::sqrt(t1) / dn;
            near[r] = (float)std::min(t0, t1);
            far[r] = (float)std::max(t0, t1);
            mask[r] = 1;
        } else {
            near[r] = 0.f;
            far[r] = 0.f;
            mask[r] = 0;
        }
    }
}

// alpha-blend an image over a background color in place:
// img = mask * img + (1 - mask) * bg   (train.py(dataset):407)
void composite_background(int64_t n_px, float* img, const float* mask,
                          const float* bg) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_px; ++i) {
        for (int c = 0; c < 3; ++c) {
            float m = mask[i * 3 + c];
            img[i * 3 + c] = m * img[i * 3 + c] + (1.f - m) * bg[c];
        }
    }
}

}  // extern "C"
