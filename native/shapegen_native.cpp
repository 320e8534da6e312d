// Native host-side kernels for the data/preprocessing pipeline.
//
// The reference's slowest offline path is its per-file numpy FPS loop
// (preprocessing.py:7-28, SURVEY.md §3.5). The TPU build runs FPS batched
// on-device for large runs, but the host pipeline also wants a fast native
// path (no device round-trip, no JAX dependency) for preprocessing workers
// and tests. Exposed via a plain C ABI for ctypes.
//
// Build: make -C native   (produces libshapegen_native.so)

#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// Farthest point sampling over one (n, 3) float32 cloud.
// Writes npoint indices to out_idx. start_idx selects the seed point
// (the reference seeds uniformly at random; the caller provides it).
// O(n * npoint), cache-friendly single pass per iteration.
void fps_f32(const float* points, int64_t n, int64_t npoint,
             int64_t start_idx, int32_t* out_idx, float* scratch_dist) {
    if (n <= 0 || npoint <= 0) return;
    for (int64_t i = 0; i < n; ++i) {
        scratch_dist[i] = std::numeric_limits<float>::max();
    }
    int64_t farthest = start_idx % n;
    for (int64_t s = 0; s < npoint; ++s) {
        out_idx[s] = static_cast<int32_t>(farthest);
        const float cx = points[farthest * 3 + 0];
        const float cy = points[farthest * 3 + 1];
        const float cz = points[farthest * 3 + 2];
        float best = -1.0f;
        int64_t best_i = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float dx = points[i * 3 + 0] - cx;
            const float dy = points[i * 3 + 1] - cy;
            const float dz = points[i * 3 + 2] - cz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < scratch_dist[i]) scratch_dist[i] = d;
            if (scratch_dist[i] > best) {
                best = scratch_dist[i];
                best_i = i;
            }
        }
        farthest = best_i;
    }
}

// Extract occupied-cell coordinates from a (d, h, w) float32 grid in
// row-major scan order, stacking columns as [x, y, z] (utils.py:511-538
// semantics). Returns the number of points written (capped at capacity).
int64_t voxels_to_points_f32(const float* voxels, int64_t d, int64_t h,
                             int64_t w, float threshold, float* out_points,
                             int64_t capacity) {
    int64_t count = 0;
    const int64_t hw = h * w;
    for (int64_t z = 0; z < d; ++z) {
        for (int64_t y = 0; y < h; ++y) {
            const float* row = voxels + z * hw + y * w;
            for (int64_t x = 0; x < w; ++x) {
                if (row[x] > threshold) {
                    if (count < capacity) {
                        out_points[count * 3 + 0] = static_cast<float>(x);
                        out_points[count * 3 + 1] = static_cast<float>(y);
                        out_points[count * 3 + 2] = static_cast<float>(z);
                    }
                    ++count;
                }
            }
        }
    }
    return count < capacity ? count : capacity;
}

// Scatter a point cloud into a (res, res, res) occupancy grid with the
// data.py:220-228 [z, y, x] axis order. Points are in [-1, 1].
void points_to_voxels_f32(const float* points, int64_t n, int64_t res,
                          float* out_grid) {
    std::memset(out_grid, 0, sizeof(float) * res * res * res);
    const float scale = (res - 1) / 2.0f;
    for (int64_t i = 0; i < n; ++i) {
        int64_t xi = static_cast<int64_t>((points[i * 3 + 0] + 1.0f) * scale);
        int64_t yi = static_cast<int64_t>((points[i * 3 + 1] + 1.0f) * scale);
        int64_t zi = static_cast<int64_t>((points[i * 3 + 2] + 1.0f) * scale);
        if (xi < 0) xi = 0; if (xi >= res) xi = res - 1;
        if (yi < 0) yi = 0; if (yi >= res) yi = res - 1;
        if (zi < 0) zi = 0; if (zi >= res) zi = res - 1;
        out_grid[(zi * res + yi) * res + xi] = 1.0f;
    }
}

}  // extern "C"
