// Native host-side kernels for the data/preprocessing pipeline.
//
// The reference's slowest offline path is its per-file numpy FPS loop
// (preprocessing.py:7-28, SURVEY.md §3.5). The TPU build runs FPS batched
// on-device for large runs, but the host pipeline also wants a fast native
// path (no device round-trip, no JAX dependency) for preprocessing workers
// and tests. Exposed via a plain C ABI for ctypes.
//
// Build: make -C native   (produces libshapegen_native.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

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

// ---------------------------------------------------------------------------
// Exact linear sum assignment (the Hungarian-EMD hot path).
//
// The reference's exact EMD (metrics.py:49-92) is scipy's
// linear_sum_assignment over a dense Euclidean cost matrix — on the eval
// host this is the floor of the whole test pipeline (the device metrics
// overlap it; BASELINE.md "eval overlap"). This is the same shortest
// augmenting path algorithm scipy implements (Crouse 2016, "On implementing
// 2D rectangular assignment algorithms"), with two host-side wins:
//   * the cost matrix stays float32 (scipy converts to float64): half the
//     bytes through every O(n^2) Dijkstra scan of the O(n^3) algorithm —
//     the scans are bandwidth-bound at n=2048 (16 MB matrix >> L2);
//   * path bookkeeping (potentials, shortest-path costs) stays float64, so
//     the assignment is optimal for the float32-rounded costs exactly as
//     scipy's is after its own f32->f64 conversion of the same matrix.
// Requires n <= m (the Python wrapper transposes otherwise).
// Returns 0 on success, -1 on infeasibility (cannot happen for finite
// costs) — col4row[i] = assigned column of row i.

// Jonker-Volgenant 1987 initialization for the SQUARE case: column
// reduction + reduction transfer. This assigns a large share of rows
// before any Dijkstra runs and tightens the duals, so the shortest-
// augmenting-path phase (the O(n^2) scans) does less work. Produces
// feasible duals (reduced cost >= 0 everywhere, == 0 on assignments),
// which is exactly what the path phase requires. Returns the list of
// still-free rows. (The original's third step, augmenting row reduction,
// is omitted — see the note below.)
static void jv_initialize(const float* c, int64_t n, std::vector<double>& u,
                          std::vector<double>& v, int32_t* col4row,
                          std::vector<int32_t>& row4col,
                          std::vector<int32_t>& free_rows) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<int32_t> matches(n, 0);

    // Column reduction, reverse order (ties go to the lowest row of the
    // LAST column processed, as in the original).
    for (int64_t j = n - 1; j >= 0; --j) {
        double mn = (double)c[j];
        int64_t i1 = 0;
        for (int64_t i = 1; i < n; ++i) {
            const double val = (double)c[i * n + j];
            if (val < mn) {
                mn = val;
                i1 = i;
            }
        }
        v[j] = mn;
        if (matches[i1]++ == 0) {
            col4row[i1] = (int32_t)j;
            row4col[j] = (int32_t)i1;
        } else {
            row4col[j] = -1;
        }
    }

    // Reduction transfer for singly-matched rows.
    free_rows.clear();
    for (int64_t i = 0; i < n; ++i) {
        if (matches[i] == 0) {
            free_rows.push_back((int32_t)i);
        } else if (matches[i] == 1) {
            const int64_t j1 = col4row[i];
            double mn = INF;
            const float* row = c + i * n;
            for (int64_t j = 0; j < n; ++j) {
                if (j != j1) {
                    const double r = (double)row[j] - v[j];
                    if (r < mn) mn = r;
                }
            }
            if (mn < INF) v[j1] -= mn;
        }
    }

    // NOTE: the original LAPJV also runs "augmenting row reduction" here.
    // Measured on this workload (dense cube-normalized Euclidean costs,
    // n = 2048) it is catastrophically degenerate — near-tied reduced
    // costs make its retry-immediately loop thrash through thousands of
    // O(n) scans for ~1e-9 dual improvements (85-110 s/pair vs 4.8 s with
    // CR+RT only and 6.1 s plain) — so it is deliberately omitted.

    // Feasible duals for the assigned rows (zero reduced cost on the
    // assignment, the row minimum elsewhere); free rows enter the path
    // phase with u = 0 as usual.
    for (int64_t i = 0; i < n; ++i) u[i] = 0.0;
    std::vector<char> is_free(n, 0);
    for (int32_t f : free_rows) is_free[f] = 1;
    for (int64_t i = 0; i < n; ++i) {
        if (!is_free[i]) {
            const int64_t j = col4row[i];
            u[i] = (double)c[i * n + j] - v[j];
        }
    }
}

static int lsa_f32_impl(const float* cost, int64_t n, int64_t m,
                        int32_t* col4row) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> u(n, 0.0), v(m, 0.0), shortest(m);
    std::vector<int32_t> path(m, -1), row4col(m, -1);
    std::vector<int32_t> remaining(m);
    std::vector<char> scanned_rows(n);
    std::vector<int32_t> scanned_cols;
    scanned_cols.reserve(m);
    for (int64_t i = 0; i < n; ++i) col4row[i] = -1;

    std::vector<int32_t> rows_to_solve;
    if (n == m && n > 1) {
        jv_initialize(cost, n, u, v, col4row, row4col, rows_to_solve);
    } else {
        rows_to_solve.resize(n);
        for (int64_t i = 0; i < n; ++i) rows_to_solve[i] = (int32_t)i;
    }

    for (const int32_t cur_row : rows_to_solve) {
        std::fill(shortest.begin(), shortest.end(), INF);
        std::fill(scanned_rows.begin(), scanned_rows.end(), 0);
        scanned_cols.clear();
        for (int64_t j = 0; j < m; ++j) remaining[j] = (int32_t)j;
        int64_t num_remaining = m;
        double min_val = 0.0;
        int64_t sink = -1;
        int64_t i = cur_row;

        while (sink == -1) {
            scanned_rows[i] = 1;
            const float* row = cost + i * m;
            const double ui = u[i];
            int64_t index = -1;
            double lowest = INF;
            for (int64_t it = 0; it < num_remaining; ++it) {
                const int32_t j = remaining[it];
                const double r = min_val + (double)row[j] - ui - v[j];
                if (r < shortest[j]) {
                    path[j] = (int32_t)i;
                    shortest[j] = r;
                }
                // Tie-break toward an unassigned column: ends the Dijkstra
                // pass one step earlier (same rule as scipy).
                if (shortest[j] < lowest ||
                    (shortest[j] == lowest && row4col[j] == -1)) {
                    lowest = shortest[j];
                    index = it;
                }
            }
            min_val = lowest;
            if (min_val == INF) return -1;  // infeasible
            const int32_t j = remaining[index];
            if (row4col[j] == -1) {
                sink = j;
            } else {
                i = row4col[j];
            }
            scanned_cols.push_back(j);
            remaining[index] = remaining[--num_remaining];
        }

        // Update dual variables (potentials).
        u[cur_row] += min_val;
        for (int64_t r = 0; r < n; ++r) {
            if (scanned_rows[r] && r != cur_row) {
                u[r] += min_val - shortest[col4row[r]];
            }
        }
        for (int32_t j : scanned_cols) {
            v[j] -= min_val - shortest[j];
        }

        // Augment along the alternating path back from the sink.
        int64_t j = sink;
        while (true) {
            const int32_t r = path[j];
            row4col[j] = r;
            const int32_t prev = col4row[r];
            col4row[r] = (int32_t)j;
            if (r == (int32_t)cur_row) break;
            j = prev;
        }
    }
    return 0;
}

extern "C" {

int lsa_f32(const float* cost, int64_t n, int64_t m, int32_t* col4row) {
    if (n <= 0 || m <= 0 || n > m) return -2;
    return lsa_f32_impl(cost, n, m, col4row);
}

// Exact Hungarian EMD for one point-cloud pair (metrics.py:49-92 semantics
// minus the cube normalization, which the caller applies): builds the
// direct-form Euclidean cost matrix (no matmul cancellation — exact f32
// per-element distances, unlike the |x|^2+|y|^2-2xy form) into caller
// scratch, solves the assignment, and returns sum(cost[i, col4row[i]]).
// x: (n, dim), y: (m, dim) float32, n <= m (caller swaps otherwise; the
// assignment total is symmetric). scratch: n*m floats. Returns -1.0 on
// error.
double emd_pair_f32(const float* x, int64_t n, const float* y, int64_t m,
                    int64_t dim, float* scratch, int32_t* col4row) {
    if (n <= 0 || m <= 0 || dim <= 0 || n > m) return -1.0;
    for (int64_t i = 0; i < n; ++i) {
        const float* xi = x + i * dim;
        float* out = scratch + i * m;
        for (int64_t j = 0; j < m; ++j) {
            const float* yj = y + j * dim;
            float acc = 0.0f;
            for (int64_t k = 0; k < dim; ++k) {
                const float d = xi[k] - yj[k];
                acc += d * d;
            }
            out[j] = std::sqrt(acc);
        }
    }
    if (lsa_f32_impl(scratch, n, m, col4row) != 0) return -1.0;
    double total = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        total += (double)scratch[i * m + col4row[i]];
    }
    return total;
}

}  // extern "C"
