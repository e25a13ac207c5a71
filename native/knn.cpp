// Native 3-nearest-neighbor mean squared distance for Gaussian scale init.
//
// TPU-native replacement for the reference's `simple-knn` CUDA extension
// (package simple_knn._C, sole entry `distCUDA2`, used once at model init:
// /root/reference/scene/gaussian_model.py:20,177). On a TPU host this is a
// CPU-side job; like simple-knn's Morton-box search, we use a spatial
// decomposition — a uniform grid with ring expansion — giving exact 3-NN
// in ~O(n) for typical SfM point distributions.
//
// C ABI for ctypes:
//   void mean_sq_dist_knn3(const float* pts, int64_t n, float* out);
//
// Build: g++ -O3 -shared -fPIC -o libknn.so knn.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Top3 {
  float d[3] = {1e30f, 1e30f, 1e30f};
  inline void push(float v) {
    if (v < d[2]) {
      d[2] = v;
      if (d[2] < d[1]) std::swap(d[1], d[2]);
      if (d[1] < d[0]) std::swap(d[0], d[1]);
    }
  }
  inline float worst() const { return d[2]; }
  inline float mean() const { return (d[0] + d[1] + d[2]) / 3.0f; }
};

}  // namespace

extern "C" void mean_sq_dist_knn3(const float* pts, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return;
  }
  if (n <= 4) {  // brute force tiny inputs
    for (int64_t i = 0; i < n; ++i) {
      Top3 t;
      for (int64_t j = 0; j < n; ++j) {
        if (i == j) continue;
        float dx = pts[3 * i] - pts[3 * j];
        float dy = pts[3 * i + 1] - pts[3 * j + 1];
        float dz = pts[3 * i + 2] - pts[3 * j + 2];
        t.push(dx * dx + dy * dy + dz * dz);
      }
      // fewer than 3 neighbors: average over what exists
      int k = static_cast<int>(std::min<int64_t>(3, n - 1));
      float s = 0.0f;
      for (int q = 0; q < k; ++q) s += t.d[q];
      out[i] = s / k;
      continue;
    }
    return;
  }

  float lo[3] = {1e30f, 1e30f, 1e30f};
  float hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      lo[c] = std::min(lo[c], pts[3 * i + c]);
      hi[c] = std::max(hi[c], pts[3 * i + c]);
    }
  }

  // ~8 points per cell on average.
  int64_t target_cells = std::max<int64_t>(n / 8, 1);
  int dim = std::max(1, (int)std::cbrt((double)target_cells));
  dim = std::min(dim, 256);
  float span[3], inv_cell[3];
  for (int c = 0; c < 3; ++c) {
    span[c] = std::max(hi[c] - lo[c], 1e-12f);
    inv_cell[c] = dim / (span[c] * 1.0000001f);
  }
  auto cell_of = [&](int64_t i, int c) {
    int v = (int)((pts[3 * i + c] - lo[c]) * inv_cell[c]);
    return std::min(std::max(v, 0), dim - 1);
  };

  // counting-sort points into cells
  int64_t ncells = (int64_t)dim * dim * dim;
  std::vector<int64_t> cell_start(ncells + 1, 0);
  std::vector<int32_t> cell_idx(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cid = ((int64_t)cell_of(i, 2) * dim + cell_of(i, 1)) * dim +
                  cell_of(i, 0);
    cell_idx[i] = (int32_t)cid;
    cell_start[cid + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) cell_start[c + 1] += cell_start[c];
  std::vector<int32_t> order(n);
  {
    std::vector<int64_t> cursor(cell_start.begin(), cell_start.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[cell_idx[i]]++] = (int32_t)i;
  }

  float cell_w[3];
  for (int c = 0; c < 3; ++c) cell_w[c] = span[c] / dim;
  float min_cell_w = std::min(cell_w[0], std::min(cell_w[1], cell_w[2]));

  for (int64_t i = 0; i < n; ++i) {
    int cx = cell_of(i, 0), cy = cell_of(i, 1), cz = cell_of(i, 2);
    Top3 top;
    int found = 0;
    for (int ring = 0; ring < dim; ++ring) {
      // Stop before processing ring r once no point there can beat the
      // current 3rd-best: our point sits somewhere inside the center cell,
      // so the closest point of a Chebyshev-ring-r cell is >= (r-1) cell
      // widths away.
      if (found >= 3 && ring >= 2) {
        float ring_dist = (ring - 1) * min_cell_w;
        if (ring_dist * ring_dist > top.worst()) break;
      }
      int x0 = std::max(cx - ring, 0), x1 = std::min(cx + ring, dim - 1);
      int y0 = std::max(cy - ring, 0), y1 = std::min(cy + ring, dim - 1);
      int z0 = std::max(cz - ring, 0), z1 = std::min(cz + ring, dim - 1);
      for (int z = z0; z <= z1; ++z)
        for (int y = y0; y <= y1; ++y)
          for (int x = x0; x <= x1; ++x) {
            // only the shell of this ring (inner cells already visited)
            if (ring > 0 && x != x0 && x != x1 && y != y0 && y != y1 &&
                z != z0 && z != z1)
              continue;
            if (ring > 0 &&
                std::max({std::abs(x - cx), std::abs(y - cy),
                          std::abs(z - cz)}) != ring)
              continue;
            int64_t cid = ((int64_t)z * dim + y) * dim + x;
            for (int64_t p = cell_start[cid]; p < cell_start[cid + 1]; ++p) {
              int64_t j = order[p];
              if (j == i) continue;
              float dx = pts[3 * i] - pts[3 * j];
              float dy = pts[3 * i + 1] - pts[3 * j + 1];
              float dz = pts[3 * i + 2] - pts[3 * j + 2];
              top.push(dx * dx + dy * dy + dz * dz);
              ++found;
            }
          }
      if (ring == dim - 1) break;
    }
    out[i] = top.mean();
  }
}
