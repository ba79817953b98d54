// Host-side native kernels (the C++ runtime component paralleling what the
// reference delegates to Omniverse/USD + Warp natively: mesh preprocessing
// and terrain synthesis; SURVEY.md §2.10 rows 2 and 4).
//
// Exposed through a plain C ABI consumed via ctypes
// (isaaclab_tpu/native/__init__.py). Everything here is trace-time host
// work — the TPU compute path stays in XLA/Pallas.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Triangle-soup -> height-field rasterization (top surface).
//
// The reference imports terrain meshes as USD and raycasts them with a Warp
// BVH; the TPU runtime representation is a height field, so meshes are
// rasterized once on host: for every grid cell covered by a triangle, the
// cell keeps the max interpolated z. verts: (nv, 3) float32, tris: (nt, 3)
// int32. Grid cell (r, c) center = (origin_x + (r+0.5)*hscale,
// origin_y + (c+0.5)*hscale).
// ---------------------------------------------------------------------------
void rasterize_mesh_to_heightfield(
    const float* verts, int64_t nv,
    const int32_t* tris, int64_t nt,
    float* out, int64_t rows, int64_t cols,
    float hscale, float origin_x, float origin_y, float fill) {
  for (int64_t i = 0; i < rows * cols; ++i) out[i] = fill;

  for (int64_t t = 0; t < nt; ++t) {
    const float* a = verts + 3 * tris[3 * t + 0];
    const float* b = verts + 3 * tris[3 * t + 1];
    const float* c = verts + 3 * tris[3 * t + 2];
    float min_x = std::min({a[0], b[0], c[0]});
    float max_x = std::max({a[0], b[0], c[0]});
    float min_y = std::min({a[1], b[1], c[1]});
    float max_y = std::max({a[1], b[1], c[1]});
    int64_t r0 = std::max<int64_t>(0, (int64_t)std::floor((min_x - origin_x) / hscale - 0.5f));
    int64_t r1 = std::min<int64_t>(rows - 1, (int64_t)std::ceil((max_x - origin_x) / hscale));
    int64_t c0 = std::max<int64_t>(0, (int64_t)std::floor((min_y - origin_y) / hscale - 0.5f));
    int64_t c1 = std::min<int64_t>(cols - 1, (int64_t)std::ceil((max_y - origin_y) / hscale));
    float d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1]);
    if (std::fabs(d) < 1e-12f) continue;  // degenerate in xy
    for (int64_t r = r0; r <= r1; ++r) {
      float px = origin_x + (r + 0.5f) * hscale;
      for (int64_t cc = c0; cc <= c1; ++cc) {
        float py = origin_y + (cc + 0.5f) * hscale;
        float w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) / d;
        float w1 = ((c[1] - a[1]) * (px - a[0]) + (a[0] - c[0]) * (py - a[1])) / d;
        float w2 = 1.0f - w0 - w1;
        const float eps = -1e-5f;
        if (w0 >= eps && w1 >= eps && w2 >= eps) {
          float z = w0 * a[2] + w1 * b[2] + w2 * c[2];
          float& cell = out[r * cols + cc];
          cell = std::max(cell, z);
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Random-uniform terrain (reference hf_terrains.py:random_uniform_terrain):
// coarse grid of quantized noise, bilinear upsample. Deterministic xorshift64
// seeded per call.
// ---------------------------------------------------------------------------
static inline uint64_t xorshift64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

void hf_random_uniform(
    float* out, int64_t rows, int64_t cols,
    int64_t coarse_rows, int64_t coarse_cols,
    float lo, float hi, float step, uint64_t seed) {
  std::vector<float> coarse(coarse_rows * coarse_cols);
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
  int64_t nsteps = step > 0 ? (int64_t)((hi - lo) / step + 1.0001f) : 1;
  for (auto& v : coarse) {
    uint64_t r = xorshift64(&s);
    v = lo + step * (float)(r % (uint64_t)std::max<int64_t>(nsteps, 1));
  }
  for (int64_t i = 0; i < rows; ++i) {
    float ri = (float)i * (coarse_rows - 1) / std::max<int64_t>(rows - 1, 1);
    int64_t r0 = std::min<int64_t>((int64_t)ri, coarse_rows - 2);
    float fr = ri - r0;
    for (int64_t j = 0; j < cols; ++j) {
      float cj = (float)j * (coarse_cols - 1) / std::max<int64_t>(cols - 1, 1);
      int64_t c0 = std::min<int64_t>((int64_t)cj, coarse_cols - 2);
      float fc = cj - c0;
      float v =
          coarse[r0 * coarse_cols + c0] * (1 - fr) * (1 - fc) +
          coarse[(r0 + 1) * coarse_cols + c0] * fr * (1 - fc) +
          coarse[r0 * coarse_cols + c0 + 1] * (1 - fr) * fc +
          coarse[(r0 + 1) * coarse_cols + c0 + 1] * fr * fc;
      out[i * cols + j] = v;
    }
  }
}

// ---------------------------------------------------------------------------
// Height-field smoothing / slope limiting (reference
// height_field_to_mesh slope_threshold correction): clamps cell-to-cell
// height jumps so rasterized stairs don't alias into unclimbable walls.
// ---------------------------------------------------------------------------
void hf_limit_slope(float* hf, int64_t rows, int64_t cols, float max_step,
                    int iterations) {
  for (int it = 0; it < iterations; ++it) {
    for (int64_t i = 0; i < rows; ++i) {
      for (int64_t j = 0; j < cols; ++j) {
        float& h = hf[i * cols + j];
        if (i + 1 < rows) {
          float n = hf[(i + 1) * cols + j];
          if (h - n > max_step) h = n + max_step;
        }
        if (j + 1 < cols) {
          float n = hf[i * cols + j + 1];
          if (h - n > max_step) h = n + max_step;
        }
      }
    }
  }
}

}  // extern "C"
