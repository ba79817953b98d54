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

// ---------------------------------------------------------------------------
// Triangle mesh -> signed-distance grid.
//
// The reference's factory tasks run SDF mesh collision inside PhysX
// (direct/factory: nut/bolt/peg meshes with ~0.1 mm clearances). The TPU
// equivalent precomputes a dense SDF voxel grid once on host; runtime
// queries are trilinear gathers (physics/sdf.py). Unsigned distance is the
// exact point-triangle distance minimized over all triangles; sign comes
// from z-ray crossing parity per (x, y) grid column (watertight meshes).
//
// verts: (nv, 3) float32, tris: (nt, 3) int32, out: (nx*ny*nz) float32
// laid out x-major (ix*ny*nz + iy*nz + iz). Grid point (ix,iy,iz) =
// origin + spacing * (ix, iy, iz).
// ---------------------------------------------------------------------------
static inline float dot3(const float* a, const float* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

static float point_tri_dist2(const float* p, const float* a, const float* b,
                             const float* c) {
  // Ericson, Real-Time Collision Detection 5.1.5 (closest point on triangle)
  float ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
  float ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
  float ap[3] = {p[0] - a[0], p[1] - a[1], p[2] - a[2]};
  float d1 = dot3(ab, ap), d2 = dot3(ac, ap);
  float qx, qy, qz;
  if (d1 <= 0.f && d2 <= 0.f) {
    qx = a[0]; qy = a[1]; qz = a[2];
  } else {
    float bp[3] = {p[0] - b[0], p[1] - b[1], p[2] - b[2]};
    float d3 = dot3(ab, bp), d4 = dot3(ac, bp);
    if (d3 >= 0.f && d4 <= d3) {
      qx = b[0]; qy = b[1]; qz = b[2];
    } else {
      float vc = d1 * d4 - d3 * d2;
      if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
        float v = d1 / (d1 - d3);
        qx = a[0] + v * ab[0]; qy = a[1] + v * ab[1]; qz = a[2] + v * ab[2];
      } else {
        float cp[3] = {p[0] - c[0], p[1] - c[1], p[2] - c[2]};
        float d5 = dot3(ab, cp), d6 = dot3(ac, cp);
        if (d6 >= 0.f && d5 <= d6) {
          qx = c[0]; qy = c[1]; qz = c[2];
        } else {
          float vb = d5 * d2 - d1 * d6;
          if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
            float w = d2 / (d2 - d6);
            qx = a[0] + w * ac[0]; qy = a[1] + w * ac[1]; qz = a[2] + w * ac[2];
          } else {
            float va = d3 * d6 - d5 * d4;
            if (va <= 0.f && (d4 - d3) >= 0.f && (d5 - d6) >= 0.f) {
              float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
              qx = b[0] + w * (c[0] - b[0]);
              qy = b[1] + w * (c[1] - b[1]);
              qz = b[2] + w * (c[2] - b[2]);
            } else {
              float denom = 1.f / (va + vb + vc);
              float v = vb * denom, w = vc * denom;
              qx = a[0] + ab[0] * v + ac[0] * w;
              qy = a[1] + ab[1] * v + ac[1] * w;
              qz = a[2] + ab[2] * v + ac[2] * w;
            }
          }
        }
      }
    }
  }
  float dx = p[0] - qx, dy = p[1] - qy, dz = p[2] - qz;
  return dx * dx + dy * dy + dz * dz;
}

void sdf_from_mesh(const float* verts, int64_t nv, const int32_t* tris,
                   int64_t nt, float* out, int64_t nx, int64_t ny, int64_t nz,
                   float ox, float oy, float oz, float spacing) {
  (void)nv;
  // Per-triangle AABBs once
  std::vector<float> tmin(3 * nt), tmax(3 * nt);
  for (int64_t t = 0; t < nt; ++t) {
    const float* a = verts + 3 * tris[3 * t + 0];
    const float* b = verts + 3 * tris[3 * t + 1];
    const float* c = verts + 3 * tris[3 * t + 2];
    for (int k = 0; k < 3; ++k) {
      tmin[3 * t + k] = std::min({a[k], b[k], c[k]});
      tmax[3 * t + k] = std::max({a[k], b[k], c[k]});
    }
  }
  // Column-parity sign: for each (ix, iy) column collect triangle z-crossings
  // of the vertical ray, then walk iz upward flipping inside/outside.
  // The parity ray is jittered by an irrational sub-voxel offset: grid
  // columns frequently lie EXACTLY on mesh edges (procedural meshes share
  // the grid's axes), where the half-open edge rule miscounts crossings and
  // flips whole columns inside-out. The ~1e-3-voxel shift misclassifies
  // only a micron-scale shell at vertical walls.
  const float jx = 7.07e-4f * spacing, jy = 3.33e-4f * spacing;
  std::vector<float> crossings;
  for (int64_t ix = 0; ix < nx; ++ix) {
    float px = ox + spacing * (float)ix + jx;
    for (int64_t iy = 0; iy < ny; ++iy) {
      float py = oy + spacing * (float)iy + jy;
      crossings.clear();
      for (int64_t t = 0; t < nt; ++t) {
        if (px < tmin[3 * t] || px > tmax[3 * t] || py < tmin[3 * t + 1] ||
            py > tmax[3 * t + 1])
          continue;
        const float* a = verts + 3 * tris[3 * t + 0];
        const float* b = verts + 3 * tris[3 * t + 1];
        const float* c = verts + 3 * tris[3 * t + 2];
        float d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1]);
        if (std::fabs(d) < 1e-14f) continue;
        float w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) / d;
        float w1 = ((c[1] - a[1]) * (px - a[0]) + (a[0] - c[0]) * (py - a[1])) / d;
        float w2 = 1.f - w0 - w1;
        // half-open edge rule to avoid double counts on shared edges
        if (w0 >= 0.f && w1 >= 0.f && w2 > 0.f) {
          crossings.push_back(w0 * a[2] + w1 * b[2] + w2 * c[2]);
        }
      }
      std::sort(crossings.begin(), crossings.end());
      size_t ci = 0;
      bool inside = false;
      for (int64_t iz = 0; iz < nz; ++iz) {
        float pz = oz + spacing * (float)iz;
        while (ci < crossings.size() && crossings[ci] < pz) {
          inside = !inside;
          ++ci;
        }
        float p[3] = {px, py, pz};
        float best = 1e30f;
        for (int64_t t = 0; t < nt; ++t) {
          // AABB reject against current best radius
          float r = std::sqrt(best);
          if (p[0] < tmin[3 * t] - r || p[0] > tmax[3 * t] + r ||
              p[1] < tmin[3 * t + 1] - r || p[1] > tmax[3 * t + 1] + r ||
              p[2] < tmin[3 * t + 2] - r || p[2] > tmax[3 * t + 2] + r)
            continue;
          float d2 = point_tri_dist2(p, verts + 3 * tris[3 * t],
                                     verts + 3 * tris[3 * t + 1],
                                     verts + 3 * tris[3 * t + 2]);
          if (d2 < best) best = d2;
        }
        float dist = std::sqrt(best);
        out[(ix * ny + iy) * nz + iz] = inside ? -dist : dist;
      }
    }
  }
}

}  // extern "C"
