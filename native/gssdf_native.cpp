// Native host-side data-path kernels for the TPU framework.
//
// Reference analog: the reference's data layer is C++ with OpenMP-parallel
// preload/ray-pack loops (base_parser.cpp:829-945) and PCL/voxel utilities
// (utils.cpp). The TPU compute path is JAX/XLA; this library is the native
// runtime for the host side of the data loader: depth->ray conversion,
// point-cloud ray packs, and voxel downsampling, all OpenMP-parallel and
// exposed through a plain C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Depth image (z-depth) -> per-pixel (distance, world unit direction).
// depth:   [h*w] float32 (already scaled to meters)
// rot:     [9] row-major camera-to-world rotation
// out_dist:[h*w], out_dir: [h*w*3]
void depth_to_rays(const float* depth, int h, int w, float fx, float fy,
                   float cx, float cy, const float* rot, float* out_dist,
                   float* out_dir) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      const float zx = ((float)x + 0.5f - cx) / fx;
      const float zy = ((float)y + 0.5f - cy) / fy;
      const float norm = std::sqrt(zx * zx + zy * zy + 1.0f);
      const float inv = 1.0f / norm;
      const float dx = zx * inv, dy = zy * inv, dz = inv;
      out_dist[i] = depth[i] * norm;
      out_dir[3 * i + 0] = rot[0] * dx + rot[1] * dy + rot[2] * dz;
      out_dir[3 * i + 1] = rot[3] * dx + rot[4] * dy + rot[5] * dz;
      out_dir[3 * i + 2] = rot[6] * dx + rot[7] * dy + rot[8] * dz;
    }
  }
}

// Sensor-frame point cloud -> (distance, world unit direction).
// pts: [n*3]; rot: [9] row-major sensor-to-world rotation.
void points_to_rays(const float* pts, int64_t n, const float* rot,
                    float* out_dist, float* out_dir) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const float d = std::sqrt(px * px + py * py + pz * pz);
    out_dist[i] = d;
    const float inv = d > 1e-9f ? 1.0f / d : 0.0f;
    const float dx = px * inv, dy = py * inv, dz = pz * inv;
    out_dir[3 * i + 0] = rot[0] * dx + rot[1] * dy + rot[2] * dz;
    out_dir[3 * i + 1] = rot[3] * dx + rot[4] * dy + rot[5] * dz;
    out_dir[3 * i + 2] = rot[6] * dx + rot[7] * dy + rot[8] * dz;
  }
}

// Mean-per-voxel downsample. Returns the number of output points
// (<= max_out); out must hold max_out*3 floats.
int64_t voxel_downsample(const float* pts, int64_t n, float voxel, float* out,
                         int64_t max_out) {
  if (voxel <= 0.0f || n == 0) return 0;
  struct Acc {
    double x = 0, y = 0, z = 0;
    int64_t c = 0;
  };
  std::unordered_map<int64_t, Acc> cells;
  cells.reserve((size_t)(n / 4 + 16));
  const double inv = 1.0 / (double)voxel;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t kx = (int64_t)std::floor(pts[3 * i] * inv) + (1 << 20);
    const int64_t ky = (int64_t)std::floor(pts[3 * i + 1] * inv) + (1 << 20);
    const int64_t kz = (int64_t)std::floor(pts[3 * i + 2] * inv) + (1 << 20);
    const int64_t key = (kx << 42) | (ky << 21) | kz;
    Acc& a = cells[key];
    a.x += pts[3 * i];
    a.y += pts[3 * i + 1];
    a.z += pts[3 * i + 2];
    a.c += 1;
  }
  int64_t m = 0;
  for (const auto& kv : cells) {
    if (m >= max_out) break;
    out[3 * m + 0] = (float)(kv.second.x / kv.second.c);
    out[3 * m + 1] = (float)(kv.second.y / kv.second.c);
    out[3 * m + 2] = (float)(kv.second.z / kv.second.c);
    ++m;
  }
  return m;
}

// Quantize world points into a dense bit-packed occupancy grid
// (SubMap::update_octree_as analog; grid: [res*res*(res/32 rounded up)]
// uint32, z packed into bits).
void occupancy_from_points(const float* pts, int64_t n, const float* origin,
                           float map_size, int res, uint32_t* grid) {
  const int zw = (res + 31) / 32;
  const double inv = (double)res / (double)map_size;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double ux = ((double)pts[3 * i] - origin[0]) * inv + res * 0.5;
    const double uy = ((double)pts[3 * i + 1] - origin[1]) * inv + res * 0.5;
    const double uz = ((double)pts[3 * i + 2] - origin[2]) * inv + res * 0.5;
    const int64_t vx = (int64_t)std::floor(ux);
    const int64_t vy = (int64_t)std::floor(uy);
    const int64_t vz = (int64_t)std::floor(uz);
    if (vx < 0 || vy < 0 || vz < 0 || vx >= res || vy >= res || vz >= res)
      continue;
    uint32_t* word = &grid[(vx * res + vy) * zw + (vz >> 5)];
    const uint32_t bit = 1u << (vz & 31);
#pragma omp atomic
    *word |= bit;
  }
}

int native_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
