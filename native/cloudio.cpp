// Native point-cloud runtime: binary PLY I/O, voxel-grid downsampling,
// grid-accelerated radius outlier removal.
//
// The reference's runtime around its numeric core is C++ (file I/O and
// cloud plumbing in src/Sfm.cpp:70-81,1246-1303; PCL filters at
// src/Sfm.cpp:1323-1345). This module is the framework's native equivalent
// for the HOST side of those paths — the operations that are irregular
// (hash grids) or I/O-bound (million-point cloud files) where Python/numpy
// loops dominate wall-clock. The TPU compute path stays JAX/Pallas; these
// are exposed to Python via ctypes (build: native/Makefile).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Binary little-endian PLY writer. colors may be nullptr.
// Returns 0 on success.
int write_ply_binary(const char* path, const float* points,
                     const uint8_t* colors, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  std::string header = "ply\nformat binary_little_endian 1.0\n";
  header += "element vertex " + std::to_string(n) + "\n";
  header += "property float x\nproperty float y\nproperty float z\n";
  if (colors)
    header +=
        "property uchar red\nproperty uchar green\nproperty uchar blue\n";
  header += "end_header\n";
  if (fwrite(header.data(), 1, header.size(), f) != header.size()) {
    fclose(f);
    return 2;
  }
  for (int64_t i = 0; i < n; i++) {
    if (fwrite(points + 3 * i, sizeof(float), 3, f) != 3) {
      fclose(f);
      return 2;
    }
    if (colors && fwrite(colors + 3 * i, 1, 3, f) != 3) {
      fclose(f);
      return 2;
    }
  }
  fclose(f);
  return 0;
}

// Count vertices of a binary or ascii PLY (for buffer allocation).
int64_t ply_vertex_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1;
  while (fgets(line, sizeof(line), f)) {
    if (sscanf(line, "element vertex %lld", (long long*)&n) == 1) continue;
    if (strncmp(line, "end_header", 10) == 0) break;
  }
  fclose(f);
  return n;
}

// Read a binary_little_endian PLY with x y z [r g b].
// points: preallocated n*3 floats; colors: preallocated n*3 bytes or null.
// Returns number of vertices read, or -1 on error.
int64_t read_ply_binary(const char* path, float* points, uint8_t* colors,
                        int64_t n_max) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1;
  bool binary = false, has_color = false;
  int n_props = 0;
  while (fgets(line, sizeof(line), f)) {
    if (strstr(line, "binary_little_endian")) binary = true;
    long long tmp;
    if (sscanf(line, "element vertex %lld", &tmp) == 1) n = tmp;
    if (strncmp(line, "property", 8) == 0) {
      n_props++;
      if (strstr(line, "red")) has_color = true;
    }
    if (strncmp(line, "end_header", 10) == 0) break;
  }
  if (n < 0 || !binary) {
    fclose(f);
    return -1;
  }
  if (n > n_max) n = n_max;
  for (int64_t i = 0; i < n; i++) {
    if (fread(points + 3 * i, sizeof(float), 3, f) != 3) {
      fclose(f);
      return i;
    }
    if (has_color) {
      uint8_t rgb[3];
      if (fread(rgb, 1, 3, f) != 3) {
        fclose(f);
        return i;
      }
      if (colors) memcpy(colors + 3 * i, rgb, 3);
    }
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
struct VoxelKey {
  int64_t x, y, z;
  bool operator==(const VoxelKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct VoxelHash {
  size_t operator()(const VoxelKey& k) const {
    // Large-prime spatial hash.
    return size_t(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

// Voxel-grid downsample: first point per voxel wins (matches the numpy
// unique-by-voxel behavior in mvs/fusion.py). out_idx gets the kept input
// indices; returns the kept count.
int64_t voxel_downsample_idx(const float* points, int64_t n, float voxel,
                             int64_t* out_idx) {
  std::unordered_map<VoxelKey, int64_t, VoxelHash> seen;
  seen.reserve(size_t(n));
  int64_t kept = 0;
  const float inv = 1.0f / voxel;
  for (int64_t i = 0; i < n; i++) {
    VoxelKey k{(int64_t)std::floor(points[3 * i] * inv),
               (int64_t)std::floor(points[3 * i + 1] * inv),
               (int64_t)std::floor(points[3 * i + 2] * inv)};
    auto it = seen.find(k);
    if (it == seen.end()) {
      seen.emplace(k, i);
      out_idx[kept++] = i;
    }
  }
  return kept;
}

// Grid-accelerated radius-outlier removal: neighbor count within `radius`
// for each point (excluding itself) using a voxel hash of cell size
// `radius` (27-cell probe). O(N * avg_bucket) vs the O(N^2) dense sweep.
// counts: preallocated n int32.
void radius_neighbor_counts(const float* points, int64_t n, float radius,
                            int32_t* counts) {
  std::unordered_map<VoxelKey, std::vector<int32_t>, VoxelHash> grid;
  grid.reserve(size_t(n));
  const float inv = 1.0f / radius;
  for (int64_t i = 0; i < n; i++) {
    VoxelKey k{(int64_t)std::floor(points[3 * i] * inv),
               (int64_t)std::floor(points[3 * i + 1] * inv),
               (int64_t)std::floor(points[3 * i + 2] * inv)};
    grid[k].push_back((int32_t)i);
  }
  const float r2 = radius * radius;
  for (int64_t i = 0; i < n; i++) {
    const float px = points[3 * i], py = points[3 * i + 1],
                pz = points[3 * i + 2];
    int64_t cx = (int64_t)std::floor(px * inv);
    int64_t cy = (int64_t)std::floor(py * inv);
    int64_t cz = (int64_t)std::floor(pz * inv);
    int32_t cnt = 0;
    for (int64_t dx = -1; dx <= 1; dx++)
      for (int64_t dy = -1; dy <= 1; dy++)
        for (int64_t dz = -1; dz <= 1; dz++) {
          auto it = grid.find(VoxelKey{cx + dx, cy + dy, cz + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            if (j == i) continue;
            const float ddx = points[3 * j] - px;
            const float ddy = points[3 * j + 1] - py;
            const float ddz = points[3 * j + 2] - pz;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) cnt++;
          }
        }
    counts[i] = cnt;
  }
}

}  // extern "C"
