// lvv_io — native host-side IO runtime for the TPU framework.
//
// The reference's native layer is CUDA compute (pcdet/ops/*); on TPU the
// compute path is Pallas/XLA, so the native niche is the HOST runtime: fast
// point-cloud decode, fp16 BEV encode/decode, and a reference voxelizer for
// JAX-free tooling. Exposed as a C ABI consumed via ctypes
// (lvv_tpu/native/__init__.py).
//
// Build: make -C native   (produces native/liblvv_io.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Decode a nuScenes LIDAR_TOP .pcd.bin (float32 N x in_dim; trailing
// ring-index channel dropped when out_dim < in_dim — reference
// precompute_bev_features.py:152-170 trims N x 5 -> N x 4).
// Writes up to max_points rows into `out` (row-major [max_points, out_dim],
// zero-padded). Returns the number of valid rows, or -1 on IO error.
int lvv_load_pcd(const char* path, float* out, int max_points, int in_dim,
                 int out_dim) {
  if (out_dim > in_dim || out_dim <= 0 || in_dim <= 0) return -1;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  long n_rows = bytes / (long)(in_dim * sizeof(float));
  int n = (int)std::min<long>(n_rows, max_points);
  std::vector<float> row(in_dim);
  std::memset(out, 0, sizeof(float) * (size_t)max_points * out_dim);
  for (int i = 0; i < n; ++i) {
    if (fread(row.data(), sizeof(float), in_dim, f) != (size_t)in_dim) {
      n = i;
      break;
    }
    std::memcpy(out + (size_t)i * out_dim, row.data(),
                sizeof(float) * out_dim);
  }
  fclose(f);
  return n;
}

// float32 -> float16 (IEEE 754 round-to-nearest-even) buffer conversion,
// for writing the L2->L4 fp16 BEV .npy payloads without numpy overhead.
static inline uint16_t f32_to_f16(float value) {
  uint32_t x;
  std::memcpy(&x, &value, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xff) - 127 + 15;
  uint32_t mant = x & 0x7fffffu;
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint32_t half = (mant >> shift);
    uint32_t rem = mant & ((1u << shift) - 1);
    if (rem > (1u << (shift - 1)) ||
        (rem == (1u << (shift - 1)) && (half & 1)))
      half++;
    return (uint16_t)(sign | half);
  }
  if (exp >= 0x1f) return (uint16_t)(sign | 0x7c00u);  // inf/overflow
  uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1fffu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
  return (uint16_t)(sign | half);
}

void lvv_f32_to_f16(const float* in, uint16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = f32_to_f16(in[i]);
}

// Host reference voxelizer (mean VFE): points [n, dim] -> per-voxel mean
// features + (z, y, x) coords, first-come order by linearized id hash map.
// Returns the number of voxels (capped at max_voxels). JAX-free tooling &
// oracle for the TPU voxelizer.
int lvv_voxelize_mean(const float* points, int n, int dim,
                      const float* range /*x0,y0,z0,x1,y1,z1*/,
                      const float* voxel_size /*vx,vy,vz*/, int max_voxels,
                      float* out_feats /*[max_voxels, dim]*/,
                      int32_t* out_coords /*[max_voxels, 3]*/,
                      int32_t* out_counts /*[max_voxels]*/) {
  const int nx = (int)((range[3] - range[0]) / voxel_size[0] + 0.5f);
  const int ny = (int)((range[4] - range[1]) / voxel_size[1] + 0.5f);
  const int nz = (int)((range[5] - range[2]) / voxel_size[2] + 0.5f);
  std::unordered_map<int64_t, int> slot_of;
  slot_of.reserve((size_t)std::min(n, max_voxels) * 2);
  std::memset(out_feats, 0, sizeof(float) * (size_t)max_voxels * dim);
  std::memset(out_counts, 0, sizeof(int32_t) * (size_t)max_voxels);
  int n_voxels = 0;
  for (int i = 0; i < n; ++i) {
    const float* p = points + (size_t)i * dim;
    int xi = (int)std::floor((p[0] - range[0]) / voxel_size[0]);
    int yi = (int)std::floor((p[1] - range[1]) / voxel_size[1]);
    int zi = (int)std::floor((p[2] - range[2]) / voxel_size[2]);
    if (xi < 0 || xi >= nx || yi < 0 || yi >= ny || zi < 0 || zi >= nz)
      continue;
    int64_t id = ((int64_t)zi * ny + yi) * nx + xi;
    auto it = slot_of.find(id);
    int slot;
    if (it == slot_of.end()) {
      if (n_voxels >= max_voxels) continue;
      slot = n_voxels++;
      slot_of.emplace(id, slot);
      out_coords[(size_t)slot * 3 + 0] = zi;
      out_coords[(size_t)slot * 3 + 1] = yi;
      out_coords[(size_t)slot * 3 + 2] = xi;
    } else {
      slot = it->second;
    }
    float* acc = out_feats + (size_t)slot * dim;
    for (int d = 0; d < dim; ++d) acc[d] += p[d];
    out_counts[slot]++;
  }
  for (int s = 0; s < n_voxels; ++s) {
    float inv = 1.0f / (float)std::max(out_counts[s], 1);
    float* acc = out_feats + (size_t)s * dim;
    for (int d = 0; d < dim; ++d) acc[d] *= inv;
  }
  return n_voxels;
}

}  // extern "C"
