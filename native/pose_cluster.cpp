// Native runtime components for foundationpose_tpu.
//
// Greedy first-fit pose clustering under symmetry — the TPU-framework
// equivalent of the reference's C++ module
// (mycpp/src/app/pybind_api.cpp:24-68, mycpp/src/Utils.cpp:21-26).
// Exposed through a plain C ABI and loaded from Python via ctypes
// (no pybind11 in this environment).
//
// Poses are row-major 4x4 float32. Returns the number of kept poses and
// writes their indices (into the input array) to out_indices.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Geodesic angle between two rotations stored as row-major 4x4 poses.
inline float rotation_geodesic(const float* a, const float* b) {
  // trace(Ra * Rb^T) = sum_ij Ra[i][j] * Rb[i][j]
  float tr = 0.f;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) tr += a[i * 4 + j] * b[i * 4 + j];
  float c = (tr - 1.f) / 2.f;
  c = c > 1.f ? 1.f : (c < -1.f ? -1.f : c);
  return std::acos(c);
}

// R_out = R_pose * R_sym (rotation blocks of row-major 4x4s).
inline void rot_mul(const float* pose, const float* sym, float* out) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      float s = 0.f;
      for (int k = 0; k < 3; ++k) s += pose[i * 4 + k] * sym[k * 4 + j];
      out[i * 4 + j] = s;
    }
}

}  // namespace

extern "C" {

int cluster_poses(float angle_diff_deg, float dist_diff, const float* poses,
                  int n, const float* symmetry_tfs, int n_sym,
                  int* out_indices) {
  if (n <= 0) return 0;
  const float radian_thres = angle_diff_deg / 180.f * static_cast<float>(M_PI);

  // Precompute symmetry orbits of every candidate rotation: n * n_sym 4x4s.
  std::vector<float> orbit(static_cast<size_t>(n) * n_sym * 16, 0.f);
  for (int i = 0; i < n; ++i)
    for (int s = 0; s < n_sym; ++s)
      rot_mul(poses + i * 16, symmetry_tfs + s * 16,
              orbit.data() + (static_cast<size_t>(i) * n_sym + s) * 16);

  std::vector<int> kept;
  kept.reserve(n);
  kept.push_back(0);
  for (int i = 1; i < n; ++i) {
    const float* p = poses + i * 16;
    bool isnew = true;
    for (int k : kept) {
      const float* q = poses + k * 16;
      const float dx = p[3] - q[3];
      const float dy = p[7] - q[7];
      const float dz = p[11] - q[11];
      if (std::sqrt(dx * dx + dy * dy + dz * dz) >= dist_diff) continue;
      for (int s = 0; s < n_sym; ++s) {
        const float* r =
            orbit.data() + (static_cast<size_t>(i) * n_sym + s) * 16;
        if (rotation_geodesic(r, q) < radian_thres) {
          isnew = false;
          break;
        }
      }
      if (!isnew) break;
    }
    if (isnew) kept.push_back(i);
  }
  for (size_t i = 0; i < kept.size(); ++i) out_indices[i] = kept[i];
  return static_cast<int>(kept.size());
}

}  // extern "C"
