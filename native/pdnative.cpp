// pdnative: host-side data-preparation kernels for PlaneDepth-TPU.
//
// The reference's input pipeline leans on torch/PIL C kernels inside 12
// DataLoader worker processes (reference mono_dataset.py, trainer.py:140).
// This library provides the equivalent native hot paths for OUR loader —
// bicubic resize (bit-matching torch align_corners=True, A=-0.75), the
// fused photometric augmentation, nearest depth resize, and the velodyne
// point projection — callable from Python via ctypes (see
// planedepth_tpu/data/native.py).
//
// Build: python scripts/build_native.py   (g++ -O3 -march=native -shared)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kA = -0.75f;  // torch bicubic coefficient

inline float cubic_weight(float d) {
  d = std::fabs(d);
  if (d <= 1.0f) return ((kA + 2.0f) * d - (kA + 3.0f)) * d * d + 1.0f;
  if (d < 2.0f) return (((d - 5.0f) * d + 8.0f) * d - 4.0f) * kA;
  return 0.0f;
}

struct Taps {
  // 4 clamped source indices + weights per output position
  std::vector<int> idx;    // [s_out * 4]
  std::vector<float> w;    // [s_out * 4]
};

Taps make_taps(int s_in, int s_out) {
  Taps t;
  t.idx.resize(static_cast<size_t>(s_out) * 4);
  t.w.resize(static_cast<size_t>(s_out) * 4);
  const double scale = s_out == 1 ? 0.0
                                  : static_cast<double>(s_in - 1) / (s_out - 1);
  for (int o = 0; o < s_out; ++o) {
    const double src = o * scale;
    const int i0 = static_cast<int>(std::floor(src));
    for (int k = 0; k < 4; ++k) {
      const int tap = i0 - 1 + k;
      t.idx[o * 4 + k] = std::clamp(tap, 0, s_in - 1);
      t.w[o * 4 + k] = cubic_weight(static_cast<float>(src - tap));
    }
  }
  return t;
}

}  // namespace

extern "C" {

// Bicubic align_corners=True resize, HWC float32.
// Matches torch F.interpolate(..., mode='bicubic', align_corners=True)
// modulo fp accumulation order.
void pd_resize_bicubic(const float* src, int h, int w, int c, float* dst,
                       int ho, int wo) {
  const Taps ty = make_taps(h, ho);
  const Taps tx = make_taps(w, wo);
  // pass 1: vertical into a (ho, w, c) temp
  std::vector<float> tmp(static_cast<size_t>(ho) * w * c);
  for (int oy = 0; oy < ho; ++oy) {
    const int* iy = &ty.idx[oy * 4];
    const float* wy = &ty.w[oy * 4];
    float* out_row = &tmp[static_cast<size_t>(oy) * w * c];
    std::memset(out_row, 0, sizeof(float) * w * c);
    for (int k = 0; k < 4; ++k) {
      const float* in_row = src + static_cast<size_t>(iy[k]) * w * c;
      const float wk = wy[k];
      for (int i = 0; i < w * c; ++i) out_row[i] += wk * in_row[i];
    }
  }
  // pass 2: horizontal into dst (ho, wo, c)
  for (int oy = 0; oy < ho; ++oy) {
    const float* in_row = &tmp[static_cast<size_t>(oy) * w * c];
    float* out_row = dst + static_cast<size_t>(oy) * wo * c;
    for (int ox = 0; ox < wo; ++ox) {
      const int* ix = &tx.idx[ox * 4];
      const float* wx = &tx.w[ox * 4];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < 4; ++k) acc += wx[k] * in_row[ix[k] * c + ch];
        out_row[ox * c + ch] = acc;
      }
    }
  }
}

// Nearest resize with torch 'nearest' semantics: src = floor(dst * s/d).
void pd_resize_nearest(const float* src, int h, int w, int c, float* dst,
                       int ho, int wo) {
  for (int oy = 0; oy < ho; ++oy) {
    const int iy = std::min(static_cast<int>(oy * (static_cast<double>(h) / ho)),
                            h - 1);
    for (int ox = 0; ox < wo; ++ox) {
      const int ix = std::min(
          static_cast<int>(ox * (static_cast<double>(w) / wo)), w - 1);
      std::memcpy(dst + (static_cast<size_t>(oy) * wo + ox) * c,
                  src + (static_cast<size_t>(iy) * w + ix) * c,
                  sizeof(float) * c);
    }
  }
}

// Fused photometric aug in-place on HWC float32 in [0,1]:
//   x = min(1, min(1, brightness * x^gamma) * channel_factor[c])
// (reference pair_transforms.py:86-141 applied in sequence; clip after the
// brightness and per-channel steps like the reference.)
void pd_photometric_aug(float* img, int h, int w, int c, float gamma,
                        float brightness, const float* channel_factors) {
  const size_t n = static_cast<size_t>(h) * w;
  const bool do_gamma = gamma != 1.0f;
  for (size_t i = 0; i < n; ++i) {
    float* px = img + i * c;
    for (int ch = 0; ch < c; ++ch) {
      float v = px[ch];
      if (do_gamma) v = std::pow(v, gamma);
      v = std::min(1.0f, v * brightness);
      v = std::min(1.0f, v * channel_factors[ch]);
      px[ch] = v;
    }
  }
}

// Project velodyne points to a sparse min-depth map.
// points: (n, 4) homogeneous [x, y, z, 1]; P: 3x4 row-major projection.
// Matches kitti_utils.generate_depth_map semantics (round-1 indexing,
// min-depth duplicate resolution, negative clamped to 0).
void pd_velodyne_to_depth(const float* points, int n, const double* P, int h,
                          int w, int use_x_as_depth, float* depth) {
  const float inf = std::numeric_limits<float>::infinity();
  std::fill(depth, depth + static_cast<size_t>(h) * w, inf);
  for (int i = 0; i < n; ++i) {
    const float* p = points + static_cast<size_t>(i) * 4;
    if (p[0] < 0.0f) continue;  // behind image plane (approximation)
    const double x = P[0] * p[0] + P[1] * p[1] + P[2] * p[2] + P[3];
    const double y = P[4] * p[0] + P[5] * p[1] + P[6] * p[2] + P[7];
    const double z = P[8] * p[0] + P[9] * p[1] + P[10] * p[2] + P[11];
    const double u = std::round(x / z) - 1.0;
    const double v = std::round(y / z) - 1.0;
    if (u < 0 || v < 0 || u >= w || v >= h) continue;
    const float d = use_x_as_depth ? p[0] : static_cast<float>(z);
    float& cell = depth[static_cast<size_t>(v) * w + static_cast<size_t>(u)];
    cell = std::min(cell, d);
  }
  const size_t total = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < total; ++i) {
    if (!std::isfinite(depth[i]) || depth[i] < 0.0f) depth[i] = 0.0f;
  }
}

// uint8 HWC -> float32 HWC in [0,1] (decode post-processing).
void pd_u8_to_f32(const uint8_t* src, int n, float* dst) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

int pd_version() { return 1; }

}  // extern "C"
