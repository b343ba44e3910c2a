// pnnp_tpu native host loader: fused raw correction + Bayer pack + crop.
//
// The per-example host work the Python datasets do on 12-Mpix frames
// (dark-shading subtract, black-level normalize, RGGB pack, multi-crop with
// geometric aug — reference: data_process/real_datasets.py __getitem__)
// allocates several full-frame temporaries per sample in NumPy. This C++
// path fuses the whole chain into one pass per output crop, reading only the
// pixels each crop needs, with a worker pool across crops. Exposed as a C
// ABI for ctypes (pnnp_tpu/data/native.py).
//
// Layouts: mosaics are row-major [H, W] float32 or uint16; packed outputs are
// channel-last RGBG [h, w, 4] (R=raw[0::2,0::2], G1=raw[0::2,1::2],
// B=raw[1::2,1::2], G2=raw[1::2,0::2]).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kHalfClip = 2;  // reference: data_process/process.py:19

inline float normalize_px(float v, float bl_c, float inv_span) {
  return (v - bl_c) * inv_span;
}

// Fetch one packed RGBG pixel (ph, pw, c) from the mosaic with optional
// dark-shading subtraction.
inline float fetch(const float* raw, const float* ds, int W, int ph, int pw, int c) {
  // channel -> (dy, dx) within the 2x2 cell, RGGB pattern, RGBG order
  static const int dy[4] = {0, 0, 1, 1};
  static const int dx[4] = {0, 1, 1, 0};
  const int y = 2 * ph + dy[c];
  const int x = 2 * pw + dx[c];
  float v = raw[y * W + x];
  if (ds) v -= ds[y * W + x];
  return v;
}

}  // namespace

extern "C" {

// Pack a full mosaic [H, W] to normalized RGBG [H/2, W/2, 4].
void pnnp_pack_full(const float* raw, int H, int W, const float* darkshading,
                    float wp, float bl, const float* bias, int clip01,
                    float* out) {
  const int h = H / 2, w = W / 2;
  float bl_c[4], inv_span[4];
  for (int c = 0; c < 4; ++c) {
    bl_c[c] = bl + (bias ? bias[c] : 0.f);
    inv_span[c] = 1.f / (wp - bl_c[c]);
  }
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, 8);
  std::vector<std::thread> pool;
  std::atomic<int> next_row{0};
  auto worker = [&]() {
    int ph;
    while ((ph = next_row.fetch_add(1)) < h) {
      float* row_out = out + (size_t)ph * w * 4;
      for (int pw = 0; pw < w; ++pw) {
        for (int c = 0; c < 4; ++c) {
          float v = normalize_px(fetch(raw, darkshading, W, ph, pw, c), bl_c[c],
                                 inv_span[c]);
          if (clip01) v = std::min(std::max(v, 0.f), 1.f);
          row_out[pw * 4 + c] = v;
        }
      }
    }
  };
  for (unsigned t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
}

// Extract n crops of size p x p (packed coords) with per-crop augmentation
// modes {0: id, 1: rot180, 2: flip-W, 3: both} directly from the mosaic.
// out: [n, p, p, 4]. ratio_mul multiplies after normalize (0 disables).
void pnnp_pack_crops(const float* raw, int H, int W, const float* darkshading,
                     float wp, float bl, const float* bias,
                     const int32_t* hs, const int32_t* ws, const int32_t* aug,
                     int n, int p, int clip_mode, float ratio_mul, float* out) {
  (void)H;
  float bl_c[4], inv_span[4];
  for (int c = 0; c < 4; ++c) {
    bl_c[c] = bl + (bias ? bias[c] : 0.f);
    inv_span[c] = 1.f / (wp - bl_c[c]);
  }
  const float lo = (clip_mode == kHalfClip)
                       ? -std::numeric_limits<float>::infinity()
                       : 0.f;
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, (unsigned)n);
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      const int h0 = hs[i], w0 = ws[i], mode = aug[i];
      const bool rot = mode % 2, flip = mode / 2;
      float* dst = out + (size_t)i * p * p * 4;
      for (int y = 0; y < p; ++y) {
        for (int x = 0; x < p; ++x) {
          // aug maps output (y, x) to source (sy, sx) within the crop:
          // rot180 first, then W-flip (matches reference data_aug order).
          int sy = y, sx = x;
          if (rot) { sy = p - 1 - sy; sx = p - 1 - sx; }
          if (flip) { sx = p - 1 - sx; }
          float* px = dst + ((size_t)y * p + x) * 4;
          for (int c = 0; c < 4; ++c) {
            float v = normalize_px(
                fetch(raw, darkshading, W, h0 + sy, w0 + sx, c), bl_c[c],
                inv_span[c]);
            if (ratio_mul != 0.f) v *= ratio_mul;
            if (clip_mode) v = std::min(std::max(v, lo), 1.f);
            px[c] = v;
          }
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (unsigned t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
}

// uint16 mosaic -> float32 (decode edge for binary raw dumps).
void pnnp_u16_to_f32(const uint16_t* src, int64_t n, float* dst) {
  for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i];
}

// Pack a full mosaic [H, W] directly into the 4x4-superpixel (s2d) layout
// consumed by the TPU fast path: out [H/4, W/4, 16] where channel
// (2*aH + aW)*4 + c holds packed-RGBG channel c of sub-position (aH, aW).
// Equivalent to s2d(pack) but emitted in one pass at load time so the
// device never touches the relayout-hostile 4-lane layout.
void pnnp_pack_s2d(const float* raw, int H, int W, const float* darkshading,
                   float wp, float bl, const float* bias, int clip01,
                   float* out) {
  const int hs = H / 4, ws = W / 4;
  float bl_c[4], inv_span[4];
  for (int c = 0; c < 4; ++c) {
    bl_c[c] = bl + (bias ? bias[c] : 0.f);
    inv_span[c] = 1.f / (wp - bl_c[c]);
  }
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, 8);
  std::vector<std::thread> pool;
  std::atomic<int> next_row{0};
  auto worker = [&]() {
    int i;
    while ((i = next_row.fetch_add(1)) < hs) {
      float* row_out = out + (size_t)i * ws * 16;
      for (int j = 0; j < ws; ++j) {
        for (int ah = 0; ah < 2; ++ah) {
          for (int aw = 0; aw < 2; ++aw) {
            for (int c = 0; c < 4; ++c) {
              float v = normalize_px(
                  fetch(raw, darkshading, W, 2 * i + ah, 2 * j + aw, c),
                  bl_c[c], inv_span[c]);
              if (clip01) v = std::min(std::max(v, 0.f), 1.f);
              row_out[j * 16 + (2 * ah + aw) * 4 + c] = v;
            }
          }
        }
      }
    }
  };
  for (unsigned t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
}

}  // extern "C"
