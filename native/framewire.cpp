// Native frame wire-format conversion for the ingest path.
//
// The pipeline's host responsibilities are deliberately tiny (wire conversion
// + dispatch; see bundle/pipeline.py), but they sit on the real-time ingest
// path: every frame is clipped/quantized to the sensor wire format (uint16
// mm depth + uint8 color), and with `integrate_filtered_depth` a bilateral
// filter runs at the wire level so ring, FrameStore and every device program
// share identical bytes. numpy does the conversion in ~2-3 ms/frame and the
// 25-tap bilateral in ~20 ms/frame at 640x480 — this OpenMP C++ replaces
// both (ctypes-bound via bundlefusion_tpu/io/native.py, numpy fallback kept).
//
// Reference analog: CUDAImageManager/CUDAImageUtil.cu run the equivalent
// conversions on the capture GPU (SURVEY.md §2.1 "Frame manager"); offline
// on TPU the natural home for them is the host ingest thread.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// float depth (meters) + float color ([0,1], interleaved RGB) -> wire.
// depth: clip to [0, 65] m, round to mm; color: clip to [0,1], round to u8.
void frame_to_wire(const float* depth, const float* color, long h, long w,
                   uint16_t* d16, uint8_t* c8) {
  // two flat loops (depth over n, color over 3n) instead of one interleaved
  // pixel loop: each vectorizes to straight-line AVX-512 (the build passes
  // -march=native), which matters on this single-core host
  const long n = h * w;
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; ++i) {
    float d = depth[i];
    d = d < 0.f ? 0.f : (d > 65.f ? 65.f : d);
    d16[i] = (uint16_t)(d * 1000.f + 0.5f);
  }
  const long m = 3 * n;
#pragma omp parallel for schedule(static)
  for (long i = 0; i < m; ++i) {
    float v = color[i];
    v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
    c8[i] = (uint8_t)(v * 255.f + 0.5f);
  }
}

// v2 wire: float depth + float RGB -> uint16 mm depth + full-res uint8 LUMA
// + HALF-res uint8 RGB (2x2 box mean). The bundling half of the pipeline
// consumes only intensity at full resolution (SIFT + photometric cache) and
// the fusion half consumes RGB only for voxel coloring — shipping Y full-res
// and RGB half-res cuts the host->device wire ~24% with no effect on
// tracking. h and w must be even.
void frame_to_wire2(const float* depth, const float* color, long h, long w,
                    float d_min, float d_max, uint16_t* d16, uint8_t* y8,
                    uint8_t* c8h) {
  const long n = h * w;
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; ++i) {
    float d = depth[i];
    // sensor-range gate (s_sensorDepthMin/Max): out-of-range depth is
    // INVALID (0), exactly as CUDAImageManager zeroes it at capture
    if (d < d_min || d > d_max) d = 0.f;
    d16[i] = (uint16_t)(d * 1000.f + 0.5f);
  }
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; ++i) {
    const float* c = color + 3 * i;
    float v = 0.299f * c[0] + 0.587f * c[1] + 0.114f * c[2];
    v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
    y8[i] = (uint8_t)(v * 255.f + 0.5f);
  }
  const long h2 = h / 2, w2 = w / 2;
#pragma omp parallel for schedule(static)
  for (long y = 0; y < h2; ++y) {
    const float* r0 = color + (2 * y) * w * 3;
    const float* r1 = color + (2 * y + 1) * w * 3;
    uint8_t* out = c8h + y * w2 * 3;
    for (long x = 0; x < w2; ++x) {
      const float* a = r0 + 6 * x;
      const float* b = r1 + 6 * x;
      for (int ch = 0; ch < 3; ++ch) {
        float v = 0.25f * (a[ch] + a[3 + ch] + b[ch] + b[3 + ch]);
        v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
        out[3 * x + ch] = (uint8_t)(v * 255.f + 0.5f);
      }
    }
  }
}

// 12-bit depth packing for the transfer wire: 2 pixels -> 3 bytes. Valid
// whenever the sensor depth ceiling fits 12 bits of mm (<= 4.095 m — the
// reference's s_sensorDepthMax default is 4.0). n must be even.
void pack_depth12(const uint16_t* d16, long n, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n / 2; ++i) {
    const uint16_t p0 = d16[2 * i], p1 = d16[2 * i + 1];
    out[3 * i] = (uint8_t)(p0 & 0xFF);
    out[3 * i + 1] = (uint8_t)((p0 >> 8) | ((p1 & 0xF) << 4));
    out[3 * i + 2] = (uint8_t)(p1 >> 4);
  }
}

// 5x5 bilateral filter on wire-format depth (uint16 mm), zero-aware:
// invalid (0) pixels stay invalid and contribute nothing. Gaussian spatial
// weight (sigma_d in pixels) x gaussian range weight (sigma_r in meters),
// matching ops/preprocess.bilateral_filter_depth semantics at radius 2.
void bilateral_wire_u16(const uint16_t* in, long h, long w, float sigma_d,
                        float sigma_r, uint16_t* out) {
  const int radius = 2;
  const float inv_2sd2 = 1.f / (2.f * sigma_d * sigma_d);
  const float inv_2sr2 = 1.f / (2.f * sigma_r * sigma_r);
  // spatial weights are a small constant table
  float ws[2 * radius + 1][2 * radius + 1];
  for (int dy = -radius; dy <= radius; ++dy)
    for (int dx = -radius; dx <= radius; ++dx)
      ws[dy + radius][dx + radius] =
          std::exp(-(float)(dy * dy + dx * dx) * inv_2sd2);
  // range weights tabulated on the integer mm difference: the wire is mm-
  // quantized, so exp(-(diff_m^2)/(2 sr^2)) takes ~4096 distinct values —
  // one table lookup per tap replaces the expf that dominates a scalar loop
  const int kLut = 4096;  // covers |diff| < 4.096 m; beyond that weight ~ 0
  static thread_local float lut[kLut];
  static thread_local float lut_key = -1.f;
  if (lut_key != inv_2sr2) {
    for (int i = 0; i < kLut; ++i) {
      const float dm = i * 1e-3f;
      lut[i] = std::exp(-dm * dm * inv_2sr2);
    }
    lut_key = inv_2sr2;
  }
#pragma omp parallel for schedule(static)
  for (long y = 0; y < h; ++y) {
    for (long x = 0; x < w; ++x) {
      const int dmm = in[y * w + x];
      if (dmm == 0) {
        out[y * w + x] = 0;
        continue;
      }
      float acc = 0.f, wacc = 0.f;
      for (int dy = -radius; dy <= radius; ++dy) {
        const long yy = y + dy;
        if (yy < 0 || yy >= h) continue;
        const uint16_t* row = in + yy * w;
        const float* wrow = ws[dy + radius];
        for (int dx = -radius; dx <= radius; ++dx) {
          const long xx = x + dx;
          if (xx < 0 || xx >= w) continue;
          const int nmm = row[xx];
          if (nmm == 0) continue;
          int diff = nmm - dmm;
          if (diff < 0) diff = -diff;
          const float wgt =
              wrow[dx + radius] * (diff < kLut ? lut[diff] : 0.f);
          acc += wgt * (nmm * 1e-3f);
          wacc += wgt;
        }
      }
      const float f = wacc > 0.f ? acc / wacc : 0.f;
      float mm = f * 1000.f + 0.5f;
      out[y * w + x] = (uint16_t)(mm < 0.f ? 0.f : (mm > 65535.f ? 65535.f : mm));
    }
  }
}

}  // extern "C"
