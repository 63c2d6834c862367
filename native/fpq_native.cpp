// fpq_native — host-side native kernels for fpqvar_tpu.
//
// TPU-side compute lives in Pallas (fpqvar_tpu/ops/pallas); this library
// covers the host-side hot paths, playing the role the quant_cuda extension
// (/root/reference/quant/quant_kernel.cu) plays for the reference's
// CPU/GPU tools:
//
//   * fpq_snap          — nearest-grid snap over a flat f32 array
//                         (binary search over grid midpoints; ties snap to
//                         the larger value, matching quant_kernel.cu:31's
//                         `<=` scan semantics)
//   * fpq_encode        — nearest-grid code indices (for packing)
//   * fpq_pack_rows     — row-split nibble packing (two 4-bit codes/byte,
//                         layout documented in fpqvar_tpu/ops/packing.py)
//   * fpq_images_to_u8  — NCHW float[0,1] -> NHWC uint8 image conversion
//                         (the 50k-image eval writer's inner loop)
//
// Multithreaded with std::thread; no external dependencies.  Built by
// native/Makefile into libfpq_native.so and loaded via ctypes
// (fpqvar_tpu/utils/native.py) with a numpy fallback when absent.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

template <typename F>
void parallel_for(int64_t n, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(1, n / 65536));
  if (nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// index of nearest grid value; midpoint ties -> larger value.
// == searchsorted(mids, v, side="right"): the count of midpoints <= v.
inline int nearest_idx(float v, const float* mids, int n_mids) {
  return static_cast<int>(std::upper_bound(mids, mids + n_mids, v) - mids);
}

}  // namespace

extern "C" {

// x[n] -> out[n] snapped to the gn sorted grid values.
void fpq_snap(const float* x, int64_t n, const float* grid, int gn,
              float* out) {
  std::vector<float> mids(gn > 1 ? gn - 1 : 1);
  for (int i = 0; i + 1 < gn; ++i) mids[i] = 0.5f * (grid[i] + grid[i + 1]);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      out[i] = grid[nearest_idx(x[i], mids.data(), gn - 1)];
  });
}

// x[n] -> codes[n] (int32 indices into the sorted grid).
void fpq_encode(const float* x, int64_t n, const float* grid, int gn,
                int32_t* codes) {
  std::vector<float> mids(gn > 1 ? gn - 1 : 1);
  for (int i = 0; i + 1 < gn; ++i) mids[i] = 0.5f * (grid[i] + grid[i + 1]);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      codes[i] = nearest_idx(x[i], mids.data(), gn - 1);
  });
}

// codes [rows, cols] int32 (rows % 128 == 0) -> bytes [rows/2, cols]:
// within each 128-row tile, byte row r = code[r] | code[r+64] << 4.
void fpq_pack_rows(const int32_t* codes, int64_t rows, int64_t cols,
                   int8_t* out) {
  int64_t tiles = rows / 128;
  parallel_for(tiles * 64 * cols, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t c = i % cols;
      int64_t rr = i / cols;         // 0 .. tiles*64
      int64_t tile = rr / 64, r = rr % 64;
      const int32_t* base = codes + (tile * 128) * cols;
      int v = (base[r * cols + c] & 0xF) |
              ((base[(r + 64) * cols + c] & 0xF) << 4);
      out[(tile * 64 + r) * cols + c] = static_cast<int8_t>(v);
    }
  });
}

// imgs [B, 3, H, W] float in [0,1] -> out [B, H, W, 3] uint8
void fpq_images_to_u8(const float* imgs, int64_t b, int64_t h, int64_t w,
                      uint8_t* out) {
  int64_t hw = h * w;
  parallel_for(b * hw, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t bi = i / hw, px = i % hw;
      const float* src = imgs + bi * 3 * hw + px;
      uint8_t* dst = out + (bi * hw + px) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = src[c * hw] * 255.0f;
        v = std::max(0.0f, std::min(255.0f, v));
        dst[c] = static_cast<uint8_t>(v);
      }
    }
  });
}

int fpq_abi_version() { return 1; }

}  // extern "C"
