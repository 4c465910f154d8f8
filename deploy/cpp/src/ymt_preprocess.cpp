// Native host preprocessing for yolo_master_tpu (reference analog: the
// C++ pre/post pipelines in the reference's deploy stack; here it is the
// TPU-serving host bottleneck fix — measured in Python: BGR->RGB + /255 +
// s2d4 blob reorder costs ~6.4 ms per 640px frame vs 1.1 ms device time).
//
// Exposed as a C ABI consumed from Python via ctypes
// (yolo_master_tpu/data/native.py) and from the C++ serving CLI. The
// letterbox resize itself stays in cv2/OpenCV on both sides (INTER_LINEAR
// bit-parity with the reference preprocessing matters for mAP; see
// SURVEY §7 "pixel-exact preprocessing").
//
// Build: deploy/cpp/CMakeLists.txt -> libymt_preprocess.so
//   g++ -O3 -march=native -fopenmp -shared -fPIC ymt_preprocess.cpp -o libymt_preprocess.so

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Letterboxed BGR uint8 [H, W, 3] -> NHWC float32 RGB/255 [H, W, 3].
// One fused parallel pass (replaces numpy's ::-1 copy + astype + divide).
void ymt_nhwc_normalize(const uint8_t* bgr, int h, int w, float* out) {
  const float inv = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = bgr + (size_t)y * w * 3;
    float* orow = out + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      orow[x * 3 + 0] = row[x * 3 + 2] * inv;  // R
      orow[x * 3 + 1] = row[x * 3 + 1] * inv;  // G
      orow[x * 3 + 2] = row[x * 3 + 0] * inv;  // B
    }
  }
}

// Letterboxed BGR uint8 [H, W, 3] -> space-to-depth(4) float32 blob
// [48, hb_pad, wq] for the Pallas fused stem (ops/pallas_stem.py s2d4_blob_np
// layout: pad 4 per side, channel g = (mr*4 + mc)*3 + c with RGB order,
// rows hb = H/4 + 2 padded to hb_pad, lanes wb = W/4 + 2 padded to wq).
// The blob is written zero-initialized; only valid cells are filled.
void ymt_s2d4_blob(const uint8_t* bgr, int h, int w, int hb_pad, int wq,
                   float* blob) {
  const float inv = 1.0f / 255.0f;
  // Output-major single pass: each (g, cell_row) output row is zeroed and
  // filled by one iteration — fully parallel, no serial memset of the
  // ~14 MB padded buffer. g = (mr*4 + mc)*3 + rgb; image row = 4*cr + mr - 4,
  // image col = 4*cc + mc - 4 (pad 4 per side = one blob cell).
#pragma omp parallel for schedule(static) collapse(2)
  for (int g = 0; g < 48; ++g) {
    for (int cr = 0; cr < hb_pad; ++cr) {
      const int rgb = g % 3, phase = g / 3, mr = phase >> 2, mc = phase & 3;
      float* orow = blob + ((size_t)g * hb_pad + cr) * wq;
      const int r = 4 * cr + mr - 4;
      if (r < 0 || r >= h) {
        std::memset(orow, 0, sizeof(float) * wq);
        continue;
      }
      const uint8_t* irow = bgr + (size_t)r * w * 3 + (2 - rgb);  // BGR -> RGB
      const int wb = w / 4 + 2;
      for (int cc = 0; cc < wb; ++cc) {
        const int c = 4 * cc + mc - 4;
        orow[cc] = (c < 0 || c >= w) ? 0.0f : irow[c * 3] * inv;
      }
      std::memset(orow + wb, 0, sizeof(float) * (wq - wb));
    }
  }
}

int ymt_preprocess_version() { return 1; }

}  // extern "C"

extern "C" {

// uint8 twin of ymt_s2d4_blob: pure reorder, no normalize — the /255 is
// folded into the stem conv weights on device (pallas_stem_fuse
// uint8_input=True), shrinking host->device transfer 4x (14 -> 3.5 MB).
void ymt_s2d4_blob_u8(const uint8_t* bgr, int h, int w, int hb_pad, int wq,
                      uint8_t* blob) {
#pragma omp parallel for schedule(static) collapse(2)
  for (int g = 0; g < 48; ++g) {
    for (int cr = 0; cr < hb_pad; ++cr) {
      const int rgb = g % 3, phase = g / 3, mr = phase >> 2, mc = phase & 3;
      uint8_t* orow = blob + ((size_t)g * hb_pad + cr) * wq;
      const int r = 4 * cr + mr - 4;
      if (r < 0 || r >= h) {
        std::memset(orow, 0, wq);
        continue;
      }
      const uint8_t* irow = bgr + (size_t)r * w * 3 + (2 - rgb);
      const int wb = w / 4 + 2;
      for (int cc = 0; cc < wb; ++cc) {
        const int c = 4 * cc + mc - 4;
        orow[cc] = (c < 0 || c >= w) ? 0 : irow[c * 3];
      }
      std::memset(orow + wb, 0, wq - wb);
    }
  }
}

}  // extern "C"
