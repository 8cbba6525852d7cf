// Native image preprocessing for fastvlm_tpu: threaded JPEG decode +
// PIL-compatible antialiased bicubic resize + center-crop / pad-to-square +
// rescale(1/255), exposed through a C ABI for ctypes.
//
// Role: the host-side data path. The reference does this work in Python/PIL
// (llava/mm_utils.py) and re-implements it in vImage for the device app
// (app/FastVLM/MediaProcessingExtensions.swift:84-170). Training input
// pipelines and the serving worker call this instead of PIL when available
// (fastvlm_tpu/utils/native_image.py), keeping image decode off the GIL.
//
// Resampling matches PIL's convolution resampler: cubic kernel a = -0.5
// with support scaled by the downscale factor (antialiasing), separable
// horizontal-then-vertical passes, f32 accumulation. One deliberate
// difference: PIL rounds+clips the intermediate pass to uint8; we keep
// float32 throughout (same as jax.image.resize), so outputs differ from PIL
// only where bicubic overshoot would clip — ~1e-3 on natural images.
//
// Build: make -C native  (g++ -O3 -fPIC -shared, links -ljpeg -lpthread)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to interleaved RGB u8. Returns false on failure.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// PIL-style cubic kernel (Catmull-Rom variant with a = -0.5).
inline double cubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precomputed sampling weights for one output axis (PIL precompute_coeffs).
struct AxisCoeffs {
  std::vector<int> bounds_lo;  // first source index per output pixel
  std::vector<int> counts;     // number of taps
  std::vector<float> weights;  // taps, row-major [out, ksize]
  int ksize;
};

AxisCoeffs precompute(int in_size, int out_size) {
  AxisCoeffs c;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);  // antialias on downscale
  double support = 2.0 * filterscale;         // cubic support = 2
  c.ksize = int(std::ceil(support)) * 2 + 1;
  c.bounds_lo.resize(out_size);
  c.counts.resize(out_size);
  c.weights.assign(size_t(out_size) * c.ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int lo = std::max(int(center - support + 0.5), 0);
    int hi = std::min(int(center + support + 0.5), in_size);
    double wsum = 0.0;
    int n = hi - lo;
    std::vector<double> tmpw(n);
    for (int i = 0; i < n; ++i) {
      tmpw[i] = cubic_filter((lo + i - center + 0.5) / filterscale);
      wsum += tmpw[i];
    }
    for (int i = 0; i < n; ++i)
      c.weights[size_t(xx) * c.ksize + i] =
          float(wsum != 0.0 ? tmpw[i] / wsum : 0.0);
    c.bounds_lo[xx] = lo;
    c.counts[xx] = n;
  }
  return c;
}

// Separable resize u8 RGB (h_in, w_in) -> f32 RGB (h_out, w_out) in [0, 255].
// Vertical pass runs whole rows at a time (contiguous, vectorizable).
void resize_bicubic(const uint8_t* in, int w_in, int h_in, float* out,
                    int w_out, int h_out) {
  AxisCoeffs cx = precompute(w_in, w_out);
  AxisCoeffs cy = precompute(h_in, h_out);
  // horizontal pass: (h_in, w_out)
  std::vector<float> tmp(size_t(h_in) * w_out * 3);
  std::vector<float> frow(size_t(w_in) * 3);
  for (int y = 0; y < h_in; ++y) {
    const uint8_t* row = in + size_t(y) * w_in * 3;
    for (int i = 0; i < w_in * 3; ++i) frow[i] = row[i];
    float* trow = tmp.data() + size_t(y) * w_out * 3;
    for (int x = 0; x < w_out; ++x) {
      const float* w = &cx.weights[size_t(x) * cx.ksize];
      const float* px = frow.data() + size_t(cx.bounds_lo[x]) * 3;
      int n = cx.counts[x];
      float a0 = 0, a1 = 0, a2 = 0;
      for (int i = 0; i < n; ++i) {
        a0 += w[i] * px[i * 3 + 0];
        a1 += w[i] * px[i * 3 + 1];
        a2 += w[i] * px[i * 3 + 2];
      }
      trow[x * 3 + 0] = a0;
      trow[x * 3 + 1] = a1;
      trow[x * 3 + 2] = a2;
    }
  }
  // vertical pass: accumulate whole output rows (unit-stride SIMD)
  int row_elems = w_out * 3;
  for (int y = 0; y < h_out; ++y) {
    const float* w = &cy.weights[size_t(y) * cy.ksize];
    int lo = cy.bounds_lo[y], n = cy.counts[y];
    float* orow = out + size_t(y) * row_elems;
    std::memset(orow, 0, sizeof(float) * row_elems);
    for (int i = 0; i < n; ++i) {
      const float wi = w[i];
      const float* srow = tmp.data() + size_t(lo + i) * row_elems;
      for (int x = 0; x < row_elems; ++x) orow[x] += wi * srow[x];
    }
  }
}

// modes mirror data/preprocessing.py
enum Mode { MODE_RESIZE_CROP = 0, MODE_PAD_SQUARE = 1 };

// Full pipeline for one decoded RGB image -> (S, S, 3) f32 in [0, 1].
void preprocess_rgb(const uint8_t* rgb, int w, int h, int size, int mode,
                    float* out) {
  std::vector<uint8_t> padded;
  if (mode == MODE_PAD_SQUARE && w != h) {
    // centered black pad to square (mm_utils.py:154-165; mean color is 0)
    int side = std::max(w, h);
    padded.assign(size_t(side) * side * 3, 0);
    int off_x = (side - w) / 2, off_y = (side - h) / 2;
    for (int y = 0; y < h; ++y)
      std::memcpy(padded.data() + ((size_t(y) + off_y) * side + off_x) * 3,
                  rgb + size_t(y) * w * 3, size_t(w) * 3);
    rgb = padded.data();
    w = h = side;
  }
  // resize shortest edge to `size`, then center-crop size x size
  int nw, nh;
  if (w <= h) {
    nw = size;
    nh = int(double(size) * h / w);
  } else {
    nh = size;
    nw = int(double(size) * w / h);
  }
  std::vector<float> resized(size_t(nw) * nh * 3);
  resize_bicubic(rgb, w, h, resized.data(), nw, nh);
  int left = (nw - size) / 2, top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    const float* src = resized.data() + ((size_t(y) + top) * nw + left) * 3;
    float* dst = out + size_t(y) * size * 3;
    for (int x = 0; x < size * 3; ++x)
      dst[x] = std::min(std::max(src[x], 0.0f), 255.0f) / 255.0f;
  }
}

}  // namespace

extern "C" {

// Decode+preprocess one JPEG buffer. Returns 0 on success.
int fvlm_preprocess_jpeg(const uint8_t* data, size_t len, int size, int mode,
                         float* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_jpeg(data, len, &rgb, &w, &h)) return 1;
  preprocess_rgb(rgb.data(), w, h, size, mode, out);
  return 0;
}

// Preprocess raw u8 RGB (h, w, 3). Returns 0 on success.
int fvlm_preprocess_rgb(const uint8_t* rgb, int w, int h, int size, int mode,
                        float* out) {
  preprocess_rgb(rgb, w, h, size, mode, out);
  return 0;
}

// Threaded batch: decode+preprocess n JPEG files into out (n, size, size, 3).
// ok[i] = 0 on success. Returns count of failures.
int fvlm_preprocess_files(const char** paths, int n, int size, int mode,
                          float* out, int* ok, int num_threads) {
  std::atomic<int> next(0), failures(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ok[i] = 1;
      FILE* f = std::fopen(paths[i], "rb");
      if (!f) {
        failures++;
        continue;
      }
      std::fseek(f, 0, SEEK_END);
      long sz = std::ftell(f);
      std::fseek(f, 0, SEEK_SET);
      std::vector<uint8_t> buf(sz);
      size_t got = std::fread(buf.data(), 1, sz, f);
      std::fclose(f);
      if (got != size_t(sz)) {
        failures++;
        continue;
      }
      float* dst = out + size_t(i) * size * size * 3;
      if (fvlm_preprocess_jpeg(buf.data(), buf.size(), size, mode, dst)) {
        failures++;
        continue;
      }
      ok[i] = 0;
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
