// Native image preprocessing for the data-loader / serving hot path.
//
// The reference leans on PIL inside its torch DataLoader workers
// (reference: llava/train/train.py:733-758, llava/serve/model_worker.py:131);
// here the per-image work (bicubic shortest-edge resize, center crop,
// rescale + CLIP normalization to CHW float32) runs as one C++ pass over
// the pixel buffer, exposed to Python via ctypes (no pybind11 in this
// image).
//
// The resampler reproduces PIL's convolution-based bicubic filter
// (Catmull-Rom style cubic with a = -0.5, support = 2, normalized weights,
// clamped edges) so outputs match PIL.Image.resize(..., BICUBIC) closely.
//
// Build: g++ -O3 -march=native -shared -fPIC image_ops.cpp -o libimage_ops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double cubic_filter(double x) {
  // PIL's bicubic kernel (a = -0.5)
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResampleCoeffs {
  std::vector<int> bounds;      // per output pixel: first source index
  std::vector<int> counts;      // per output pixel: number of taps
  std::vector<double> weights;  // taps, normalized
  int ksize;
};

// Precompute 1-D resampling coefficients exactly the way PIL does:
// center mapping (out + 0.5) * scale, filter support scaled by max(scale, 1).
ResampleCoeffs compute_coeffs(int in_size, int out_size) {
  ResampleCoeffs rc;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support = 2
  rc.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  rc.bounds.resize(out_size);
  rc.counts.resize(out_size);
  rc.weights.assign(static_cast<size_t>(out_size) * rc.ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double* w = &rc.weights[static_cast<size_t>(xx) * rc.ksize];
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      double wv = cubic_filter((xmin + i - center + 0.5) / filterscale);
      w[i] = wv;
      total += wv;
    }
    if (total != 0.0)
      for (int i = 0; i < n; ++i) w[i] /= total;
    rc.bounds[xx] = xmin;
    rc.counts[xx] = n;
  }
  return rc;
}

inline uint8_t clip8(double v) {
  return static_cast<uint8_t>(std::min(255.0, std::max(0.0, v + 0.5)));
}

// Separable resize HWC uint8 -> HWC uint8.
void resize_bicubic(const uint8_t* src, int in_h, int in_w, uint8_t* dst,
                    int out_h, int out_w, int channels) {
  ResampleCoeffs cx = compute_coeffs(in_w, out_w);
  ResampleCoeffs cy = compute_coeffs(in_h, out_h);

  // horizontal pass into a double buffer (keeps precision like PIL's
  // two-pass uint8 path is approximated by one double intermediate)
  std::vector<double> tmp(static_cast<size_t>(in_h) * out_w * channels);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * channels;
    double* trow = &tmp[static_cast<size_t>(y) * out_w * channels];
    for (int x = 0; x < out_w; ++x) {
      const double* w = &cx.weights[static_cast<size_t>(x) * cx.ksize];
      int x0 = cx.bounds[x], n = cx.counts[x];
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += row[(x0 + i) * channels + c] * w[i];
        trow[x * channels + c] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; ++y) {
    const double* w = &cy.weights[static_cast<size_t>(y) * cy.ksize];
    int y0 = cy.bounds[y], n = cy.counts[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * out_w * channels;
    for (int x = 0; x < out_w; ++x) {
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += tmp[(static_cast<size_t>(y0 + i) * out_w + x) * channels + c] * w[i];
        drow[x * channels + c] = clip8(acc);
      }
    }
  }
}

}  // namespace

extern "C" {

// Resize an HWC uint8 RGB image with PIL-compatible bicubic filtering.
void image_resize_bicubic(const uint8_t* src, int in_h, int in_w,
                          uint8_t* dst, int out_h, int out_w) {
  resize_bicubic(src, in_h, in_w, dst, out_h, out_w, 3);
}

// Full CLIP preprocess: HWC uint8 -> shortest-edge bicubic resize ->
// center crop (crop x crop) -> rescale 1/255 -> normalize -> CHW float32.
void clip_preprocess(const uint8_t* src, int in_h, int in_w, int target_short,
                     int crop, const float* mean, const float* std_,
                     float* out /* 3*crop*crop */) {
  int short_side = std::min(in_h, in_w);
  int new_h, new_w;
  if (short_side == target_short) {
    new_h = in_h;
    new_w = in_w;
  } else {
    double s = static_cast<double>(target_short) / short_side;
    if (in_w <= in_h) {
      new_w = target_short;
      new_h = static_cast<int>(in_h * s);
    } else {
      new_h = target_short;
      new_w = static_cast<int>(in_w * s);
    }
  }
  std::vector<uint8_t> resized(static_cast<size_t>(new_h) * new_w * 3);
  if (new_h == in_h && new_w == in_w) {
    std::memcpy(resized.data(), src, resized.size());
  } else {
    resize_bicubic(src, in_h, in_w, resized.data(), new_h, new_w, 3);
  }

  int top = (new_h - crop) / 2;
  int left = (new_w - crop) / 2;
  const float inv255 = 1.0f / 255.0f;
  for (int c = 0; c < 3; ++c) {
    const float m = mean[c], sd = std_[c];
    float* oc = out + static_cast<size_t>(c) * crop * crop;
    for (int y = 0; y < crop; ++y) {
      int sy = std::min(std::max(top + y, 0), new_h - 1);
      const uint8_t* row = &resized[(static_cast<size_t>(sy) * new_w) * 3];
      for (int x = 0; x < crop; ++x) {
        int sx = std::min(std::max(left + x, 0), new_w - 1);
        oc[y * crop + x] = (row[sx * 3 + c] * inv255 - m) / sd;
      }
    }
  }
}

// Batched variant over N images of identical input size.
void clip_preprocess_batch(const uint8_t* src, int n, int in_h, int in_w,
                           int target_short, int crop, const float* mean,
                           const float* std_, float* out) {
  const size_t in_stride = static_cast<size_t>(in_h) * in_w * 3;
  const size_t out_stride = static_cast<size_t>(3) * crop * crop;
  for (int i = 0; i < n; ++i) {
    clip_preprocess(src + i * in_stride, in_h, in_w, target_short, crop,
                    mean, std_, out + i * out_stride);
  }
}

}  // extern "C"
