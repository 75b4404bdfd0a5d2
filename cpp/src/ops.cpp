// NHWC conv kernels for the native runtime.
//
// Layouts follow the exported weights: conv kernels HWIO (k, k, Cin, Cout),
// depthwise (k, k, 1, C), deconv (2, 2, Cin, Cout).  NHWC keeps channels
// contiguous so every inner loop below is a unit-stride axpy/dot the
// compiler auto-vectorizes; OpenMP parallelises over output rows (the
// reference's own native code parallelised only its decode loop,
// YOLO_ncnn.cpp:103 — here the whole network is parallel).

#include <algorithm>
#include <cstring>
#include <stdexcept>

#include "yf/model.h"

namespace yf {

namespace {
inline int out_dim(int in, int k, int stride, int pad) {
  return (in + 2 * pad - k) / stride + 1;
}
}  // namespace

Tensor conv2d(const Tensor& in, const NamedTensor& kernel, const NamedTensor& bias,
              int stride, bool depthwise, bool relu) {
  const auto& ks = kernel.shape;  // (k, k, Cin_per_group, Cout)
  const int k = (int)ks[0];
  const int cout = (int)ks[3];
  const int pad = (k - 1) / 2;
  const int oh = out_dim(in.h, k, stride, pad);
  const int ow = out_dim(in.w, k, stride, pad);
  Tensor out(oh, ow, cout);
  const float* kw = kernel.f32.data();
  const float* bs = bias.f32.data();

  if (depthwise) {
    if ((int)ks[2] != 1 || cout != in.c)
      throw std::runtime_error("depthwise kernel shape mismatch");
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < oh; ++oy) {
      for (int ox = 0; ox < ow; ++ox) {
        float* op = out.at(oy, ox);
        for (int c = 0; c < cout; ++c) op[c] = bs[c];
        const int iy0 = oy * stride - pad, ix0 = ox * stride - pad;
        for (int dy = 0; dy < k; ++dy) {
          const int iy = iy0 + dy;
          if (iy < 0 || iy >= in.h) continue;
          for (int dx = 0; dx < k; ++dx) {
            const int ix = ix0 + dx;
            if (ix < 0 || ix >= in.w) continue;
            const float* ip = in.at(iy, ix);
            const float* kp = kw + ((size_t)dy * k + dx) * cout;  // (dy,dx,0,:)
            for (int c = 0; c < cout; ++c) op[c] += ip[c] * kp[c];
          }
        }
        if (relu)
          for (int c = 0; c < cout; ++c) op[c] = std::max(op[c], 0.0f);
      }
    }
    return out;
  }

  const int cin = (int)ks[2];
  if (cin != in.c) throw std::runtime_error("conv kernel Cin mismatch");
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < oh; ++oy) {
    for (int ox = 0; ox < ow; ++ox) {
      float* op = out.at(oy, ox);
      for (int o = 0; o < cout; ++o) op[o] = bs[o];
      const int iy0 = oy * stride - pad, ix0 = ox * stride - pad;
      for (int dy = 0; dy < k; ++dy) {
        const int iy = iy0 + dy;
        if (iy < 0 || iy >= in.h) continue;
        for (int dx = 0; dx < k; ++dx) {
          const int ix = ix0 + dx;
          if (ix < 0 || ix >= in.w) continue;
          const float* ip = in.at(iy, ix);
          const float* kp = kw + (((size_t)dy * k + dx) * cin) * cout;
          for (int c = 0; c < cin; ++c) {
            const float v = ip[c];
            const float* krow = kp + (size_t)c * cout;  // (dy,dx,c,:)
            for (int o = 0; o < cout; ++o) op[o] += v * krow[o];
          }
        }
      }
      if (relu)
        for (int o = 0; o < cout; ++o) op[o] = std::max(op[o], 0.0f);
    }
  }
  return out;
}

Tensor deconv2x(const Tensor& in, const NamedTensor& kernel, const NamedTensor& bias) {
  const auto& ks = kernel.shape;  // (2, 2, Cin, Cout)
  const int cin = (int)ks[2], cout = (int)ks[3];
  if (cin != in.c) throw std::runtime_error("deconv kernel Cin mismatch");
  Tensor out(in.h * 2, in.w * 2, cout);
  const float* kw = kernel.f32.data();
  const float* bs = bias.f32.data();
#pragma omp parallel for schedule(static)
  for (int y = 0; y < in.h; ++y) {
    for (int x = 0; x < in.w; ++x) {
      const float* ip = in.at(y, x);
      for (int dy = 0; dy < 2; ++dy) {
        for (int dx = 0; dx < 2; ++dx) {
          float* op = out.at(2 * y + dy, 2 * x + dx);
          for (int o = 0; o < cout; ++o) op[o] = bs[o];
          const float* kp = kw + (((size_t)dy * 2 + dx) * cin) * cout;
          for (int c = 0; c < cin; ++c) {
            const float v = ip[c];
            const float* krow = kp + (size_t)c * cout;
            for (int o = 0; o < cout; ++o) op[o] += v * krow[o];
          }
          for (int o = 0; o < cout; ++o) op[o] = std::max(op[o], 0.0f);  // ReLU
        }
      }
    }
  }
  return out;
}

Tensor concat_c(const Tensor& a, const Tensor& b) {
  if (a.h != b.h || a.w != b.w) throw std::runtime_error("concat spatial mismatch");
  Tensor out(a.h, a.w, a.c + b.c);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < a.h; ++y) {
    for (int x = 0; x < a.w; ++x) {
      float* op = out.at(y, x);
      std::memcpy(op, a.at(y, x), sizeof(float) * a.c);
      std::memcpy(op + a.c, b.at(y, x), sizeof(float) * b.c);
    }
  }
  return out;
}

void add_inplace(Tensor& x, const Tensor& y) {
  if (x.size() != y.size()) throw std::runtime_error("add size mismatch");
  float* xp = x.data.data();
  const float* yp = y.data.data();
  const size_t n = x.size();
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; ++i) xp[i] += yp[i];
}

}  // namespace yf
