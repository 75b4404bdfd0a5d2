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

// Interior row-block of a full 3x3 conv with COMPILE-TIME cout, so the
// MB x COUT accumulator tile unrolls into vector registers (a runtime
// cout bound leaves it in L1 and the store port serialises the FMA
// chains).  Accumulation order (bias + ascending dy,dx,c) matches the
// per-pixel reference path bitwise.
template <int COUT_T>  // COUT_T = 0 -> runtime cout (acc stays in L1)
inline void conv3x3_row_block(const float* row0, const float* kw,
                              const float* bs, float* out_row, int ox0, int mb,
                              int cin, int cout_rt, int stride,
                              int in_row_stride, bool relu) {
  constexpr int MB = 4, MAXC = 64;
  const int cout = COUT_T ? COUT_T : cout_rt;
  float acc[MB][COUT_T ? COUT_T : MAXC];
  for (int m = 0; m < mb; ++m)
    for (int o = 0; o < cout; ++o) acc[m][o] = bs[o];
  for (int dy = 0; dy < 3; ++dy) {
    const float* row = row0 + (size_t)dy * in_row_stride;
    for (int dx = 0; dx < 3; ++dx) {
      const float* kp = kw + (((size_t)dy * 3 + dx) * cin) * cout;
      for (int c = 0; c < cin; ++c) {
        const float* krow = kp + (size_t)c * cout;
        for (int m = 0; m < mb; ++m) {
          const float v = row[(size_t)((ox0 + m) * stride - 1 + dx) * cin + c];
          for (int o = 0; o < cout; ++o) acc[m][o] += v * krow[o];
        }
      }
    }
  }
  for (int m = 0; m < mb; ++m) {
    float* op = out_row + (size_t)(ox0 + m) * cout;
    if (relu)
      for (int o = 0; o < cout; ++o) op[o] = std::max(acc[m][o], 0.0f);
    else
      for (int o = 0; o < cout; ++o) op[o] = acc[m][o];
  }
}

// 1x1 stride-1 conv as a pixel-blocked GEMM: out(N, cout) = in(N, cin) @ W.
// The 1x1 convs carry ~90% of the network's FLOPs.  Blocking MB pixels per
// pass over W reuses each W row MB times from L1 instead of streaming the
// whole kernel once per pixel; the saxpy inner loop (unit-stride over cout,
// broadcast x) and the reduction order (bias + ascending c) are identical
// to the naive per-pixel loop, so outputs stay bitwise-equal.
void conv1x1(const Tensor& in, const float* W, const float* bias, Tensor& out,
             bool relu) {
  const int cin = in.c, cout = out.c;
  const int N = in.h * in.w;
  const float* X = in.data.data();
  float* Y = out.data.data();
  constexpr int MB = 8;
#pragma omp parallel for schedule(static)
  for (int n0 = 0; n0 < N; n0 += MB) {
    const int mb = std::min(MB, N - n0);
    const float* Xb = X + (size_t)n0 * cin;
    float* Yb = Y + (size_t)n0 * cout;
    for (int m = 0; m < mb; ++m) {
      float* ym = Yb + (size_t)m * cout;
      for (int o = 0; o < cout; ++o) ym[o] = bias[o];
    }
    for (int c = 0; c < cin; ++c) {
      const float* wrow = W + (size_t)c * cout;
      for (int m = 0; m < mb; ++m) {
        const float xv = Xb[(size_t)m * cin + c];
        float* ym = Yb + (size_t)m * cout;
        for (int o = 0; o < cout; ++o) ym[o] += xv * wrow[o];
      }
    }
    if (relu)
      for (int m = 0; m < mb; ++m) {
        float* ym = Yb + (size_t)m * cout;
        for (int o = 0; o < cout; ++o) ym[o] = std::max(ym[o], 0.0f);
      }
  }
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
    auto dw_pixel = [&](int oy, int ox) {
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
    };
    // Interior fast path: fixed-K tap unroll, no bounds checks; the c-loop
    // vectorizes (every tap is unit-stride in c).  Same bias + ascending
    // (dy,dx) reduction order as dw_pixel -> bitwise-equal outputs.
    if (k == 3 || k == 5) {
      const int C = cout;
      const int irs = in.w * C;
      const int ox_lo = (pad + stride - 1) / stride;
      const int ox_hi_excl =
          std::min(ow, (in.w - 1 - (k - 1) + pad) / stride + 1);
#pragma omp parallel for schedule(static)
      for (int oy = 0; oy < oh; ++oy) {
        const int iy0 = oy * stride - pad;
        if (iy0 < 0 || iy0 + k > in.h || ox_lo >= ox_hi_excl) {
          for (int ox = 0; ox < ow; ++ox) dw_pixel(oy, ox);
          continue;
        }
        for (int ox = 0; ox < ox_lo; ++ox) dw_pixel(oy, ox);
        const float* base = in.data.data() + (size_t)iy0 * irs;
        if (k == 3) {
          for (int ox = ox_lo; ox < ox_hi_excl; ++ox) {
            const float* p = base + (size_t)(ox * stride - pad) * C;
            float* op = out.at(oy, ox);
            for (int c = 0; c < C; ++c) {
              float a = bs[c];
              a += p[c] * kw[c];
              a += p[C + c] * kw[C + c];
              a += p[2 * C + c] * kw[2 * C + c];
              a += p[irs + c] * kw[3 * C + c];
              a += p[irs + C + c] * kw[4 * C + c];
              a += p[irs + 2 * C + c] * kw[5 * C + c];
              a += p[2 * irs + c] * kw[6 * C + c];
              a += p[2 * irs + C + c] * kw[7 * C + c];
              a += p[2 * irs + 2 * C + c] * kw[8 * C + c];
              op[c] = relu ? std::max(a, 0.0f) : a;
            }
          }
        } else {  // k == 5
          for (int ox = ox_lo; ox < ox_hi_excl; ++ox) {
            const float* p = base + (size_t)(ox * stride - pad) * C;
            float* op = out.at(oy, ox);
            for (int c = 0; c < C; ++c) {
              float a = bs[c];
              for (int dy = 0; dy < 5; ++dy)
                for (int dx = 0; dx < 5; ++dx)
                  a += p[(size_t)dy * irs + (size_t)dx * C + c] *
                       kw[((size_t)dy * 5 + dx) * C + c];
              op[c] = relu ? std::max(a, 0.0f) : a;
            }
          }
        }
        for (int ox = ox_hi_excl; ox < ow; ++ox) dw_pixel(oy, ox);
      }
      return out;
    }
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < oh; ++oy)
      for (int ox = 0; ox < ow; ++ox) dw_pixel(oy, ox);
    return out;
  }

  const int cin = (int)ks[2];
  if (cin != in.c) throw std::runtime_error("conv kernel Cin mismatch");
  if (k == 1 && stride == 1) {
    conv1x1(in, kw, bs, out, relu);
    return out;
  }

  // Per-pixel reference path (borders + fallback); bias + ascending
  // (dy,dx,c) accumulation order is the parity contract for every path.
  auto pixel = [&](int oy, int ox) {
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
  };

  // Interior fast path for the full 3x3 convs (conv0/conv1_9 — 28% of the
  // network on the per-layer profile): no bounds checks, and MB output
  // pixels accumulate concurrently so the FMA chains are independent (the
  // per-pixel path is latency-bound on ONE serial accumulator chain).
  constexpr int MB = 4, MAXC = 64;
  if (k == 3 && cout <= MAXC) {
    // interior ox range: ox*stride-1 >= 0 and ox*stride-1+2 <= in.w-1
    const int ox_lo = (pad + stride - 1) / stride;
    const int ox_hi_excl = std::min(ow, (in.w - 1 - (k - 1) + pad) / stride + 1);
    const int in_row_stride = in.w * cin;
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < oh; ++oy) {
      const int iy0 = oy * stride - pad;
      if (iy0 < 0 || iy0 + k > in.h || ox_lo >= ox_hi_excl) {
        for (int ox = 0; ox < ow; ++ox) pixel(oy, ox);
        continue;
      }
      for (int ox = 0; ox < ox_lo; ++ox) pixel(oy, ox);
      const float* row0 = in.at(iy0, 0);
      float* out_row = out.at(oy, 0);
      for (int ox0 = ox_lo; ox0 < ox_hi_excl; ox0 += MB) {
        const int mb = std::min(MB, ox_hi_excl - ox0);
        switch (cout) {  // compile-time cout -> register accumulators
          case 8:
            conv3x3_row_block<8>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                 stride, in_row_stride, relu);
            break;
          case 16:
            conv3x3_row_block<16>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                  stride, in_row_stride, relu);
            break;
          case 24:
            conv3x3_row_block<24>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                  stride, in_row_stride, relu);
            break;
          case 32:
            conv3x3_row_block<32>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                  stride, in_row_stride, relu);
            break;
          case 48:
            conv3x3_row_block<48>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                  stride, in_row_stride, relu);
            break;
          default:
            conv3x3_row_block<0>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                 stride, in_row_stride, relu);
        }
      }
      for (int ox = ox_hi_excl; ox < ow; ++ox) pixel(oy, ox);
    }
    return out;
  }

#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < oh; ++oy)
    for (int ox = 0; ox < ow; ++ox) pixel(oy, ox);
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
