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
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#define YF_HAVE_AVX2_FMA 1
#endif

#include "yf/model.h"
#include "yf/neon.h"

namespace yf {

namespace {
inline int out_dim(int in, int k, int stride, int pad) {
  return (in + 2 * pad - k) / stride + 1;
}

// Interior row-block of a full 3x3 conv with COMPILE-TIME cout AND pixel
// count, so the MB x COUT accumulator tile unrolls into vector registers
// (a runtime bound on either loop leaves it in L1 and the store-to-load
// forwarding on the accumulator serialises the FMA chains — measured ~7x
// slower).  Accumulation order (bias + ascending dy,dx,c) matches the
// per-pixel reference path bitwise.
template <int COUT_T, int MB_T>  // 0 -> runtime bound (acc stays in L1)
inline void conv3x3_block_body(const float* __restrict row0,
                               const float* __restrict kw,
                               const float* __restrict bs,
                               float* __restrict out_row, int ox0, int mb_rt,
                               int cin, int cout_rt, int stride,
                               int in_row_stride, bool relu) {
  constexpr int MAXB = 4, MAXC = 64;
  const int cout = COUT_T ? COUT_T : cout_rt;
  const int mb = MB_T ? MB_T : mb_rt;
  float acc[MB_T ? MB_T : MAXB][COUT_T ? COUT_T : MAXC];
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

#ifdef YF_HAVE_AVX2_FMA
// Explicit-intrinsics 4-pixel x 8-out tile: gcc's autovectorized tile body
// measured only 2.5 GMAC/s on the 3x3 stride-2 shapes (accumulator spills);
// the hand tile reaches the host's fp32 FMA peak (~21 GMAC/s measured).
// Same value order (bias + ascending (dy,dx,c), fused multiply-add — the
// compiler contracts the generic body identically under -O3).
inline void conv3x3_tile8_avx(const float* __restrict row0,
                              const float* __restrict kw,
                              const float* __restrict bs,
                              float* __restrict out_row, int ox0, int cin,
                              int stride, int irs, bool relu) {
  const __m256 bv = _mm256_loadu_ps(bs);
  __m256 a0 = bv, a1 = bv, a2 = bv, a3 = bv;
  for (int dy = 0; dy < 3; ++dy) {
    const float* row = row0 + (size_t)dy * irs;
    for (int dx = 0; dx < 3; ++dx) {
      const float* kp = kw + (((size_t)dy * 3 + dx) * cin) * 8;
      const float* p0 = row + (size_t)((ox0 + 0) * stride - 1 + dx) * cin;
      const float* p1 = row + (size_t)((ox0 + 1) * stride - 1 + dx) * cin;
      const float* p2 = row + (size_t)((ox0 + 2) * stride - 1 + dx) * cin;
      const float* p3 = row + (size_t)((ox0 + 3) * stride - 1 + dx) * cin;
      for (int c = 0; c < cin; ++c) {
        const __m256 k8 = _mm256_loadu_ps(kp + (size_t)c * 8);
        a0 = _mm256_fmadd_ps(_mm256_set1_ps(p0[c]), k8, a0);
        a1 = _mm256_fmadd_ps(_mm256_set1_ps(p1[c]), k8, a1);
        a2 = _mm256_fmadd_ps(_mm256_set1_ps(p2[c]), k8, a2);
        a3 = _mm256_fmadd_ps(_mm256_set1_ps(p3[c]), k8, a3);
      }
    }
  }
  if (relu) {
    const __m256 z = _mm256_setzero_ps();
    a0 = _mm256_max_ps(a0, z); a1 = _mm256_max_ps(a1, z);
    a2 = _mm256_max_ps(a2, z); a3 = _mm256_max_ps(a3, z);
  }
  _mm256_storeu_ps(out_row + (size_t)(ox0 + 0) * 8, a0);
  _mm256_storeu_ps(out_row + (size_t)(ox0 + 1) * 8, a1);
  _mm256_storeu_ps(out_row + (size_t)(ox0 + 2) * 8, a2);
  _mm256_storeu_ps(out_row + (size_t)(ox0 + 3) * 8, a3);
}

// 4-pixel x 4-out tile (conv0): same structure on __m128.
inline void conv3x3_tile4_avx(const float* __restrict row0,
                              const float* __restrict kw,
                              const float* __restrict bs,
                              float* __restrict out_row, int ox0, int cin,
                              int stride, int irs, bool relu) {
  const __m128 bv = _mm_loadu_ps(bs);
  __m128 a0 = bv, a1 = bv, a2 = bv, a3 = bv;
  for (int dy = 0; dy < 3; ++dy) {
    const float* row = row0 + (size_t)dy * irs;
    for (int dx = 0; dx < 3; ++dx) {
      const float* kp = kw + (((size_t)dy * 3 + dx) * cin) * 4;
      const float* p0 = row + (size_t)((ox0 + 0) * stride - 1 + dx) * cin;
      const float* p1 = row + (size_t)((ox0 + 1) * stride - 1 + dx) * cin;
      const float* p2 = row + (size_t)((ox0 + 2) * stride - 1 + dx) * cin;
      const float* p3 = row + (size_t)((ox0 + 3) * stride - 1 + dx) * cin;
      for (int c = 0; c < cin; ++c) {
        const __m128 k4 = _mm_loadu_ps(kp + (size_t)c * 4);
        a0 = _mm_fmadd_ps(_mm_set1_ps(p0[c]), k4, a0);
        a1 = _mm_fmadd_ps(_mm_set1_ps(p1[c]), k4, a1);
        a2 = _mm_fmadd_ps(_mm_set1_ps(p2[c]), k4, a2);
        a3 = _mm_fmadd_ps(_mm_set1_ps(p3[c]), k4, a3);
      }
    }
  }
  if (relu) {
    const __m128 z = _mm_setzero_ps();
    a0 = _mm_max_ps(a0, z); a1 = _mm_max_ps(a1, z);
    a2 = _mm_max_ps(a2, z); a3 = _mm_max_ps(a3, z);
  }
  _mm_storeu_ps(out_row + (size_t)(ox0 + 0) * 4, a0);
  _mm_storeu_ps(out_row + (size_t)(ox0 + 1) * 4, a1);
  _mm_storeu_ps(out_row + (size_t)(ox0 + 2) * 4, a2);
  _mm_storeu_ps(out_row + (size_t)(ox0 + 3) * 4, a3);
}
#endif  // YF_HAVE_AVX2_FMA

template <int COUT_T>
inline void conv3x3_row_block(const float* row0, const float* kw,
                              const float* bs, float* out_row, int ox0, int mb,
                              int cin, int cout_rt, int stride,
                              int in_row_stride, bool relu) {
#ifdef YF_HAVE_AVX2_FMA
  if (mb == 4) {
    if (COUT_T == 8) {
      conv3x3_tile8_avx(row0, kw, bs, out_row, ox0, cin, stride,
                        in_row_stride, relu);
      return;
    }
    if (COUT_T == 4) {
      conv3x3_tile4_avx(row0, kw, bs, out_row, ox0, cin, stride,
                        in_row_stride, relu);
      return;
    }
  }
#elif defined(__aarch64__)
  if (mb == 4) {  // NEON twins (ops_neon.cpp), bitwise-equal value order
    if (COUT_T == 8) {
      conv3x3_tile8_neon(row0, kw, bs, out_row, ox0, cin, stride,
                         in_row_stride, relu);
      return;
    }
    if (COUT_T == 4) {
      conv3x3_tile4_neon(row0, kw, bs, out_row, ox0, cin, stride,
                         in_row_stride, relu);
      return;
    }
  }
#endif
  if (mb == 4)  // full block: both tile bounds compile-time -> registers
    conv3x3_block_body<COUT_T, 4>(row0, kw, bs, out_row, ox0, 4, cin, cout_rt,
                                  stride, in_row_stride, relu);
  else
    conv3x3_block_body<COUT_T, 0>(row0, kw, bs, out_row, ox0, mb, cin, cout_rt,
                                  stride, in_row_stride, relu);
}

// ---- row kernels shared by conv1x1 and the fused residual block

// 1x1 conv over a block of pixels with REGISTER accumulators: per output
// element the value order is bias + ascending c — identical to the old
// in-memory-accumulator formulation (so fused/unfused stay bitwise-equal)
// but without the store-to-load forwarding chain per input channel.
// MB_T pixels are processed concurrently for FMA-chain ILP.
template <int CIN_T, int COUT_T, int MB_T>
inline void pw_block(const float* __restrict x, int mb_rt, int cin_rt,
                     int cout_rt, const float* __restrict kw,
                     const float* __restrict bs, bool relu,
                     const float* __restrict add, float* __restrict y) {
  constexpr int MAXB = 8, MAXC = 256;
  const int cin = CIN_T ? CIN_T : cin_rt;
  const int cout = COUT_T ? COUT_T : cout_rt;
  const int mb = MB_T ? MB_T : mb_rt;
  float acc[MB_T ? MB_T : MAXB][COUT_T ? COUT_T : MAXC];
  for (int m = 0; m < mb; ++m)
    for (int o = 0; o < cout; ++o) acc[m][o] = bs[o];
  for (int c = 0; c < cin; ++c) {
    const float* wrow = kw + (size_t)c * cout;
    for (int m = 0; m < mb; ++m) {
      const float xv = x[(size_t)m * cin + c];
      for (int o = 0; o < cout; ++o) acc[m][o] += xv * wrow[o];
    }
  }
  for (int m = 0; m < mb; ++m) {
    float* ym = y + (size_t)m * cout;
    if (relu)
      for (int o = 0; o < cout; ++o) ym[o] = std::max(acc[m][o], 0.0f);
    else if (add) {
      const float* am = add + (size_t)m * cout;
      for (int o = 0; o < cout; ++o) ym[o] = acc[m][o] + am[o];
    } else
      for (int o = 0; o < cout; ++o) ym[o] = acc[m][o];
  }
}

// Row driver: full blocks run the all-compile-time body; the tail runs
// with a runtime pixel count.  Wide couts use fewer pixels per block so
// the accumulator tile stays within the 32 zmm registers.
template <int CIN_T, int COUT_T>
inline void pw_row(const float* x, int W, int cin_rt, int cout_rt,
                   const float* kw, const float* bs, bool relu,
                   const float* add, float* y) {
  const int cout = COUT_T ? COUT_T : cout_rt;
  const int cin = CIN_T ? CIN_T : cin_rt;
  constexpr int MB = COUT_T == 0 ? 4 : (COUT_T <= 32 ? 8 : (COUT_T <= 96 ? 4 : 2));
  int n0 = 0;
  for (; n0 + MB <= W; n0 += MB)
    pw_block<CIN_T, COUT_T, MB>(x + (size_t)n0 * cin, MB, cin_rt, cout_rt, kw,
                                bs, relu, add ? add + (size_t)n0 * cout : nullptr,
                                y + (size_t)n0 * cout);
  if (n0 < W)
    pw_block<CIN_T, COUT_T, 0>(x + (size_t)n0 * cin, W - n0, cin_rt, cout_rt,
                               kw, bs, relu,
                               add ? add + (size_t)n0 * cout : nullptr,
                               y + (size_t)n0 * cout);
}

// Depthwise 3x3 interior pixels of one row, all 9 taps in registers: per
// channel ONE accumulator takes bias + taps in ascending (dy,dx) order —
// the same value-order as the tap-sweep formulation, so results stay
// bitwise-equal, but without the store-to-load-forwarding round trip per
// tap that made the sweep version ~7x slower (measured 2.2 vs 15+ GMAC/s).
// __restrict + compile-time RELU let the channel loop vectorize.
template <bool RELU>
inline void dw3_interior(const float* __restrict r0, const float* __restrict r1,
                         const float* __restrict r2, const float* __restrict kw,
                         const float* __restrict bs, float* __restrict outrow,
                         int ox_lo, int ox_hi_excl, int stride, int pad, int C) {
  for (int ox = ox_lo; ox < ox_hi_excl; ++ox) {
    const size_t i0 = (size_t)(ox * stride - pad) * C;
    float* __restrict op = outrow + (size_t)ox * C;
    for (int c = 0; c < C; ++c) {
      float a = bs[c];
      a += r0[i0 + c] * kw[c];
      a += r0[i0 + C + c] * kw[C + c];
      a += r0[i0 + 2 * C + c] * kw[2 * C + c];
      a += r1[i0 + c] * kw[3 * C + c];
      a += r1[i0 + C + c] * kw[4 * C + c];
      a += r1[i0 + 2 * C + c] * kw[5 * C + c];
      a += r2[i0 + c] * kw[6 * C + c];
      a += r2[i0 + C + c] * kw[7 * C + c];
      a += r2[i0 + 2 * C + c] * kw[8 * C + c];
      op[c] = RELU ? std::max(a, 0.0f) : a;
    }
  }
}

// Depthwise 5x5 interior, same register-accumulator treatment.
template <bool RELU>
inline void dw5_interior(const float* __restrict base,
                         const float* __restrict kw, const float* __restrict bs,
                         float* __restrict outrow, int ox_lo, int ox_hi_excl,
                         int stride, int pad, int C, int irs) {
  for (int ox = ox_lo; ox < ox_hi_excl; ++ox) {
    const float* __restrict p = base + (size_t)(ox * stride - pad) * C;
    float* __restrict op = outrow + (size_t)ox * C;
    for (int c = 0; c < C; ++c) {
      float a = bs[c];
      for (int dy = 0; dy < 5; ++dy)
        for (int dx = 0; dx < 5; ++dx)
          a += p[(size_t)dy * irs + (size_t)dx * C + c] *
               kw[((size_t)dy * 5 + dx) * C + c];
      op[c] = RELU ? std::max(a, 0.0f) : a;
    }
  }
}

// Depthwise 3x3 over one row given the three input rows (null at image
// borders).  Tap order (dy,dx ascending, OOB skipped) matches dw_pixel;
// the all-rows-valid case runs the register-accumulator kernel (same
// value order, bitwise-equal — locked by yf_fused_check).
template <int C_T>
inline void dw3_row(const float* rows[3], int W, int c_rt, const float* kw,
                    const float* bs, float* y) {
  const int C = C_T ? C_T : c_rt;
  auto edge_pixel = [&](int x) {
    float* op = y + (size_t)x * C;
    for (int c = 0; c < C; ++c) op[c] = bs[c];
    for (int dy = 0; dy < 3; ++dy) {
      const float* row = rows[dy];
      if (!row) continue;
      for (int dx = 0; dx < 3; ++dx) {
        const int ix = x - 1 + dx;
        if (ix < 0 || ix >= W) continue;
        const float* ip = row + (size_t)ix * C;
        const float* kp = kw + ((size_t)dy * 3 + dx) * C;
        for (int c = 0; c < C; ++c) op[c] += ip[c] * kp[c];
      }
    }
    for (int c = 0; c < C; ++c) op[c] = std::max(op[c], 0.0f);  // ReLU
  };
  edge_pixel(0);
  if (W > 1) edge_pixel(W - 1);
  if (rows[0] && rows[1] && rows[2]) {  // interior rows: register path
    dw3_interior<true>(rows[0], rows[1], rows[2], kw, bs, y, 1, W - 1,
                       /*stride=*/1, /*pad=*/1, C);
    return;
  }
  for (int x = 1; x < W - 1; ++x) {  // border rows: tap sweep, OOB skipped
    float* op = y + (size_t)x * C;
    for (int c = 0; c < C; ++c) op[c] = bs[c];
    for (int dy = 0; dy < 3; ++dy) {
      const float* row = rows[dy];
      if (!row) continue;
      const float* pm = row + (size_t)(x - 1) * C;
      const float* kp = kw + (size_t)dy * 3 * C;
      for (int c = 0; c < C; ++c) op[c] += pm[c] * kp[c];
      for (int c = 0; c < C; ++c) op[c] += pm[C + c] * kp[C + c];
      for (int c = 0; c < C; ++c) op[c] += pm[2 * C + c] * kp[2 * C + c];
    }
    for (int c = 0; c < C; ++c) op[c] = std::max(op[c], 0.0f);
  }
}

// 1x1 stride-1 conv: pw_row over pixel chunks — ONE kernel body (MB=8
// pixel blocking, bias + ascending-c saxpy) serves both the standalone and
// fused paths, keeping their bitwise-parity contract in a single place.
// The 1x1 convs carry ~90% of the network's FLOPs.
void conv1x1(const Tensor& in, const float* W, const float* bias, Tensor& out,
             bool relu) {
  const int cin = in.c, cout = out.c;
  const int N = in.h * in.w;
  const float* X = in.data.data();
  float* Y = out.data.data();
  if (cout > 256)  // bound of pw_block's runtime accumulator tile
    throw std::runtime_error("conv1x1: cout > 256 unsupported");
  constexpr int CHUNK = 1024;  // pixels per OpenMP task
#pragma omp parallel for schedule(static)
  for (int n0 = 0; n0 < N; n0 += CHUNK) {
    const int nb = std::min(CHUNK, N - n0);
    const float* Xb = X + (size_t)n0 * cin;
    float* Yb = Y + (size_t)n0 * cout;
    switch (cout) {  // compile-time cout -> register accumulator tiles
      case 4:  pw_row<0, 4>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      case 8:  pw_row<0, 8>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      case 16: pw_row<0, 16>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      case 24: pw_row<0, 24>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      case 48: pw_row<0, 48>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      case 96: pw_row<0, 96>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb); break;
      default: pw_row<0, 0>(Xb, nb, cin, cout, W, bias, relu, nullptr, Yb);
    }
  }
}
}  // namespace

// Fused residual block: y = x + conv1x1(dw3x3(conv1x1(x, relu), relu)).
// 59% of the network's runtime was res blocks (memory- and loop-overhead-
// bound on a single core), so the two intermediates stay in a 3-row ring
// buffer (L1/L2-resident) instead of round-tripping through RAM, and the
// known channel triples dispatch to fully-unrolled template instances.
// Every per-element reduction order matches the unfused ops, so outputs
// are bitwise-identical (locked by tests/test_native.py + yf_check).
namespace {
template <int CIN, int CMID, int COUT>
void fused_rows(const Tensor& x, Tensor& out, int cin, int cmid, int cout,
                const float* kw1, const float* bs1, const float* kw2,
                const float* bs2, const float* kw3, const float* bs3,
                bool residual) {
  const int H = x.h, W = x.w;
  const size_t row_mid = (size_t)W * cmid;
#pragma omp parallel
  {
#ifdef _OPENMP
    const int nt = omp_get_num_threads(), tid = omp_get_thread_num();
#else
    const int nt = 1, tid = 0;
#endif
    const int chunk = (H + nt - 1) / nt;
    const int r0 = tid * chunk, r1 = std::min(H, r0 + chunk);
    if (r0 < r1) {
      std::vector<float> ring(3 * row_mid), mid(row_mid);
      auto slot = [&](int r) {
        return ring.data() + (size_t)(r % 3) * row_mid;
      };
      // prime the ring with conv1 rows r0-1 (halo) and r0
      for (int q = std::max(r0 - 1, 0); q <= r0; ++q)
        pw_row<CIN, CMID>(x.at(q, 0), W, cin, cmid, kw1, bs1, true, nullptr,
                          slot(q));
      for (int r = r0; r < r1; ++r) {
        if (r + 1 < H)
          pw_row<CIN, CMID>(x.at(r + 1, 0), W, cin, cmid, kw1, bs1, true,
                            nullptr, slot(r + 1));
        const float* rows[3] = {
            r > 0 ? slot(r - 1) : nullptr,
            slot(r),
            r + 1 < H ? slot(r + 1) : nullptr,
        };
        dw3_row<CMID>(rows, W, cmid, kw2, bs2, mid.data());
        pw_row<CMID, COUT>(mid.data(), W, cmid, cout, kw3, bs3, false,
                           residual ? x.at(r, 0) : nullptr, out.at(r, 0));
      }
    }
  }
}
}  // namespace

Tensor fused_res_block(const Tensor& x, const NamedTensor& k1,
                       const NamedTensor& b1, const NamedTensor& k2,
                       const NamedTensor& b2, const NamedTensor& k3,
                       const NamedTensor& b3, bool residual) {
  const int H = x.h, W = x.w, cin = x.c;
  const int cmid = (int)k1.shape[3];
  const int cout = (int)k3.shape[3];
  (void)H;
  if ((int)k1.shape[0] != 1 || (int)k1.shape[1] != 1 ||
      (int)k1.shape[2] != cin || (int)k2.shape[0] != 3 ||
      (int)k2.shape[1] != 3 || (int)k2.shape[2] != 1 ||
      (int)k2.shape[3] != cmid || (int)k3.shape[0] != 1 ||
      (int)k3.shape[1] != 1 || (int)k3.shape[2] != cmid ||
      (residual && cout != cin) ||
      b1.f32.size() != (size_t)cmid || b2.f32.size() != (size_t)cmid ||
      b3.f32.size() != (size_t)cout)
    throw std::runtime_error("fused_res_block shape mismatch");
  if (cmid > 256 || cout > 256)  // bound of pw_block's runtime tile
    throw std::runtime_error("fused_res_block: channels > 256 unsupported");
  Tensor out(x.h, W, cout);
  const float* kw1 = k1.f32.data();
  const float* kw2 = k2.f32.data();
  const float* kw3 = k3.f32.data();
  const float* bs1 = b1.f32.data();
  const float* bs2 = b2.f32.data();
  const float* bs3 = b3.f32.data();

  // Known channel triples (YOLO-Fastest stages + the two fused chains)
  // dispatch to fully-unrolled instances; anything else runs the generic
  // runtime version.
  const long key = (long)cin * 1000000 + cmid * 1000 + cout;
  switch (key) {
    case   4008004: fused_rows<4, 8, 4>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case   8008004: fused_rows<8, 8, 4>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case   8032008: fused_rows<8, 32, 8>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case   8048008: fused_rows<8, 48, 8>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case   8048016: fused_rows<8, 48, 16>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case  16096016: fused_rows<16, 96, 16>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case  24136024: fused_rows<24, 136, 24>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    case  48224048: fused_rows<48, 224, 48>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual); break;
    default: fused_rows<0, 0, 0>(x, out, cin, cmid, cout, kw1, bs1, kw2, bs2, kw3, bs3, residual);
  }
  return out;
}

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
    // Border pixels: accumulate into a LOCAL buffer (no aliasing with the
    // output tensor, so each tap sweep vectorizes) in the same bias +
    // ascending (dy,dx) order, OOB taps skipped.  The 5x5 layers run at
    // 16x20 where 40% of pixels are borders — the old
    // accumulate-into-output formulation was the per-layer profile's
    // hottest fp32 item after the register-tile sweep.
    constexpr int MAXDWC = 256;
    auto dw_pixel = [&](int oy, int ox) {
      float* __restrict op = out.at(oy, ox);
      float buf[MAXDWC];
      float* __restrict acc = cout <= MAXDWC ? buf : op;
      for (int c = 0; c < cout; ++c) acc[c] = bs[c];
      const int iy0 = oy * stride - pad, ix0 = ox * stride - pad;
      for (int dy = 0; dy < k; ++dy) {
        const int iy = iy0 + dy;
        if (iy < 0 || iy >= in.h) continue;
        for (int dx = 0; dx < k; ++dx) {
          const int ix = ix0 + dx;
          if (ix < 0 || ix >= in.w) continue;
          const float* __restrict ip = in.at(iy, ix);
          const float* __restrict kp = kw + ((size_t)dy * k + dx) * cout;  // (dy,dx,0,:)
          for (int c = 0; c < cout; ++c) acc[c] += ip[c] * kp[c];
        }
      }
      if (relu)
        for (int c = 0; c < cout; ++c) op[c] = std::max(acc[c], 0.0f);
      else if (acc != op)
        for (int c = 0; c < cout; ++c) op[c] = acc[c];
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
        float* outrow = out.at(oy, 0);
        if (k == 3) {
          if (relu)
            dw3_interior<true>(base, base + irs, base + 2 * irs, kw, bs,
                               outrow, ox_lo, ox_hi_excl, stride, pad, C);
          else
            dw3_interior<false>(base, base + irs, base + 2 * irs, kw, bs,
                                outrow, ox_lo, ox_hi_excl, stride, pad, C);
        } else {  // k == 5
          if (relu)
            dw5_interior<true>(base, kw, bs, outrow, ox_lo, ox_hi_excl,
                               stride, pad, C, irs);
          else
            dw5_interior<false>(base, kw, bs, outrow, ox_lo, ox_hi_excl,
                                stride, pad, C, irs);
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
          case 4:
            conv3x3_row_block<4>(row0, kw, bs, out_row, ox0, mb, cin, cout,
                                 stride, in_row_stride, relu);
            break;
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

}  // namespace yf
