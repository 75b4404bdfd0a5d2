// int8 1x1-conv kernels (see include/yf/int8.h for the contract).
//
// Layout: activations are quantised per 8-pixel block into a u8 buffer
// padded to cin4; the GEMM walks weight blocks of 16 outputs x 4 inputs
// (one 64-byte vector) and accumulates 8 pixels per weight load — 8
// independent dpbusd chains keep the VNNI units throughput-bound (a
// 4-chain version measured latency-bound).  The epilogue (offset removal,
// float rescale, bias, optional residual add, ReLU) is fused per
// 16-output vector.  Quantisation is vectorised (cvtps_epi32 rounds
// nearest-even, exactly like the scalar lrintf path).  The scalar
// fallback reproduces the arithmetic bit-for-bit, so results are
// identical across hosts — locked by runner/int8_check.cpp.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <stdexcept>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

#include "yf/int8.h"
#include "yf/neon.h"

namespace yf {

bool cpu_supports_int8_fast() {
#if defined(__x86_64__)
  return __builtin_cpu_supports("avx512f") &&
         __builtin_cpu_supports("avx512bw") &&
         __builtin_cpu_supports("avx512vl") &&
         __builtin_cpu_supports("avx512vnni");
#elif defined(__aarch64__)
  return true;  // NEON int8 kernels (ops_neon.cpp) — baseline ARMv8.0
#else
  return false;
#endif
}

Int8Conv1x1 pack_int8_conv1x1(const NamedTensor& kernel_q,
                              const NamedTensor& w_scale,
                              const NamedTensor& bias, float act_scale) {
  if (kernel_q.shape.size() != 4 || kernel_q.shape[0] != 1 ||
      kernel_q.shape[1] != 1 || kernel_q.is_f32)
    throw std::runtime_error("pack_int8_conv1x1: need a (1,1,Cin,Cout) int8 kernel");
  Int8Conv1x1 L;
  L.cin = (int)kernel_q.shape[2];
  L.cout = (int)kernel_q.shape[3];
  if ((int)w_scale.f32.size() != L.cout || (int)bias.f32.size() != L.cout)
    throw std::runtime_error("pack_int8_conv1x1: scale/bias size mismatch");
  L.cin4 = (L.cin + 3) & ~3;
  L.cout16 = (L.cout + 15) & ~15;
  L.sx = act_scale;
  const int8_t* kq = kernel_q.i8.data();

  L.packed.assign((size_t)L.cout16 * L.cin4, 0);
  const int nc4 = L.cin4 / 4;
  for (int c = 0; c < L.cin; ++c)
    for (int o = 0; o < L.cout; ++o)
      L.packed[(((size_t)(o / 16) * nc4 + c / 4) * 16 + o % 16) * 4 + c % 4] =
          kq[(size_t)c * L.cout + o];

  L.colsum128.assign(L.cout16, 0);
  L.scale.assign(L.cout16, 0.0f);
  L.bias.assign(L.cout16, 0.0f);
  for (int o = 0; o < L.cout; ++o) {
    int32_t s = 0;
    for (int c = 0; c < L.cin; ++c) s += kq[(size_t)c * L.cout + o];
    L.colsum128[o] = 128 * s;
    L.scale[o] = act_scale * w_scale.f32[o];
    L.bias[o] = bias.f32[o];
  }
  return L;
}

Int8Conv1x1 pack_int8_conv3x3(const NamedTensor& kernel_q,
                              const NamedTensor& w_scale,
                              const NamedTensor& bias, float act_scale) {
  if (kernel_q.shape.size() != 4 || kernel_q.shape[0] != 3 ||
      kernel_q.shape[1] != 3 || kernel_q.is_f32)
    throw std::runtime_error("pack_int8_conv3x3: need a (3,3,Cin,Cout) int8 kernel");
  // Re-express as a (1,1,9*Cin,Cout) kernel: HWIO already stores taps in
  // ascending (dy,dx,c) row-major order, exactly the order conv3x3_int8
  // gathers input rows in — so the flatten is a pure reinterpretation.
  NamedTensor flat;
  flat.shape = {1, 1, 9 * kernel_q.shape[2], kernel_q.shape[3]};
  flat.is_f32 = false;
  flat.i8 = kernel_q.i8;
  return pack_int8_conv1x1(flat, w_scale, bias, act_scale);
}

namespace {

constexpr int MB = 8;  // pixels per GEMM block (8 dpbusd chains)

// u8 quantisation of `mb` pixels: s8 = clip(round(x * (1/sx)), -127, 127)
// + 128, zero channels (= byte 128) in the cin..cin4 pad.  lrintf rounds
// to nearest-even (default FP env), matching both the vector kernel's
// cvtps_epi32 and jnp.round in the JAX executor.
void quantize_block_scalar(const float* x, int mb, int cin, int cin4,
                           float inv_sx, uint8_t* out) {
  for (int m = 0; m < mb; ++m) {
    const float* xp = x + (size_t)m * cin;
    uint8_t* op = out + (size_t)m * cin4;
    int c = 0;
    for (; c < cin; ++c) {
      int q = (int)lrintf(xp[c] * inv_sx);
      q = q < -127 ? -127 : (q > 127 ? 127 : q);
      op[c] = (uint8_t)(q + 128);
    }
    for (; c < cin4; ++c) op[c] = 128;
  }
}

// Exact scalar twin of the VNNI kernel (same int32 accumulation, same
// float epilogue op order: fma(acc_f, scale, bias) -> +add -> relu).
void gemm_block_scalar(const uint8_t* xq, int mb, const Int8Conv1x1& L,
                       bool relu, const float* add, float* Y) {
  const int nc4 = L.cin4 / 4;
  for (int ob = 0; ob < L.cout16 / 16; ++ob) {
    const int8_t* wb = L.packed.data() + (size_t)ob * nc4 * 64;
    const int o0 = 16 * ob;
    const int on = std::min(16, L.cout - o0);
    for (int m = 0; m < mb; ++m) {
      const uint8_t* xp = xq + (size_t)m * L.cin4;
      for (int oi = 0; oi < on; ++oi) {
        int32_t acc = 0;
        for (int c4 = 0; c4 < nc4; ++c4) {
          const int8_t* wp = wb + ((size_t)c4 * 16 + oi) * 4;
          for (int b = 0; b < 4; ++b)
            acc += (int32_t)xp[4 * c4 + b] * wp[b];
        }
        const int o = o0 + oi;
        float f = std::fma((float)(acc - L.colsum128[o]), L.scale[o], L.bias[o]);
        if (add) f += add[(size_t)m * L.cout + o];
        if (relu) f = std::max(f, 0.0f);
        Y[(size_t)m * L.cout + o] = f;
      }
    }
  }
}

#if defined(__x86_64__)
__attribute__((target("avx512f,avx512bw,avx512vl,avx512vnni")))
void quantize_block_vnni(const float* x, int mb, int cin, int cin4,
                         float inv_sx, uint8_t* out) {
  const __m512 inv = _mm512_set1_ps(inv_sx);
  const __m512i lo = _mm512_set1_epi32(-127), hi = _mm512_set1_epi32(127);
  const __m512i off = _mm512_set1_epi32(128);
  for (int m = 0; m < mb; ++m) {
    const float* xp = x + (size_t)m * cin;
    uint8_t* op = out + (size_t)m * cin4;
    for (int c = 0; c < cin; c += 16) {
      const __mmask16 k =
          cin - c >= 16 ? (__mmask16)0xFFFF : (__mmask16)((1u << (cin - c)) - 1);
      const __m512 v = _mm512_maskz_loadu_ps(k, xp + c);
      __m512i q = _mm512_cvtps_epi32(_mm512_mul_ps(v, inv));  // nearest-even
      q = _mm512_add_epi32(_mm512_min_epi32(_mm512_max_epi32(q, lo), hi), off);
      _mm_mask_storeu_epi8(op + c, k, _mm512_cvtepi32_epi8(q));
    }
    for (int c = cin; c < cin4; ++c) op[c] = 128;
  }
}

__attribute__((target("avx512f,avx512bw,avx512vl,avx512vnni")))
void gemm_block_vnni(const uint8_t* xq, int mb, const Int8Conv1x1& L,
                     bool relu, const float* add, float* Y) {
  const int nc4 = L.cin4 / 4;
  for (int ob = 0; ob < L.cout16 / 16; ++ob) {
    const int8_t* wb = L.packed.data() + (size_t)ob * nc4 * 64;
    __m512i acc[MB];
    for (int m = 0; m < mb; ++m) acc[m] = _mm512_setzero_si512();
    if (mb == MB) {  // full block: 8 chains, unrolled hot path
      for (int c4 = 0; c4 < nc4; ++c4) {
        const __m512i w = _mm512_loadu_si512(wb + (size_t)c4 * 64);
        const uint8_t* xc = xq + 4 * c4;
#define YF_DP(m) \
  acc[m] = _mm512_dpbusd_epi32( \
      acc[m], _mm512_set1_epi32(*(const int32_t*)(const void*)(xc + (m) * (size_t)L.cin4)), w)
        YF_DP(0); YF_DP(1); YF_DP(2); YF_DP(3);
        YF_DP(4); YF_DP(5); YF_DP(6); YF_DP(7);
#undef YF_DP
      }
    } else {
      for (int c4 = 0; c4 < nc4; ++c4) {
        const __m512i w = _mm512_loadu_si512(wb + (size_t)c4 * 64);
        for (int m = 0; m < mb; ++m) {
          const __m512i a = _mm512_set1_epi32(
              *(const int32_t*)(const void*)(xq + (size_t)m * L.cin4 + 4 * c4));
          acc[m] = _mm512_dpbusd_epi32(acc[m], a, w);
        }
      }
    }
    const int o0 = 16 * ob;
    const int rem = L.cout - o0;
    const __mmask16 mask =
        rem >= 16 ? (__mmask16)0xFFFF : (__mmask16)((1u << rem) - 1);
    const __m512i cs = _mm512_loadu_si512(L.colsum128.data() + o0);
    const __m512 sc = _mm512_loadu_ps(L.scale.data() + o0);
    const __m512 bi = _mm512_loadu_ps(L.bias.data() + o0);
    for (int m = 0; m < mb; ++m) {
      __m512 f = _mm512_cvtepi32_ps(_mm512_sub_epi32(acc[m], cs));
      f = _mm512_fmadd_ps(f, sc, bi);
      if (add)
        f = _mm512_add_ps(
            f, _mm512_maskz_loadu_ps(mask, add + (size_t)m * L.cout + o0));
      if (relu) f = _mm512_max_ps(f, _mm512_setzero_ps());
      _mm512_mask_storeu_ps(Y + (size_t)m * L.cout + o0, mask, f);
    }
  }
}
#endif

using QuantFn = void (*)(const float*, int, int, int, float, uint8_t*);
using GemmFn = void (*)(const uint8_t*, int, const Int8Conv1x1&, bool,
                        const float*, float*);

struct Kernels {
  QuantFn quant;
  GemmFn gemm;
};

Kernels pick_kernels() {
#if defined(__x86_64__)
  if (cpu_supports_int8_fast()) return {quantize_block_vnni, gemm_block_vnni};
#elif defined(__aarch64__)
  return {quantize_block_neon, gemm_block_neon};
#endif
  return {quantize_block_scalar, gemm_block_scalar};
}

}  // namespace

namespace {
// Small-run copy that inlines to word moves: the im2row gather issues three
// ~cin-byte copies per output pixel, and a libc memcpy CALL per copy
// measured ~2x the whole conv at the larger resolutions.
inline void copy_bytes(uint8_t* __restrict dst, const uint8_t* __restrict src,
                       int n) {
  int i = 0;
  for (; i + 8 <= n; i += 8) std::memcpy(dst + i, src + i, 8);  // one mov
  for (; i < n; ++i) dst[i] = src[i];
}
}  // namespace

Tensor conv3x3_int8(const Tensor& x, const Int8Conv1x1& L, int stride,
                    bool relu) {
  const int cin = L.cin / 9;
  if (L.cin != 9 * cin || x.c != cin)
    throw std::runtime_error("conv3x3_int8: channel mismatch");
  if (L.cin4 > 512)
    throw std::runtime_error("conv3x3_int8: tap vector too large");
  static const Kernels k = pick_kernels();
  const int oh = (x.h + 2 - 3) / stride + 1;
  const int ow = (x.w + 2 - 3) / stride + 1;
  Tensor out(oh, ow, L.cout);
  const float inv_sx = 1.0f / L.sx;
  const int row3 = 3 * cin;

  // one quantisation pass over the whole input (no per-pixel padding:
  // cin4 == cin here)
  std::vector<uint8_t> xq_full((size_t)x.h * x.w * cin);
  const int N = x.h * x.w;
  constexpr int QCHUNK = 4096;
#pragma omp parallel for schedule(static)
  for (int n0 = 0; n0 < N; n0 += QCHUNK) {
    const int nb = std::min(QCHUNK, N - n0);
    k.quant(x.data.data() + (size_t)n0 * cin, nb, cin, cin, inv_sx,
            xq_full.data() + (size_t)n0 * cin);
  }

  // im2row gather per MB-pixel block: each pixel's GEMM row is its 9 taps
  // in (dy,dx,c) order; OOB taps take the zero-point byte 128, which the
  // column-sum correction cancels exactly (contribution 0).
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < oh; ++oy) {
    alignas(64) uint8_t rows[MB * 512];
    float* orow = out.at(oy, 0);
    const int iy0 = oy * stride - 1;
    for (int ox0 = 0; ox0 < ow; ox0 += MB) {
      const int mb = std::min(MB, ow - ox0);
      for (int m = 0; m < mb; ++m) {
        uint8_t* rp = rows + (size_t)m * L.cin4;
        const int ix0 = (ox0 + m) * stride - 1;
        for (int dy = 0; dy < 3; ++dy) {
          const int iy = iy0 + dy;
          uint8_t* dst = rp + (size_t)dy * row3;
          if (iy < 0 || iy >= x.h) {
            std::memset(dst, 128, row3);
            continue;
          }
          const uint8_t* src = xq_full.data() + (size_t)iy * x.w * cin;
          if (ix0 >= 0 && ix0 + 3 <= x.w) {  // interior: one contiguous copy
            copy_bytes(dst, src + (size_t)ix0 * cin, row3);
          } else {
            for (int dx = 0; dx < 3; ++dx) {
              const int ix = ix0 + dx;
              if (ix < 0 || ix >= x.w)
                std::memset(dst + (size_t)dx * cin, 128, cin);
              else
                copy_bytes(dst + (size_t)dx * cin, src + (size_t)ix * cin, cin);
            }
          }
        }
        std::memset(rp + 9 * cin, 128, L.cin4 - 9 * cin);  // tap pad
      }
      k.gemm(rows, mb, L, relu, nullptr, orow + (size_t)ox0 * L.cout);
    }
  }
  return out;
}

Tensor conv1x1_int8(const Tensor& x, const Int8Conv1x1& L, bool relu,
                    const Tensor* add) {
  if (x.c != L.cin) throw std::runtime_error("conv1x1_int8: cin mismatch");
  if (add && add->c != L.cout)
    throw std::runtime_error("conv1x1_int8: residual channel mismatch");
  if (L.cin4 > 512)  // bound of the per-thread quantisation buffer below
    throw std::runtime_error("conv1x1_int8: cin too large");
  static const Kernels k = pick_kernels();
  Tensor out(x.h, x.w, L.cout);
  const int N = x.h * x.w;
  const float inv_sx = 1.0f / L.sx;
  const float* X = x.data.data();
  const float* A = add ? add->data.data() : nullptr;
  float* Y = out.data.data();
  constexpr int CHUNK = 512;  // pixels per OpenMP task
#pragma omp parallel for schedule(static)
  for (int n0 = 0; n0 < N; n0 += CHUNK) {
    const int nb = std::min(CHUNK, N - n0);
    alignas(64) uint8_t xq[MB * 512];
    for (int p = 0; p < nb; p += MB) {
      const int mb = std::min(MB, nb - p);
      k.quant(X + (size_t)(n0 + p) * L.cin, mb, L.cin, L.cin4, inv_sx, xq);
      k.gemm(xq, mb, L, relu, A ? A + (size_t)(n0 + p) * L.cout : nullptr,
             Y + (size_t)(n0 + p) * L.cout);
    }
  }
  return out;
}

}  // namespace yf
