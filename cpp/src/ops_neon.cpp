// ARM NEON kernels (see include/yf/neon.h for the contract and the
// bitwise-parity story).  Compiled on aarch64, or on x86 with YF_NEON_SIM
// through the scalar shim (src/neon_compat.h) for verification.

#include "yf/neon.h"

#ifdef YF_HAVE_NEON_KERNELS

#include <algorithm>
#include <cmath>

#include "neon_compat.h"

namespace yf {

// ------------------------------------------------------------- fp32 tiles
//
// Same value order as the scalar/AVX tiles: acc starts at bias, taps
// accumulate in ascending (dy, dx, c) with FUSED multiply-adds — each
// output lane is one fma chain, so the result is bitwise equal to the
// scalar twin built from std::fma in the same order.

void conv3x3_tile8_neon(const float* __restrict row0,
                        const float* __restrict kw,
                        const float* __restrict bs,
                        float* __restrict out_row, int ox0, int cin,
                        int stride, int irs, bool relu) {
  const float32x4_t blo = vld1q_f32(bs), bhi = vld1q_f32(bs + 4);
  float32x4_t a0l = blo, a0h = bhi, a1l = blo, a1h = bhi;
  float32x4_t a2l = blo, a2h = bhi, a3l = blo, a3h = bhi;
  for (int dy = 0; dy < 3; ++dy) {
    const float* row = row0 + (size_t)dy * irs;
    for (int dx = 0; dx < 3; ++dx) {
      const float* kp = kw + (((size_t)dy * 3 + dx) * cin) * 8;
      const float* p0 = row + (size_t)((ox0 + 0) * stride - 1 + dx) * cin;
      const float* p1 = row + (size_t)((ox0 + 1) * stride - 1 + dx) * cin;
      const float* p2 = row + (size_t)((ox0 + 2) * stride - 1 + dx) * cin;
      const float* p3 = row + (size_t)((ox0 + 3) * stride - 1 + dx) * cin;
      for (int c = 0; c < cin; ++c) {
        const float32x4_t klo = vld1q_f32(kp + (size_t)c * 8);
        const float32x4_t khi = vld1q_f32(kp + (size_t)c * 8 + 4);
        const float32x4_t v0 = vdupq_n_f32(p0[c]);
        const float32x4_t v1 = vdupq_n_f32(p1[c]);
        const float32x4_t v2 = vdupq_n_f32(p2[c]);
        const float32x4_t v3 = vdupq_n_f32(p3[c]);
        a0l = vfmaq_f32(a0l, v0, klo); a0h = vfmaq_f32(a0h, v0, khi);
        a1l = vfmaq_f32(a1l, v1, klo); a1h = vfmaq_f32(a1h, v1, khi);
        a2l = vfmaq_f32(a2l, v2, klo); a2h = vfmaq_f32(a2h, v2, khi);
        a3l = vfmaq_f32(a3l, v3, klo); a3h = vfmaq_f32(a3h, v3, khi);
      }
    }
  }
  if (relu) {
    const float32x4_t z = vdupq_n_f32(0.0f);
    a0l = vmaxq_f32(a0l, z); a0h = vmaxq_f32(a0h, z);
    a1l = vmaxq_f32(a1l, z); a1h = vmaxq_f32(a1h, z);
    a2l = vmaxq_f32(a2l, z); a2h = vmaxq_f32(a2h, z);
    a3l = vmaxq_f32(a3l, z); a3h = vmaxq_f32(a3h, z);
  }
  vst1q_f32(out_row + (size_t)(ox0 + 0) * 8, a0l);
  vst1q_f32(out_row + (size_t)(ox0 + 0) * 8 + 4, a0h);
  vst1q_f32(out_row + (size_t)(ox0 + 1) * 8, a1l);
  vst1q_f32(out_row + (size_t)(ox0 + 1) * 8 + 4, a1h);
  vst1q_f32(out_row + (size_t)(ox0 + 2) * 8, a2l);
  vst1q_f32(out_row + (size_t)(ox0 + 2) * 8 + 4, a2h);
  vst1q_f32(out_row + (size_t)(ox0 + 3) * 8, a3l);
  vst1q_f32(out_row + (size_t)(ox0 + 3) * 8 + 4, a3h);
}

void conv3x3_tile4_neon(const float* __restrict row0,
                        const float* __restrict kw,
                        const float* __restrict bs,
                        float* __restrict out_row, int ox0, int cin,
                        int stride, int irs, bool relu) {
  const float32x4_t bv = vld1q_f32(bs);
  float32x4_t a0 = bv, a1 = bv, a2 = bv, a3 = bv;
  for (int dy = 0; dy < 3; ++dy) {
    const float* row = row0 + (size_t)dy * irs;
    for (int dx = 0; dx < 3; ++dx) {
      const float* kp = kw + (((size_t)dy * 3 + dx) * cin) * 4;
      const float* p0 = row + (size_t)((ox0 + 0) * stride - 1 + dx) * cin;
      const float* p1 = row + (size_t)((ox0 + 1) * stride - 1 + dx) * cin;
      const float* p2 = row + (size_t)((ox0 + 2) * stride - 1 + dx) * cin;
      const float* p3 = row + (size_t)((ox0 + 3) * stride - 1 + dx) * cin;
      for (int c = 0; c < cin; ++c) {
        const float32x4_t k4 = vld1q_f32(kp + (size_t)c * 4);
        a0 = vfmaq_f32(a0, vdupq_n_f32(p0[c]), k4);
        a1 = vfmaq_f32(a1, vdupq_n_f32(p1[c]), k4);
        a2 = vfmaq_f32(a2, vdupq_n_f32(p2[c]), k4);
        a3 = vfmaq_f32(a3, vdupq_n_f32(p3[c]), k4);
      }
    }
  }
  if (relu) {
    const float32x4_t z = vdupq_n_f32(0.0f);
    a0 = vmaxq_f32(a0, z); a1 = vmaxq_f32(a1, z);
    a2 = vmaxq_f32(a2, z); a3 = vmaxq_f32(a3, z);
  }
  vst1q_f32(out_row + (size_t)(ox0 + 0) * 4, a0);
  vst1q_f32(out_row + (size_t)(ox0 + 1) * 4, a1);
  vst1q_f32(out_row + (size_t)(ox0 + 2) * 4, a2);
  vst1q_f32(out_row + (size_t)(ox0 + 3) * 4, a3);
}

// --------------------------------------------------------------- int8 pair

void quantize_block_neon(const float* x, int mb, int cin, int cin4,
                         float inv_sx, uint8_t* out) {
  const float32x4_t inv = vdupq_n_f32(inv_sx);
  const int32x4_t lo = vdupq_n_s32(-127), hi = vdupq_n_s32(127);
  const int32x4_t off = vdupq_n_s32(128);
  for (int m = 0; m < mb; ++m) {
    const float* xp = x + (size_t)m * cin;
    uint8_t* op = out + (size_t)m * cin4;
    int c = 0;
    for (; c + 8 <= cin; c += 8) {
      // vcvtnq rounds nearest-even, exactly the scalar twin's lrintf
      int32x4_t q0 = vcvtnq_s32_f32(vmulq_f32(vld1q_f32(xp + c), inv));
      int32x4_t q1 = vcvtnq_s32_f32(vmulq_f32(vld1q_f32(xp + c + 4), inv));
      q0 = vaddq_s32(vminq_s32(vmaxq_s32(q0, lo), hi), off);
      q1 = vaddq_s32(vminq_s32(vmaxq_s32(q1, lo), hi), off);
      const int16x8_t q16 = vcombine_s16(vmovn_s32(q0), vmovn_s32(q1));
      vst1_u8(op + c, vmovn_u16(vreinterpretq_u16_s16(q16)));
    }
    for (; c < cin; ++c) {  // tail: identical to the scalar twin
      int q = (int)lrintf(xp[c] * inv_sx);
      q = q < -127 ? -127 : (q > 127 ? 127 : q);
      op[c] = (uint8_t)(q + 128);
    }
    for (; c < cin4; ++c) op[c] = 128;
  }
}

namespace {

// dot of one 16-byte weight group (4 outputs x 4 inputs, output-major)
// with 4 input bytes broadcast across the register: products fit in s16
// (|255 * 127| = 32385 < 2^15), pairwise-long adds give the exact int32
// 4-tap sums -> [o0, o1, o2, o3].
inline int32x4_t dot4x4(int8x16_t w, int16x8_t xx) {
  const int16x8_t pl = vmulq_s16(vmovl_s8(vget_low_s8(w)), xx);
  const int16x8_t ph = vmulq_s16(vmovl_s8(vget_high_s8(w)), xx);
  return vpaddq_s32(vpaddlq_s16(pl), vpaddlq_s16(ph));
}

inline int16x8_t broadcast4_u8(const uint8_t* p) {
  uint32_t word;
  __builtin_memcpy(&word, p, 4);
  return vreinterpretq_s16_u16(vmovl_u8(vreinterpret_u8_u32(vdup_n_u32(word))));
}

}  // namespace

void gemm_block_neon(const uint8_t* xq, int mb, const Int8Conv1x1& L,
                     bool relu, const float* add, float* Y) {
  const int nc4 = L.cin4 / 4;
  for (int ob = 0; ob < L.cout16 / 16; ++ob) {
    const int8_t* wb = L.packed.data() + (size_t)ob * nc4 * 64;
    const int o0 = 16 * ob;
    const int on = std::min(16, L.cout - o0);
    for (int m = 0; m < mb; ++m) {
      const uint8_t* xp = xq + (size_t)m * L.cin4;
      int32x4_t acc0 = vdupq_n_s32(0), acc1 = vdupq_n_s32(0);
      int32x4_t acc2 = vdupq_n_s32(0), acc3 = vdupq_n_s32(0);
      for (int c4 = 0; c4 < nc4; ++c4) {
        const int16x8_t xx = broadcast4_u8(xp + 4 * c4);
        const int8_t* wp = wb + (size_t)c4 * 64;
        acc0 = vaddq_s32(acc0, dot4x4(vld1q_s8(wp), xx));
        acc1 = vaddq_s32(acc1, dot4x4(vld1q_s8(wp + 16), xx));
        acc2 = vaddq_s32(acc2, dot4x4(vld1q_s8(wp + 32), xx));
        acc3 = vaddq_s32(acc3, dot4x4(vld1q_s8(wp + 48), xx));
      }
      int32x4_t accs[4] = {acc0, acc1, acc2, acc3};
      float* ym = Y + (size_t)m * L.cout;
      const float* am = add ? add + (size_t)m * L.cout : nullptr;
      const int nq = on / 4;  // full output quads (couts are 4-aligned in
      for (int q = 0; q < nq; ++q) {  // practice; scalar tail below if not)
        const int oq = o0 + 4 * q;
        const int32x4_t cs = vld1q_s32(L.colsum128.data() + oq);
        float32x4_t f = vcvtq_f32_s32(vsubq_s32(accs[q], cs));
        // fma(f, scale, bias): same fused op the scalar twin's std::fma is
        f = vfmaq_f32(vld1q_f32(L.bias.data() + oq), f,
                      vld1q_f32(L.scale.data() + oq));
        if (am) f = vaddq_f32(f, vld1q_f32(am + oq));
        if (relu) f = vmaxq_f32(f, vdupq_n_f32(0.0f));
        vst1q_f32(ym + oq, f);
      }
      for (int oi = 4 * nq; oi < on; ++oi) {  // identical to gemm_block_scalar
        const int o = o0 + oi;
        int32_t lanes[4];
        __builtin_memcpy(lanes, &accs[oi / 4], 16);
        float f = std::fma((float)(lanes[oi % 4] - L.colsum128[o]), L.scale[o],
                           L.bias[o]);
        if (am) f += am[o];
        if (relu) f = std::max(f, 0.0f);
        ym[o] = f;
      }
    }
  }
}

}  // namespace yf

#endif  // YF_HAVE_NEON_KERNELS
