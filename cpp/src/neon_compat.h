// NEON compatibility layer for the ARM kernels (ops_neon.cpp).
//
// On aarch64 this is just <arm_neon.h>.  On x86, defining YF_NEON_SIM maps
// the (small) intrinsic subset the kernels use onto exact scalar C++ — so
// the SAME kernel source compiles and runs on the build host, letting
// runner/neon_check.cpp verify the NEON kernel logic BITWISE against the
// scalar twins without a cross-compiler or QEMU (neither is in this image;
// the round-3 verdict's fallback option).  Semantics are pinned to the ARM
// ARM definitions the kernels rely on:
//   * vcvtnq_s32_f32 rounds to nearest-even (FPCR default) -> lrintf under
//     the default FE_TONEAREST environment;
//   * vfmaq_f32 is a fused multiply-add -> std::fma per lane;
//   * vmulq_s16 returns the low 16 bits of the product (the kernels only
//     form products that fit, |x|<=255 * |w|<=127 = 32385 < 2^15).
//
// The sim is NEVER active in a production x86 build — only the dedicated
// build-neonsim configuration (cpp/build.sh --neon-sim) defines YF_NEON_SIM,
// and only yf_neon_check links the simulated kernels.

#pragma once

#if defined(__aarch64__)
#include <arm_neon.h>
#elif defined(YF_NEON_SIM)

#include <cmath>
#include <cstdint>
#include <cstring>

struct int8x8_t   { int8_t v[8]; };
struct int8x16_t  { int8_t v[16]; };
struct int16x4_t  { int16_t v[4]; };
struct int16x8_t  { int16_t v[8]; };
struct int32x4_t  { int32_t v[4]; };
struct uint8x8_t  { uint8_t v[8]; };
struct uint16x8_t { uint16_t v[8]; };
struct uint32x2_t { uint32_t v[2]; };
struct float32x4_t { float v[4]; };

static inline int8x16_t vld1q_s8(const int8_t* p) {
  int8x16_t r; std::memcpy(r.v, p, 16); return r;
}
static inline float32x4_t vld1q_f32(const float* p) {
  float32x4_t r; std::memcpy(r.v, p, 16); return r;
}
static inline int32x4_t vld1q_s32(const int32_t* p) {
  int32x4_t r; std::memcpy(r.v, p, 16); return r;
}
static inline void vst1q_f32(float* p, float32x4_t a) { std::memcpy(p, a.v, 16); }
static inline void vst1_u8(uint8_t* p, uint8x8_t a) { std::memcpy(p, a.v, 8); }

static inline int8x8_t vget_low_s8(int8x16_t a) {
  int8x8_t r; std::memcpy(r.v, a.v, 8); return r;
}
static inline int8x8_t vget_high_s8(int8x16_t a) {
  int8x8_t r; std::memcpy(r.v, a.v + 8, 8); return r;
}
static inline int16x8_t vmovl_s8(int8x8_t a) {
  int16x8_t r; for (int i = 0; i < 8; i++) r.v[i] = a.v[i]; return r;
}
static inline uint16x8_t vmovl_u8(uint8x8_t a) {
  uint16x8_t r; for (int i = 0; i < 8; i++) r.v[i] = a.v[i]; return r;
}
static inline int16x8_t vreinterpretq_s16_u16(uint16x8_t a) {
  int16x8_t r; std::memcpy(r.v, a.v, 16); return r;
}
static inline uint16x8_t vreinterpretq_u16_s16(int16x8_t a) {
  uint16x8_t r; std::memcpy(r.v, a.v, 16); return r;
}
static inline uint8x8_t vreinterpret_u8_u32(uint32x2_t a) {
  uint8x8_t r; std::memcpy(r.v, a.v, 8); return r;
}
static inline uint32x2_t vdup_n_u32(uint32_t x) { return {x, x}; }

static inline int16x8_t vmulq_s16(int16x8_t a, int16x8_t b) {
  int16x8_t r;
  for (int i = 0; i < 8; i++)
    r.v[i] = (int16_t)((int32_t)a.v[i] * (int32_t)b.v[i]);
  return r;
}
static inline int32x4_t vpaddlq_s16(int16x8_t a) {
  int32x4_t r;
  for (int i = 0; i < 4; i++)
    r.v[i] = (int32_t)a.v[2 * i] + (int32_t)a.v[2 * i + 1];
  return r;
}
static inline int32x4_t vpaddq_s32(int32x4_t a, int32x4_t b) {
  return {a.v[0] + a.v[1], a.v[2] + a.v[3], b.v[0] + b.v[1], b.v[2] + b.v[3]};
}
static inline int32x4_t vaddq_s32(int32x4_t a, int32x4_t b) {
  int32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] + b.v[i]; return r;
}
static inline int32x4_t vsubq_s32(int32x4_t a, int32x4_t b) {
  int32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] - b.v[i]; return r;
}
static inline int32x4_t vmaxq_s32(int32x4_t a, int32x4_t b) {
  int32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] > b.v[i] ? a.v[i] : b.v[i]; return r;
}
static inline int32x4_t vminq_s32(int32x4_t a, int32x4_t b) {
  int32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] < b.v[i] ? a.v[i] : b.v[i]; return r;
}
static inline int32x4_t vdupq_n_s32(int32_t x) { return {x, x, x, x}; }
static inline float32x4_t vdupq_n_f32(float x) { return {x, x, x, x}; }

static inline float32x4_t vcvtq_f32_s32(int32x4_t a) {
  float32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = (float)a.v[i]; return r;
}
static inline int32x4_t vcvtnq_s32_f32(float32x4_t a) {
  int32x4_t r;  // round to nearest, ties to even (FPCR default mode)
  for (int i = 0; i < 4; i++) r.v[i] = (int32_t)lrintf(a.v[i]);
  return r;
}
static inline float32x4_t vaddq_f32(float32x4_t a, float32x4_t b) {
  float32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] + b.v[i]; return r;
}
static inline float32x4_t vmulq_f32(float32x4_t a, float32x4_t b) {
  float32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] * b.v[i]; return r;
}
static inline float32x4_t vmaxq_f32(float32x4_t a, float32x4_t b) {
  float32x4_t r; for (int i = 0; i < 4; i++) r.v[i] = a.v[i] > b.v[i] ? a.v[i] : b.v[i]; return r;
}
static inline float32x4_t vfmaq_f32(float32x4_t acc, float32x4_t a, float32x4_t b) {
  float32x4_t r;  // fused, like the hardware instruction
  for (int i = 0; i < 4; i++) r.v[i] = std::fma(a.v[i], b.v[i], acc.v[i]);
  return r;
}
static inline int16x4_t vmovn_s32(int32x4_t a) {
  int16x4_t r; for (int i = 0; i < 4; i++) r.v[i] = (int16_t)a.v[i]; return r;
}
static inline int16x8_t vcombine_s16(int16x4_t lo, int16x4_t hi) {
  int16x8_t r;
  std::memcpy(r.v, lo.v, 8); std::memcpy(r.v + 4, hi.v, 8);
  return r;
}
static inline uint8x8_t vmovn_u16(uint16x8_t a) {
  uint8x8_t r; for (int i = 0; i < 8; i++) r.v[i] = (uint8_t)a.v[i]; return r;
}

#else
#error "neon_compat.h requires __aarch64__ or YF_NEON_SIM"
#endif
