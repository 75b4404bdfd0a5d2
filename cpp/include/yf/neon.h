// ARM NEON kernel twins for the native runtime's hot paths.
//
// The reference's actual deployment target is an ARM Cortex-A72 pair
// (RK3399Pro, `taskset -c 4,5` — /root/reference/src/model_deployment/
// ncnn_deploy/, RK3399pro NCNN部署记录.txt:9); on that target the x86
// AVX2/VNNI tiles in ops.cpp / ops_int8.cpp fall back to scalar twins.
// These NEON kernels slot into the SAME dispatch seams:
//   * fp32 3x3 conv tiles (4 pixels x 8 or 4 outputs), the AVX tile twins;
//   * int8 quantize + u8*s8 GEMM pair, the VNNI kernel twins — plain
//     ARMv8.0 NEON (widening 16-bit multiplies), since the A72 has neither
//     dotprod (v8.2) nor i8mm (v8.6).
//
// All four reproduce the scalar twins BITWISE (same accumulation order,
// fused fp32 multiply-adds, nearest-even rounding); locked by
// runner/neon_check.cpp, which also runs on x86 via the scalar NEON shim
// (src/neon_compat.h + cpp/build.sh --neon-sim).
#pragma once

#include <cstdint>

#include "yf/int8.h"

#if defined(__aarch64__) || defined(YF_NEON_SIM)
#define YF_HAVE_NEON_KERNELS 1
#endif

namespace yf {

#ifdef YF_HAVE_NEON_KERNELS

// fp32 3x3 conv, 4-pixel x 8-output tile (twin of conv3x3_tile8_avx).
void conv3x3_tile8_neon(const float* row0, const float* kw, const float* bs,
                        float* out_row, int ox0, int cin, int stride, int irs,
                        bool relu);

// fp32 3x3 conv, 4-pixel x 4-output tile (twin of conv3x3_tile4_avx).
void conv3x3_tile4_neon(const float* row0, const float* kw, const float* bs,
                        float* out_row, int ox0, int cin, int stride, int irs,
                        bool relu);

// int8 activation quantisation (twin of quantize_block_vnni/scalar):
// u8 = clip(round(x * inv_sx), -127, 127) + 128, pad bytes 128.
void quantize_block_neon(const float* x, int mb, int cin, int cin4,
                         float inv_sx, uint8_t* out);

// int8 GEMM over `mb` pixels (twin of gemm_block_vnni/scalar): u8 x s8 ->
// int32 with exact column-sum offset removal, fused float epilogue.
void gemm_block_neon(const uint8_t* xq, int mb, const Int8Conv1x1& L,
                     bool relu, const float* add, float* Y);

#endif  // YF_HAVE_NEON_KERNELS

}  // namespace yf
