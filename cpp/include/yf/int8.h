// int8 arithmetic path for the native runtime's 1x1 convolutions.
//
// The pointwise convs carry ~90% of YOLO-Fastest's FLOPs; executing them as
// int8 x int8 -> int32 GEMMs is the native-runtime analogue of the
// reference's reduced-precision ncnn deployment (bf16 storage + fp16
// arithmetic, YOLO_ncnn.cpp:11-12) — taken further, to the int8 story the
// reference left as future work.
//
// Quantisation semantics match the JAX Int8Executor (quant/ptq.py):
// per-output-channel symmetric int8 weights (kernel_q + w_scale from
// quantize_weights), per-tensor symmetric input scale (act_scale from
// calibrate(), carried in the .yfb).  Inputs are quantised to
// s8 = clip(round(x / sx), -127, 127) and biased to u8 = s8 + 128 so the
// AVX-512 VNNI dpbusd (u8 x s8 dot-accumulate, 64 MACs/instruction) applies;
// the +128 offset is removed exactly via the precomputed per-channel weight
// column sum.  Hosts without VNNI fall back to a scalar int32 kernel with
// identical arithmetic.
#pragma once

#include <cstdint>
#include <vector>

#include "yf/tensor.h"
#include "yf/weights.h"

namespace yf {

struct Int8Conv1x1 {
  int cin = 0, cout = 0;
  int cin4 = 0, cout16 = 0;  // padded to the VNNI block (4 in / 16 out)
  // weight blocks: [cout16/16][cin4/4][16 outs][4 ins], zero-padded
  std::vector<int8_t> packed;
  std::vector<int32_t> colsum128;  // 128 * sum_c w[c,o], cout16 entries
  std::vector<float> scale;        // sx * w_scale[o], cout16 entries
  std::vector<float> bias;         // cout16 entries (pad 0)
  float sx = 1.0f;                 // input activation scale
};

// True when the fast (AVX-512 VNNI) kernel is available on this host.
bool cpu_supports_int8_fast();

// Pack a (1,1,Cin,Cout) int8 HWIO kernel + per-channel w_scale + f32 bias
// + per-tensor input scale into the VNNI block layout.
Int8Conv1x1 pack_int8_conv1x1(const NamedTensor& kernel_q,
                              const NamedTensor& w_scale,
                              const NamedTensor& bias, float act_scale);

// Pack a full (3,3,Cin,Cout) kernel as an im2row GEMM: the "input channel"
// axis becomes the 9*Cin tap vector in ascending (dy,dx,c) order, so the
// SAME VNNI GEMM kernels execute it.  (`cin` in the returned struct is the
// tap length; the true channel count is cin/9.)
Int8Conv1x1 pack_int8_conv3x3(const NamedTensor& kernel_q,
                              const NamedTensor& w_scale,
                              const NamedTensor& bias, float act_scale);

// y = relu?(int8conv(x) [+ add]) over all pixels; x is fp32 NHWC, output
// fp32 NHWC.  `add` (optional, same shape as out) fuses a residual add
// into the epilogue.  OpenMP-parallel over pixel chunks.
Tensor conv1x1_int8(const Tensor& x, const Int8Conv1x1& layer, bool relu,
                    const Tensor* add = nullptr);

// Full 3x3 conv (pad 1, any stride) on a layer packed with
// pack_int8_conv3x3: the whole input is quantised once, output pixels
// gather their 9-tap u8 rows (OOB taps filled with the zero-point byte
// 128, which the column-sum correction cancels exactly) and run through
// the shared GEMM.
Tensor conv3x3_int8(const Tensor& x, const Int8Conv1x1& layer, int stride,
                    bool relu);

}  // namespace yf
