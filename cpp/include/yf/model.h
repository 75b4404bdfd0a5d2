// YOLO-Fastest native inference engine (NHWC, float32, OpenMP).
//
// The reference deploys through the external ncnn engine
// (ncnn_deploy/src/YOLO_ncnn.cpp loads a converted .param/.bin graph); this
// runtime is self-contained: it executes the BN-folded graph exported by
// yolofastest_tpu (models/graph.py walk_topology — the same declarative
// topology drives the JAX, int8 and this C++ path).
#pragma once

#include <map>
#include <string>

#include "yf/int8.h"
#include "yf/tensor.h"
#include "yf/weights.h"

namespace yf {

// Elementary ops (src/ops.cpp) — NHWC single image.
Tensor conv2d(const Tensor& in, const NamedTensor& kernel, const NamedTensor& bias,
              int stride, bool depthwise, bool relu);
Tensor deconv2x(const Tensor& in, const NamedTensor& kernel, const NamedTensor& bias);
Tensor concat_c(const Tensor& a, const Tensor& b);
// Fused residual block (1x1 relu -> dw3x3 relu -> 1x1) + x, row-ring
// buffered so intermediates never leave cache; bitwise-equal to the
// unfused sequence.
Tensor fused_res_block(const Tensor& x, const NamedTensor& k1,
                       const NamedTensor& b1, const NamedTensor& k2,
                       const NamedTensor& b2, const NamedTensor& k3,
                       const NamedTensor& b3, bool residual = true);

class YoloFastestNet {
 public:
  // Accepts fp32 .yfb files (fold_batchnorm export) and int8-quantised ones
  // (quantize_weights export: kernel_q int8 + per-out-channel w_scale).
  // int8 kernels are always dequantised at load so a full fp32 path exists
  // (weight-only quantisation: the 4x-smaller-artifact story); when the
  // file ALSO carries activation scales (act_scale per layer, written by
  // save_native_weights(..., act_scales=calibrate(...))), the 1x1 convs
  // (~90% of FLOPs) execute with real int8 arithmetic (AVX-512 VNNI GEMM,
  // yf/int8.h).  Set YF_INT8=0 to force the fp32 path for A/B runs.
  explicit YoloFastestNet(const std::string& weights_path)
      : w_(load_weights(weights_path)) {
    dequantize_int8_weights();
    build_int8_layers();
    // Lite (single-head) .yfb files carry no head_4 branch; the engine
    // walks the matching topology (models/graph.py walk_topology_lite).
    is_lite_ = w_.find("head_4/kernel") == w_.end();
    // Eager validation: a 32x32 dry forward exercises every layer of the
    // topology walk, so a .yfb with missing or mis-shaped weights fails at
    // load (yf_create -> null handle) instead of at first inference.
    Tensor dummy(32, 32, 1), hl, hs;
    forward(dummy, hl, hs);
  }

  // img: (h, w, 1) normalized floats. Outputs raw head logits,
  // head_large at stride 16, head_small at stride 32 (NHWC, A*(5+C) ch).
  // For lite weights only head_small is produced (head_large is emptied).
  void forward(const Tensor& img, Tensor& head_large, Tensor& head_small) const;

  bool is_lite() const { return is_lite_; }

  // Loaded tensor map (for read_run_meta and introspection).
  const Weights& weights() const { return w_; }

  // Number of layers executing with int8 arithmetic (0 = pure fp32).
  int int8_layer_count() const { return (int)(int8_.size() + int8_3x3_.size()); }

 private:
  Tensor conv(const Tensor& x, const std::string& name, int stride = 1,
              bool depthwise = false, bool relu = true) const;
  Tensor res(Tensor x, const std::string& name) const;
  Tensor chain3(const Tensor& x, const std::string& pw1,
                const std::string& dw, const std::string& pw2) const;
  void dequantize_int8_weights();
  void build_int8_layers();

  Weights w_;
  std::map<std::string, Int8Conv1x1> int8_;       // 1x1 convs
  std::map<std::string, Int8Conv1x1> int8_3x3_;   // full 3x3 convs (im2row)
  bool is_lite_ = false;
};

}  // namespace yf
