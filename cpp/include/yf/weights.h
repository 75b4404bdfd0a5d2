// Loader for the .yfb native weights format written by
// yolofastest_tpu/export/native.py (see that file for the layout spec).
#pragma once

#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace yf {

struct NamedTensor {
  std::vector<uint32_t> shape;
  std::vector<float> f32;   // filled when dtype == float32
  std::vector<int8_t> i8;   // filled when dtype == int8
  bool is_f32 = true;
  size_t numel() const {
    size_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

// key: "layer/tensor" e.g. "conv0/kernel", "res1_1/conv2/bias"
using Weights = std::map<std::string, NamedTensor>;

// Throws std::runtime_error on malformed files.
Weights load_weights(const std::string& path);

// Run configuration embedded by save_native_weights(..., io_config=cfg.io)
// under the reserved "__meta__" layer namespace.  One config consumed
// everywhere — fixes the reference's literal re-declaration hazard
// (ncnn_deploy/main.cpp:16-24, SURVEY §5).
struct RunMeta {
  bool present = false;
  // (n_scales, num_anchors, 2) flattened, finest head first, (w, h) pairs
  // in net-input pixels.
  std::vector<float> anchors;
  int num_scales = 0, num_anchors = 0;
  float conf_thre = 0.5f, nms_thre = 0.2f;
  int input_h = 0, input_w = 0;
  std::vector<std::string> class_names;
};

// Decodes the __meta__ entries of an already-loaded file; present == false
// for weights-only files.  Throws on a malformed meta block.
RunMeta read_run_meta(const Weights& w);

}  // namespace yf
