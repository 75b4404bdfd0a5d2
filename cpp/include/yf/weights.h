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

}  // namespace yf
