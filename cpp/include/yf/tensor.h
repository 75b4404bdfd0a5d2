// Minimal NHWC float tensor for the YOLO-Fastest native runtime.
//
// Native-component equivalent of the reference's ncnn::Mat usage
// (ncnn_deploy/src/YOLO_ncnn.cpp); our runtime is self-contained (no ncnn).
#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace yf {

struct Tensor {
  int h = 0, w = 0, c = 0;  // single-image NHWC (n == 1)
  // NB: plain std::vector, i.e. zero-initialized buffers.  An
  // uninitialized-storage allocator was measured at no speedup
  // (docs/DESIGN.md "measured dead ends"), so the zero guarantee stays.
  std::vector<float> data;

  Tensor() = default;
  Tensor(int h_, int w_, int c_) : h(h_), w(w_), c(c_), data((size_t)h_ * w_ * c_) {}

  float* at(int y, int x) { return data.data() + ((size_t)y * w + x) * c; }
  const float* at(int y, int x) const { return data.data() + ((size_t)y * w + x) * c; }
  size_t size() const { return data.size(); }
};

}  // namespace yf
