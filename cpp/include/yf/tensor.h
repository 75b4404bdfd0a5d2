// Minimal NHWC float tensor for the YOLO-Fastest native runtime.
//
// Native-component equivalent of the reference's ncnn::Mat usage
// (ncnn_deploy/src/YOLO_ncnn.cpp); our runtime is self-contained (no ncnn).
#pragma once

#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace yf {

// Allocator that default-initializes (i.e. leaves floats uninitialized) on
// resize: activation buffers are fully overwritten by the producing op, and
// the implicit zero-fill of std::vector was a measurable extra write pass
// over every layer output on a bandwidth-limited core.
template <typename T, typename A = std::allocator<T>>
struct default_init_allocator : public A {
  template <typename U>
  struct rebind {
    using other = default_init_allocator<U, typename std::allocator_traits<
                                                A>::template rebind_alloc<U>>;
  };
  using A::A;
  template <typename U>
  void construct(U* ptr) noexcept(
      std::is_nothrow_default_constructible<U>::value) {
    ::new (static_cast<void*>(ptr)) U;
  }
  template <typename U, typename... Args>
  void construct(U* ptr, Args&&... args) {
    std::allocator_traits<A>::construct(static_cast<A&>(*this), ptr,
                                        std::forward<Args>(args)...);
  }
};

struct Tensor {
  int h = 0, w = 0, c = 0;  // single-image NHWC (n == 1)
  std::vector<float, default_init_allocator<float>> data;

  Tensor() = default;
  Tensor(int h_, int w_, int c_) : h(h_), w(w_), c(c_), data((size_t)h_ * w_ * c_) {}

  float* at(int y, int x) { return data.data() + ((size_t)y * w + x) * c; }
  const float* at(int y, int x) const { return data.data() + ((size_t)y * w + x) * c; }
  size_t size() const { return data.size(); }
};

}  // namespace yf
