// Bitwise-parity check: fused_res_block vs the composed unfused ops.
//
// The fused path's contract is per-element reduction-order equality with
// conv2d(1x1) -> conv2d(dw3x3) -> conv2d(1x1) [+ x].  This check sweeps
// the network's real channel triples plus generic/degenerate shapes, with
// and without the residual add, and fails on any non-identical float.
// Run it under every thread count the engine supports (the ring-buffer
// halo chunking must not change results):
//   for t in 1 2 3 7; do OMP_NUM_THREADS=$t ./yf_fused_check; done

#include <cstdio>
#include <cstring>
#include <vector>

#include "yf/model.h"

namespace {

yf::NamedTensor make_named(std::vector<uint32_t> shape, unsigned* seed) {
  yf::NamedTensor t;
  t.shape = shape;
  t.is_f32 = true;
  size_t n = 1;
  for (auto d : shape) n *= (size_t)d;
  t.f32.resize(n);
  for (auto& v : t.f32) {
    *seed = *seed * 1664525u + 1013904223u;
    v = (float)((int)((*seed >> 9) % 2001) - 1000) / 500.0f;
  }
  return t;
}

int check_case(int H, int W, int cin, int cmid, int cout, bool residual) {
  unsigned seed = (unsigned)(H * 31 + W * 7 + cin + cmid + cout);
  yf::Tensor x(H, W, cin);
  for (auto& v : x.data) {
    seed = seed * 1664525u + 1013904223u;
    v = (float)((int)((seed >> 9) % 2001) - 1000) / 500.0f;
  }
  auto u = [](int v) { return (uint32_t)v; };
  auto k1 = make_named({1, 1, u(cin), u(cmid)}, &seed);
  auto b1 = make_named({u(cmid)}, &seed);
  auto k2 = make_named({3, 3, 1, u(cmid)}, &seed);
  auto b2 = make_named({u(cmid)}, &seed);
  auto k3 = make_named({1, 1, u(cmid), u(cout)}, &seed);
  auto b3 = make_named({u(cout)}, &seed);

  yf::Tensor ref = yf::conv2d(x, k1, b1, 1, false, true);
  ref = yf::conv2d(ref, k2, b2, 1, true, true);
  ref = yf::conv2d(ref, k3, b3, 1, false, false);
  if (residual)
    for (size_t i = 0; i < ref.size(); ++i) ref.data[i] += x.data[i];

  yf::Tensor got = yf::fused_res_block(x, k1, b1, k2, b2, k3, b3, residual);
  if (got.size() != ref.size() ||
      std::memcmp(got.data.data(), ref.data.data(),
                  sizeof(float) * ref.size())) {
    std::fprintf(stderr,
                 "MISMATCH H=%d W=%d cin=%d cmid=%d cout=%d residual=%d\n", H,
                 W, cin, cmid, cout, (int)residual);
    return 1;
  }
  return 0;
}

}  // namespace

int main() {
  struct Case { int H, W, cin, cmid, cout; };
  // network triples at representative spatial sizes + generic/degenerate
  const Case cases[] = {
      {128, 160, 4, 8, 4},   {64, 80, 8, 32, 8},  {32, 40, 8, 48, 8},
      {32, 40, 16, 96, 16},  {16, 20, 24, 136, 24}, {8, 10, 48, 224, 48},
      {128, 160, 8, 8, 4},   {32, 40, 8, 48, 16},  // non-residual chains
      {5, 3, 6, 10, 6},      {1, 1, 3, 5, 3},      {2, 2, 7, 9, 7},
      {1, 7, 4, 8, 4},       {7, 1, 4, 8, 4},      // degenerate rows/cols
  };
  int bad = 0;
  for (const auto& c : cases) {
    bool residual = c.cin == c.cout;
    bad += check_case(c.H, c.W, c.cin, c.cmid, c.cout, residual);
    if (residual)  // also exercise the non-residual path on the same shape
      bad += check_case(c.H, c.W, c.cin, c.cmid, c.cout, false);
  }
  if (bad) return 1;
  std::printf("FUSED_CHECK_OK\n");
  return 0;
}
