// Bitwise-parity check: the VNNI int8 1x1-conv kernel vs an exact
// reference model of its arithmetic.
//
// The int8 path's contract (yf/int8.h): u8 = clip(round(x/sx), -127, 127)
// + 128, exact int32 accumulation against the s8 weights with the +128
// offset removed via the weight column sum, then the float epilogue
// fma(acc, sx*w_scale[o], bias[o]) [+ add] [relu].  The reference below
// recomputes that with plain scalar code and int64 accumulation (so any
// accumulator overflow in the kernel would also be caught); every float
// must match bitwise, under every thread count:
//   for t in 1 2 3 7; do OMP_NUM_THREADS=$t ./yf_int8_check; done

#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

#include "yf/int8.h"

namespace {

unsigned g_seed = 12345;
float randf(float lo, float hi) {
  g_seed = g_seed * 1664525u + 1013904223u;
  return lo + (hi - lo) * (float)((g_seed >> 9) % 10001) / 10000.0f;
}
int randi(int n) {
  g_seed = g_seed * 1664525u + 1013904223u;
  return (int)((g_seed >> 9) % (unsigned)n);
}

int check_case(int H, int W, int cin, int cout, bool relu, bool residual,
               float sx) {
  yf::NamedTensor kq, ws, bias;
  kq.shape = {1, 1, (uint32_t)cin, (uint32_t)cout};
  kq.is_f32 = false;
  kq.i8.resize((size_t)cin * cout);
  for (auto& v : kq.i8) v = (int8_t)(randi(255) - 127);
  ws.shape = {(uint32_t)cout};
  ws.f32.resize(cout);
  for (auto& v : ws.f32) v = randf(1e-4f, 2e-2f);
  bias.shape = {(uint32_t)cout};
  bias.f32.resize(cout);
  for (auto& v : bias.f32) v = randf(-1.0f, 1.0f);

  yf::Tensor x(H, W, cin), add(H, W, cout);
  for (auto& v : x.data) v = randf(-4.0f, 4.0f);
  for (auto& v : add.data) v = randf(-2.0f, 2.0f);

  const yf::Int8Conv1x1 L = yf::pack_int8_conv1x1(kq, ws, bias, sx);
  const yf::Tensor got =
      yf::conv1x1_int8(x, L, relu, residual ? &add : nullptr);

  // exact reference: scalar quantise + int64 accumulate + same epilogue
  const int N = H * W;
  const float inv_sx = 1.0f / sx;  // kernel multiplies by the reciprocal
  for (int p = 0; p < N; ++p) {
    std::vector<int> q(cin);
    for (int c = 0; c < cin; ++c) {
      int v = (int)lrintf(x.data[(size_t)p * cin + c] * inv_sx);
      q[c] = v < -127 ? -127 : (v > 127 ? 127 : v);
    }
    for (int o = 0; o < cout; ++o) {
      long long acc = 0;
      for (int c = 0; c < cin; ++c)
        acc += (long long)q[c] * kq.i8[(size_t)c * cout + o];
      float f = std::fma((float)acc, sx * ws.f32[o], bias.f32[o]);
      if (residual) f += add.data[(size_t)p * cout + o];
      if (relu) f = std::max(f, 0.0f);
      const float g = got.data[(size_t)p * cout + o];
      if (std::memcmp(&f, &g, sizeof(float)) != 0) {
        std::fprintf(stderr,
                     "MISMATCH H=%d W=%d cin=%d cout=%d relu=%d res=%d "
                     "p=%d o=%d want=%.9g got=%.9g\n",
                     H, W, cin, cout, (int)relu, (int)residual, p, o, f, g);
        return 1;
      }
    }
  }
  return 0;
}

int check_conv3x3(int H, int W, int cin, int cout, int stride, bool relu,
                  float sx) {
  yf::NamedTensor kq, ws, bias;
  kq.shape = {3, 3, (uint32_t)cin, (uint32_t)cout};
  kq.is_f32 = false;
  kq.i8.resize((size_t)9 * cin * cout);
  for (auto& v : kq.i8) v = (int8_t)(randi(255) - 127);
  ws.shape = {(uint32_t)cout};
  ws.f32.resize(cout);
  for (auto& v : ws.f32) v = randf(1e-4f, 2e-2f);
  bias.shape = {(uint32_t)cout};
  bias.f32.resize(cout);
  for (auto& v : bias.f32) v = randf(-1.0f, 1.0f);

  yf::Tensor x(H, W, cin);
  for (auto& v : x.data) v = randf(-4.0f, 4.0f);

  const yf::Int8Conv1x1 L = yf::pack_int8_conv3x3(kq, ws, bias, sx);
  const yf::Tensor got = yf::conv3x3_int8(x, L, stride, relu);

  const int oh = (H + 2 - 3) / stride + 1, ow = (W + 2 - 3) / stride + 1;
  if (got.h != oh || got.w != ow || got.c != cout) {
    std::fprintf(stderr, "conv3x3 shape mismatch\n");
    return 1;
  }
  // exact reference: quantise, accumulate in-bounds taps in int64, same
  // epilogue (OOB taps contribute 0 by construction — verified implicitly:
  // a bug in the 128-fill would shift every border value)
  const float inv_sx = 1.0f / sx;
  std::vector<int> q((size_t)H * W * cin);
  for (size_t i = 0; i < q.size(); ++i) {
    int v = (int)lrintf(x.data[i] * inv_sx);
    q[i] = v < -127 ? -127 : (v > 127 ? 127 : v);
  }
  for (int oy = 0; oy < oh; ++oy)
    for (int ox = 0; ox < ow; ++ox)
      for (int o = 0; o < cout; ++o) {
        long long acc = 0;
        for (int dy = 0; dy < 3; ++dy) {
          const int iy = oy * stride - 1 + dy;
          if (iy < 0 || iy >= H) continue;
          for (int dx = 0; dx < 3; ++dx) {
            const int ix = ox * stride - 1 + dx;
            if (ix < 0 || ix >= W) continue;
            for (int c = 0; c < cin; ++c)
              acc += (long long)q[((size_t)iy * W + ix) * cin + c] *
                     kq.i8[(((size_t)dy * 3 + dx) * cin + c) * cout + o];
          }
        }
        float f = std::fma((float)acc, sx * ws.f32[o], bias.f32[o]);
        if (relu) f = std::max(f, 0.0f);
        const float g = got.data[((size_t)oy * ow + ox) * cout + o];
        if (std::memcmp(&f, &g, sizeof(float)) != 0) {
          std::fprintf(stderr,
                       "3x3 MISMATCH H=%d W=%d cin=%d cout=%d s=%d oy=%d "
                       "ox=%d o=%d want=%.9g got=%.9g\n",
                       H, W, cin, cout, stride, oy, ox, o, f, g);
          return 1;
        }
      }
  return 0;
}

}  // namespace

int main() {
  std::printf("int8 fast kernel: %s\n",
              yf::cpu_supports_int8_fast() ? "avx512-vnni" : "scalar");
  struct Case { int H, W, cin, cout; };
  // the network's real pointwise shapes + padding-edge cases (cin % 4,
  // cout % 16 in every residue class) + saturation-heavy scales
  const Case cases[] = {
      {128, 160, 4, 8},  {64, 80, 8, 32},  {32, 40, 48, 8},
      {16, 20, 24, 136}, {8, 10, 224, 48}, {8, 10, 232, 96},
      {16, 20, 136, 24}, {8, 10, 48, 224}, {8, 10, 96, 24},
      {5, 3, 1, 1},      {3, 5, 5, 17},    {2, 2, 7, 31},
      {1, 9, 6, 16},     {9, 1, 3, 15},    {4, 4, 2, 33},
  };
  int bad = 0;
  for (const auto& c : cases)
    for (int relu = 0; relu < 2; ++relu)
      for (int res = 0; res < 2; ++res)
        for (float sx : {0.02f, 0.5f})  // 0.02 drives values into clipping
          bad += check_case(c.H, c.W, c.cin, c.cout, relu, res, sx);

  // full 3x3 im2row path: the network's conv1_9 shape + border/stride/
  // tap-pad edge cases
  struct C3 { int H, W, cin, cout, stride; };
  const C3 cases3[] = {
      {128, 160, 24, 24, 2}, {16, 20, 24, 24, 1}, {7, 9, 8, 16, 1},
      {6, 6, 9, 8, 2},       {3, 3, 8, 8, 1},     {5, 4, 11, 5, 2},
  };
  for (const auto& c : cases3)
    for (int relu = 0; relu < 2; ++relu)
      for (float sx : {0.02f, 0.5f})
        bad += check_conv3x3(c.H, c.W, c.cin, c.cout, c.stride, relu, sx);
  if (bad) return 1;
  std::printf("INT8_CHECK_OK\n");
  return 0;
}
