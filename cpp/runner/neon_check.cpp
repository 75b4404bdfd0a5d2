// yf_neon_check — bitwise verification of the ARM NEON kernel twins
// (src/ops_neon.cpp) against independent scalar references.
//
// Runs in two configurations:
//   * on real aarch64 (cpp/build.sh), exercising the actual NEON units;
//   * on x86 via the scalar NEON shim (cpp/build.sh --neon-sim ->
//     build-neonsim), which pins the kernels' *logic* — lane arithmetic,
//     accumulation order, rounding — without a cross-compiler or QEMU.
//
// The scalar references here are written independently from the kernels
// (explicit std::fma chains in the documented value order), so agreement
// checks the kernels against the contract, not against themselves.
// Checks cover every (cin, cout) the model uses plus awkward remainders.
// Exit 0 = all bitwise-equal; any mismatch prints context and exits 1.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "yf/neon.h"

#ifndef YF_HAVE_NEON_KERNELS
int main() {
  std::printf("yf_neon_check: NEON kernels not compiled in this build\n");
  return 2;
}
#else

using yf::Int8Conv1x1;

static int failures = 0;

#define CHECK(cond, ...)                              \
  do {                                                \
    if (!(cond)) {                                    \
      std::printf("FAIL: " __VA_ARGS__);              \
      std::printf("\n");                              \
      failures++;                                     \
    }                                                 \
  } while (0)

// ------------------------------------------------------- fp32 tile checks

// independent reference: per (pixel, out) one fma chain, bias first, taps
// ascending (dy, dx, c) — the contract of the scalar/AVX/NEON tiles
static void ref_tile(const float* row0, const float* kw, const float* bs,
                     float* out_row, int ox0, int cin, int cout, int stride,
                     int irs, bool relu) {
  for (int m = 0; m < 4; ++m) {
    for (int o = 0; o < cout; ++o) {
      float acc = bs[o];
      for (int dy = 0; dy < 3; ++dy)
        for (int dx = 0; dx < 3; ++dx)
          for (int c = 0; c < cin; ++c) {
            const float v =
                row0[(size_t)dy * irs +
                     (size_t)((ox0 + m) * stride - 1 + dx) * cin + c];
            const float k = kw[(((size_t)dy * 3 + dx) * cin + c) * cout + o];
            acc = std::fma(v, k, acc);
          }
      out_row[(size_t)(ox0 + m) * cout + o] =
          relu ? std::max(acc, 0.0f) : acc;
    }
  }
}

static void check_tiles() {
  std::mt19937 rng(42);
  std::normal_distribution<float> dist(0.0f, 1.0f);
  for (int cout : {4, 8}) {
    for (int cin : {1, 3, 4, 8, 16, 24}) {
      for (int stride : {1, 2}) {
        for (bool relu : {false, true}) {
          const int W = 32, rows = 3;
          const int irs = W * cin;
          std::vector<float> x((size_t)rows * irs);
          for (auto& v : x) v = dist(rng);
          std::vector<float> kw((size_t)9 * cin * cout);
          for (auto& v : kw) v = dist(rng);
          std::vector<float> bs(cout);
          for (auto& v : bs) v = dist(rng);
          const int ox0 = 1;  // interior tile (ix = ox*stride-1+dx >= 0)
          std::vector<float> got((size_t)16 * cout, -1e30f),
              want((size_t)16 * cout, -1e30f);
          if (cout == 8)
            yf::conv3x3_tile8_neon(x.data(), kw.data(), bs.data(), got.data(),
                                   ox0, cin, stride, irs, relu);
          else
            yf::conv3x3_tile4_neon(x.data(), kw.data(), bs.data(), got.data(),
                                   ox0, cin, stride, irs, relu);
          ref_tile(x.data(), kw.data(), bs.data(), want.data(), ox0, cin,
                   cout, stride, irs, relu);
          CHECK(std::memcmp(got.data(), want.data(),
                            got.size() * sizeof(float)) == 0,
                "fp32 tile cout=%d cin=%d stride=%d relu=%d", cout, cin,
                stride, (int)relu);
        }
      }
    }
  }
  std::printf("fp32 tiles: done\n");
}

// ------------------------------------------------------- int8 pair checks

static void check_quantize() {
  std::mt19937 rng(7);
  std::normal_distribution<float> dist(0.0f, 2.0f);
  for (int cin : {1, 3, 4, 7, 8, 13, 16, 96, 224}) {
    const int cin4 = (cin + 3) & ~3;
    const int mb = 8;
    std::vector<float> x((size_t)mb * cin);
    for (auto& v : x) v = dist(rng);
    x[0] = 127.49f;  // clip and rounding-boundary probes
    if (cin > 1) x[1] = -4000.0f;
    if (cin > 2) x[2] = 0.5f;     // tie -> even
    if (cin > 3) x[3] = 1.5f;     // tie -> even
    std::vector<uint8_t> got((size_t)mb * cin4, 7), want((size_t)mb * cin4, 9);
    const float inv_sx = 1.0f;
    yf::quantize_block_neon(x.data(), mb, cin, cin4, inv_sx, got.data());
    for (int m = 0; m < mb; ++m) {  // independent scalar reference
      for (int c = 0; c < cin; ++c) {
        int q = (int)lrintf(x[(size_t)m * cin + c] * inv_sx);
        q = q < -127 ? -127 : (q > 127 ? 127 : q);
        want[(size_t)m * cin4 + c] = (uint8_t)(q + 128);
      }
      for (int c = cin; c < cin4; ++c) want[(size_t)m * cin4 + c] = 128;
    }
    CHECK(got == want, "quantize cin=%d", cin);
  }
  std::printf("int8 quantize: done\n");
}

static Int8Conv1x1 make_layer(int cin, int cout, std::mt19937& rng) {
  std::uniform_int_distribution<int> wdist(-127, 127);
  std::normal_distribution<float> fdist(0.0f, 1.0f);
  yf::NamedTensor kq, ws, bs;
  kq.shape = {1, 1, (uint32_t)cin, (uint32_t)cout};
  kq.is_f32 = false;
  kq.i8.resize((size_t)cin * cout);
  for (auto& v : kq.i8) v = (int8_t)wdist(rng);
  ws.f32.resize(cout);
  for (auto& v : ws.f32) v = std::abs(fdist(rng)) * 0.01f + 1e-4f;
  bs.f32.resize(cout);
  for (auto& v : bs.f32) v = fdist(rng);
  return yf::pack_int8_conv1x1(kq, ws, bs, 0.05f);
}

static void check_gemm() {
  std::mt19937 rng(13);
  std::uniform_int_distribution<int> xdist(1, 255);
  std::normal_distribution<float> fdist(0.0f, 1.0f);
  for (auto [cin, cout] : std::initializer_list<std::pair<int, int>>{
           {4, 4}, {8, 24}, {16, 64}, {24, 96}, {96, 16}, {224, 48},
           {5, 10}, {13, 23}, {36, 24}, {9 * 16, 16}}) {
    Int8Conv1x1 L = make_layer(cin, cout, rng);
    for (int mb : {1, 3, 8}) {
      std::vector<uint8_t> xq((size_t)mb * L.cin4, 128);
      for (int m = 0; m < mb; ++m)
        for (int c = 0; c < cin; ++c)
          xq[(size_t)m * L.cin4 + c] = (uint8_t)xdist(rng);
      std::vector<float> add((size_t)mb * cout);
      for (auto& v : add) v = fdist(rng);
      for (bool relu : {false, true}) {
        for (const float* ap :
             {(const float*)nullptr, (const float*)add.data()}) {
          std::vector<float> got((size_t)mb * cout, -1e30f),
              want((size_t)mb * cout, -1e30f);
          yf::gemm_block_neon(xq.data(), mb, L, relu, ap, got.data());
          // independent reference straight from the unpacked kernel
          for (int m = 0; m < mb; ++m)
            for (int o = 0; o < cout; ++o) {
              int64_t acc = 0;
              for (int c = 0; c < cin; ++c) {
                // unpack w[c][o] from the block layout
                const int nc4 = L.cin4 / 4;
                const int8_t w =
                    L.packed[(((size_t)(o / 16) * nc4 + c / 4) * 16 +
                              o % 16) * 4 + c % 4];
                acc += (int64_t)xq[(size_t)m * L.cin4 + c] * w;
              }
              float f = std::fma((float)(int32_t)(acc - L.colsum128[o]),
                                 L.scale[o], L.bias[o]);
              if (ap) f += ap[(size_t)m * cout + o];
              if (relu) f = std::max(f, 0.0f);
              want[(size_t)m * cout + o] = f;
            }
          CHECK(std::memcmp(got.data(), want.data(),
                            got.size() * sizeof(float)) == 0,
                "gemm cin=%d cout=%d mb=%d relu=%d add=%d", cin, cout, mb,
                (int)relu, (int)(ap != nullptr));
        }
      }
    }
  }
  std::printf("int8 gemm: done\n");
}

int main() {
  check_tiles();
  check_quantize();
  check_gemm();
  if (failures) {
    std::printf("yf_neon_check: %d FAILURES\n", failures);
    return 1;
  }
#ifdef YF_NEON_SIM
  std::printf("yf_neon_check: all bitwise-equal (x86 scalar NEON shim)\n");
#else
  std::printf("yf_neon_check: all bitwise-equal (native NEON)\n");
#endif
  return 0;
}

#endif  // YF_HAVE_NEON_KERNELS
