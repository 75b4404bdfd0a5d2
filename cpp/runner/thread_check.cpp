// Concurrency check for the native engine.
//
// N threads each (a) construct a private net from the same .yfb (concurrent
// weight loading) and (b) run forwards on ONE shared net instance; every
// output must match a serial reference bitwise.  Built in all
// configurations; under the TSan build (cpp/build.sh --sanitize=thread) any
// data race in the engine aborts the run.  The TSan configuration compiles
// without OpenMP — libgomp's barriers false-positive under TSan; the
// ASan+UBSan build (--sanitize) covers the OpenMP code paths instead.
//
// The reference has no thread-safety story at all (its only concurrency is
// OpenMP inside ncnn decode, YOLO_ncnn.cpp:103; no build files, SURVEY.md §5).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "yf/model.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s weights.yfb H W [threads=4] [iters=2]\n",
                 argv[0]);
    return 2;
  }
  const char* path = argv[1];
  const int H = std::atoi(argv[2]), W = std::atoi(argv[3]);
  const int T = argc > 4 ? std::atoi(argv[4]) : 4;
  const int iters = argc > 5 ? std::atoi(argv[5]) : 2;

  yf::Tensor img(H, W, 1);
  unsigned s = 1;  // deterministic LCG noise input
  for (auto& v : img.data) {
    s = s * 1664525u + 1013904223u;
    v = (float)((s >> 8) % 256 - 128) / 255.0f;
  }

  yf::YoloFastestNet shared(path);
  yf::Tensor ref_l, ref_s;
  shared.forward(img, ref_l, ref_s);

  auto same = [](const yf::Tensor& a, const yf::Tensor& b) {
    return a.size() == b.size() &&
           !std::memcmp(a.data.data(), b.data.data(),
                        sizeof(float) * a.size());
  };

  std::vector<int> bad(T, 0);
  std::vector<std::thread> th;
  for (int t = 0; t < T; ++t) {
    th.emplace_back([&, t] {
      yf::YoloFastestNet own(path);
      for (int i = 0; i < iters; ++i) {
        yf::Tensor l1, s1, l2, s2;
        shared.forward(img, l1, s1);
        own.forward(img, l2, s2);
        if (!same(l1, ref_l) || !same(s1, ref_s) || !same(l2, ref_l) ||
            !same(s2, ref_s))
          bad[t] = 1;
      }
    });
  }
  for (auto& x : th) x.join();
  for (int t = 0; t < T; ++t)
    if (bad[t]) {
      std::fprintf(stderr, "MISMATCH in thread %d\n", t);
      return 1;
    }
  std::printf("THREAD_CHECK_OK threads=%d iters=%d\n", T, iters);
  return 0;
}
