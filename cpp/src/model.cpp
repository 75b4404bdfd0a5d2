// Topology walk — the C++ twin of yolofastest_tpu/models/graph.py
// walk_topology (itself mirroring the reference yolo_fastest.py:150-218).
// Any change to the Python topology must be mirrored here; the parity test
// (tests/test_native.py) locks the two together at logit level.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <mutex>
#include <stdexcept>

#include "yf/model.h"

namespace yf {

namespace {
const NamedTensor& get(const Weights& w, const std::string& key) {
  auto it = w.find(key);
  if (it == w.end()) throw std::runtime_error("missing weight: " + key);
  return it->second;
}

// Opt-in per-layer profiler (YF_PROFILE=1): cumulative ms per layer, dumped
// at process exit sorted by cost.  The reference only ever timed whole
// infer/postprocess phases (YOLO_ncnn.cpp:51-80).
struct LayerProfile {
  std::map<std::string, double> ms;
  std::mutex mu;  // conv() may run concurrently on a shared net instance
  bool enabled = std::getenv("YF_PROFILE") != nullptr;
  void add(const std::string& name, double dt) {
    std::lock_guard<std::mutex> lock(mu);
    ms[name] += dt;
  }
  ~LayerProfile() {
    if (!enabled || ms.empty()) return;
    std::multimap<double, std::string> by_cost;
    double total = 0;
    for (const auto& [k, v] : ms) { by_cost.emplace(v, k); total += v; }
    std::fprintf(stderr, "[yf profile] cumulative per-layer ms:\n");
    for (auto it = by_cost.rbegin(); it != by_cost.rend(); ++it)
      std::fprintf(stderr, "  %8.2f ms  %4.1f%%  %s\n", it->first,
                   100.0 * it->first / total, it->second.c_str());
    std::fprintf(stderr, "  %8.2f ms  total\n", total);
  }
} g_profile;

struct ScopedTimer {
  const std::string* name;
  std::chrono::steady_clock::time_point t0;
  explicit ScopedTimer(const std::string& n)
      : name(g_profile.enabled ? &n : nullptr) {
    if (name) t0 = std::chrono::steady_clock::now();
  }
  ~ScopedTimer() {
    if (name)
      g_profile.add(*name,
                    std::chrono::duration<double, std::milli>(
                        std::chrono::steady_clock::now() - t0).count());
  }
};
}  // namespace

void YoloFastestNet::dequantize_int8_weights() {
  std::vector<std::pair<std::string, NamedTensor>> synthesized;
  for (const auto& [key, t] : w_) {
    const auto pos = key.rfind("/kernel_q");
    if (pos == std::string::npos || t.is_f32) continue;
    const std::string layer = key.substr(0, pos);
    const auto& scale = w_.at(layer + "/w_scale");
    NamedTensor deq;
    deq.shape = t.shape;
    deq.is_f32 = true;
    const size_t n = t.numel();
    const size_t cout = t.shape.back();
    deq.f32.resize(n);
    for (size_t i = 0; i < n; ++i)
      deq.f32[i] = (float)t.i8[i] * scale.f32[i % cout];
    synthesized.emplace_back(layer + "/kernel", std::move(deq));
  }
  for (auto& kv : synthesized) w_[kv.first] = std::move(kv.second);
}

void YoloFastestNet::build_int8_layers() {
  // Real int8 arithmetic engages for a 1x1 conv when the .yfb carries its
  // quantised kernel AND an input activation scale (static quantisation:
  // same per-tensor-input / per-channel-weight semantics as the JAX
  // Int8Executor).  YF_INT8=0 disables for fp32 A/B comparisons.
  const char* env = std::getenv("YF_INT8");
  if (env && env[0] == '0') return;
  // Without the VNNI kernels the scalar int8 GEMM would be a large, silent
  // regression vs the tuned fp32 AVX2 tiles — require the fast path unless
  // the user forces scalar int8 with YF_INT8=1 (A/B and portability
  // testing; results are identical either way).
  if (!cpu_supports_int8_fast() && !(env && env[0] == '1')) return;
  for (const auto& [key, t] : w_) {
    const auto pos = key.rfind("/kernel_q");
    if (pos == std::string::npos || t.is_f32 || t.shape.size() != 4) continue;
    const std::string layer = key.substr(0, pos);
    auto sc = w_.find(layer + "/act_scale");
    if (sc == w_.end() || sc->second.f32.empty()) continue;
    const float s = sc->second.f32[0];
    if (t.shape[0] == 1 && t.shape[1] == 1 && (int)t.shape[2] <= 512) {
      // cin bound = the int8 kernels' quantisation-buffer size; wider
      // layers keep the fp32 path (dequantize_int8_weights covers them)
      int8_.emplace(layer, pack_int8_conv1x1(t, w_.at(layer + "/w_scale"),
                                             w_.at(layer + "/bias"), s));
    } else if (t.shape[0] == 3 && t.shape[1] == 3 && t.shape[2] >= 8 &&
               9 * (int)t.shape[2] <= 512) {
      // full 3x3 convs (not depthwise: shape[2] is the true Cin) run as
      // im2row VNNI GEMMs; the cin>=8 floor skips conv0 (cin 1, already
      // cheap via the fp32 intrinsic tile — gather overhead would dominate)
      int8_3x3_.emplace(layer, pack_int8_conv3x3(t, w_.at(layer + "/w_scale"),
                                                 w_.at(layer + "/bias"), s));
    }
  }
}

Tensor YoloFastestNet::conv(const Tensor& x, const std::string& name, int stride,
                            bool depthwise, bool relu) const {
  ScopedTimer t(name);
  if (!depthwise) {
    if (stride == 1) {
      auto it = int8_.find(name);
      if (it != int8_.end()) return conv1x1_int8(x, it->second, relu);
    }
    auto it3 = int8_3x3_.find(name);
    // The im2row VNNI path now wins at every resolution: the original
    // <=8k-output-pixel gate predated the small-run copy_bytes gather and
    // chunked quantisation; remeasured interleaved at 512x640 (min-of-8,
    // one core) the int8 path halves conv1_9's per-layer cost (82 -> 43 ms
    // cumulative over the 20-image set) and wins end-to-end.
    if (it3 != int8_3x3_.end())
      return conv3x3_int8(x, it3->second, stride, relu);
  }
  return conv2d(x, get(w_, name + "/kernel"), get(w_, name + "/bias"),
                stride, depthwise, relu);
}

Tensor YoloFastestNet::res(Tensor x, const std::string& name) const {
  ScopedTimer t(name);
  auto i1 = int8_.find(name + "/conv1");
  auto i3 = int8_.find(name + "/conv3");
  if (i1 != int8_.end() && i3 != int8_.end()) {
    // int8 path: the two pointwise convs (the FLOPs) run as VNNI GEMMs;
    // the tiny dw3x3 stays fp32; the residual add fuses into conv3's
    // epilogue.  Unfused (three tensors touch RAM) but the 3-4x pointwise
    // arithmetic win dominates the ring-buffer fusion's bandwidth saving.
    Tensor mid = conv1x1_int8(x, i1->second, /*relu=*/true);
    mid = conv2d(mid, get(w_, name + "/conv2/kernel"),
                 get(w_, name + "/conv2/bias"), 1, /*depthwise=*/true,
                 /*relu=*/true);
    return conv1x1_int8(mid, i3->second, /*relu=*/false, &x);
  }
  return fused_res_block(
      x, get(w_, name + "/conv1/kernel"), get(w_, name + "/conv1/bias"),
      get(w_, name + "/conv2/kernel"), get(w_, name + "/conv2/bias"),
      get(w_, name + "/conv3/kernel"), get(w_, name + "/conv3/bias"));
}

Tensor YoloFastestNet::chain3(const Tensor& x, const std::string& pw1,
                              const std::string& dw, const std::string& pw2) const {
  // Non-residual 1x1(relu) -> dw3x3(relu) -> 1x1 chain, same fusion as res.
  // Profile label names all three fused layers (YF_PROFILE reports fused
  // groups, not individual convs, for fused stages).
  auto i1 = int8_.find(pw1);
  auto i2 = int8_.find(pw2);
  if (i1 != int8_.end() && i2 != int8_.end()) {
    const std::string label = pw1 + "+" + dw + "+" + pw2 + "(int8)";
    ScopedTimer t(label);
    Tensor mid = conv1x1_int8(x, i1->second, /*relu=*/true);
    mid = conv2d(mid, get(w_, dw + "/kernel"), get(w_, dw + "/bias"), 1,
                 /*depthwise=*/true, /*relu=*/true);
    return conv1x1_int8(mid, i2->second, /*relu=*/false);
  }
  const std::string label = pw1 + "+" + dw + "+" + pw2;
  ScopedTimer t(label);
  return fused_res_block(
      x, get(w_, pw1 + "/kernel"), get(w_, pw1 + "/bias"),
      get(w_, dw + "/kernel"), get(w_, dw + "/bias"),
      get(w_, pw2 + "/kernel"), get(w_, pw2 + "/bias"), /*residual=*/false);
}

void YoloFastestNet::forward(const Tensor& img, Tensor& head_large,
                             Tensor& head_small) const {
  Tensor x = conv(img, "conv0", 2);
  x = chain3(x, "conv1_2", "conv1_3", "conv1_4");
  x = res(std::move(x), "res1_1");
  x = conv(x, "conv1_8");
  x = conv(x, "conv1_9", 2);
  x = conv(x, "conv2_1", 1, false, false);
  x = res(std::move(x), "res2_1");
  x = res(std::move(x), "res2_2");
  x = conv(x, "conv2_2");
  x = conv(x, "conv2_3", 2, true);
  x = conv(x, "conv3_1", 1, false, false);
  x = res(std::move(x), "res3_1");
  x = res(std::move(x), "res3_2");
  x = chain3(x, "conv3_2", "conv3_3", "conv3_4");
  x = res(std::move(x), "res3_3");
  x = res(std::move(x), "res3_4");
  x = res(std::move(x), "res3_5");
  x = res(std::move(x), "res3_6");
  x = conv(x, "conv3_5");
  x = conv(x, "conv3_6", 2, true);
  x = conv(x, "conv4_1", 1, false, false);
  x = res(std::move(x), "res4_1");
  x = res(std::move(x), "res4_2");
  x = res(std::move(x), "res4_3");
  x = res(std::move(x), "res4_4");
  Tensor c42 = conv(x, "conv4_2");
  x = conv(c42, "conv4_3", 2, true);
  x = conv(x, "conv5_1");
  x = res(std::move(x), "res5_1");
  x = res(std::move(x), "res5_2");
  x = res(std::move(x), "res5_3");
  x = res(std::move(x), "res5_4");
  x = res(std::move(x), "res5_5");
  Tensor c52 = conv(x, "conv5_2");
  x = conv(c52, "conv5_3", 1, true);
  x = conv(x, "conv5_4", 1, false, false);
  x = conv(x, "conv5_5", 1, true);
  x = conv(x, "conv5_6", 1, false, false);
  head_small = conv(x, "head_5", 1, false, false);

  if (is_lite_) {
    // Single-head topology (graph.py walk_topology_lite): identical walk up
    // to head_5, no deconv/concat branch.
    head_large = Tensor();
    return;
  }

  Tensor up = yf::deconv2x(c52, get(w_, "deconv5_1/kernel"), get(w_, "deconv5_1/bias"));
  x = concat_c(c42, up);
  x = conv(x, "conv4_1_1");
  x = conv(x, "conv4_1_2", 1, true);
  x = conv(x, "conv4_1_3", 1, false, false);
  x = conv(x, "conv4_1_4", 1, true);
  x = conv(x, "conv4_1_5", 1, false, false);
  head_large = conv(x, "head_4", 1, false, false);
}

}  // namespace yf
