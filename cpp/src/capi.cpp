// C ABI for the native runtime — consumed from Python via ctypes
// (yolofastest_tpu/native/engine.py) and by external embedders.

#include <cstring>
#include <vector>

#include "yf/model.h"
#include "yf/post.h"

extern "C" {

void* yf_create(const char* weights_path) {
  try {
    return new yf::YoloFastestNet(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void yf_destroy(void* h) { delete static_cast<yf::YoloFastestNet*>(h); }

// 1 when the loaded .yfb is the single-head lite topology, else 0.
int yf_is_lite(void* h) {
  return static_cast<yf::YoloFastestNet*>(h)->is_lite() ? 1 : 0;
}

// Number of layers running real int8 arithmetic (0 = pure fp32 engine).
int yf_int8_layers(void* h) {
  return static_cast<yf::YoloFastestNet*>(h)->int8_layer_count();
}

// img: (in_h, in_w) float32 normalized gray.  Writes raw NHWC head logits to
// caller buffers sized (in_h/16)*(in_w/16)*ch and (in_h/32)*(in_w/32)*ch.
// For lite weights head_large may be null (nothing is written to it).
// Returns 0 on success.
int yf_forward(void* h, const float* img, int in_h, int in_w,
               float* head_large, float* head_small) {
  try {
    auto* net = static_cast<yf::YoloFastestNet*>(h);
    yf::Tensor x(in_h, in_w, 1);
    std::memcpy(x.data.data(), img, sizeof(float) * (size_t)in_h * in_w);
    yf::Tensor hl, hs;
    net->forward(x, hl, hs);
    if (hl.size() && head_large)
      std::memcpy(head_large, hl.data.data(), sizeof(float) * hl.size());
    std::memcpy(head_small, hs.data.data(), sizeof(float) * hs.size());
    return 0;
  } catch (...) {
    return -1;
  }
}

// Full detect: forward + decode (all heads) + per-class NMS.
// anchors: num_scales * num_anchors * 2 floats; anchor group 0 pairs with
// the first emitted head (stride 16 for the two-head net, stride 32 for
// lite, whose single head IS the stride-32 one).
// out rows: x1, y1, x2, y2, conf, cls_score, cls.  Returns detection count
// (<= max_det) or -1 on error.
int yf_detect(void* h, const float* img, int in_h, int in_w,
              const float* anchors, int num_scales, int num_anchors,
              int num_cls, float conf_thre, float nms_thre,
              int max_det, float* out) {
  try {
    auto* net = static_cast<yf::YoloFastestNet*>(h);
    yf::Tensor x(in_h, in_w, 1);
    std::memcpy(x.data.data(), img, sizeof(float) * (size_t)in_h * in_w);
    yf::Tensor heads[2];
    net->forward(x, heads[0], heads[1]);

    std::vector<yf::BBox> boxes;
    // Anchor groups pair with the heads actually produced, in emission
    // order (lite emits heads[1] only).  Strides derive from the feature
    // map shapes so decode survives topology/stride variants.
    int group = 0;
    for (const yf::Tensor& head : heads) {
      if (!head.size() || group >= num_scales) continue;
      yf::decode_head(head, anchors + group * num_anchors * 2, num_anchors,
                      num_cls, (float)in_h / head.h, (float)in_w / head.w,
                      conf_thre, boxes);
      ++group;
    }
    yf::nms_per_class(boxes, num_cls, nms_thre);

    const int n = std::min((int)boxes.size(), max_det);
    for (int i = 0; i < n; ++i) {
      const yf::BBox& b = boxes[i];
      float* row = out + (size_t)i * 7;
      row[0] = b.x1; row[1] = b.y1; row[2] = b.x2; row[3] = b.y2;
      row[4] = b.conf; row[5] = b.cls_score; row[6] = (float)b.cls;
    }
    return n;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
