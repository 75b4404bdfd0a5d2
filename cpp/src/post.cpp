#include "yf/post.h"

#include <algorithm>
#include <cmath>

namespace yf {

namespace {

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

inline float iou(const BBox& a, const BBox& b) {
  const float x1 = std::max(a.x1, b.x1), y1 = std::max(a.y1, b.y1);
  const float x2 = std::min(a.x2, b.x2), y2 = std::min(a.y2, b.y2);
  const float inter = std::max(x2 - x1, 0.0f) * std::max(y2 - y1, 0.0f);
  const float ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
  return ua > 0 ? inter / ua : 0.0f;
}

}  // namespace

void decode_head(const Tensor& head, const float* anchors, int num_anchors,
                 int num_cls, float stride_h, float stride_w, float conf_thre,
                 std::vector<BBox>& out) {
  const int attrs = 5 + num_cls;
  for (int y = 0; y < head.h; ++y) {
    for (int x = 0; x < head.w; ++x) {
      const float* p = head.at(y, x);
      for (int a = 0; a < num_anchors; ++a) {
        const float* q = p + a * attrs;  // channel order: anchor-major
        const float conf = sigmoidf(q[4]);
        if (!(conf > conf_thre)) continue;
        int best = 0;
        for (int c = 1; c < num_cls; ++c)
          if (q[5 + c] > q[5 + best]) best = c;
        const float cx = (x + sigmoidf(q[0])) * stride_w;
        const float cy = (y + sigmoidf(q[1])) * stride_h;
        const float bw = std::exp(q[2]) * anchors[2 * a];
        const float bh = std::exp(q[3]) * anchors[2 * a + 1];
        BBox bb;
        // detect.py:66 uses Python round (half-to-even) == nearbyint default
        bb.x1 = (float)std::nearbyint(cx - bw / 2);
        bb.y1 = (float)std::nearbyint(cy - bh / 2);
        bb.x2 = (float)std::nearbyint(cx + bw / 2);
        bb.y2 = (float)std::nearbyint(cy + bh / 2);
        bb.conf = conf;
        bb.cls_score = sigmoidf(q[5 + best]);
        bb.cls = best;
        out.push_back(bb);
      }
    }
  }
}

void nms_per_class(std::vector<BBox>& boxes, int num_cls, float nms_thre) {
  std::stable_sort(boxes.begin(), boxes.end(),
                   [](const BBox& a, const BBox& b) { return a.conf > b.conf; });
  std::vector<BBox> kept;
  kept.reserve(boxes.size());
  for (int c = 0; c < num_cls; ++c) {
    for (size_t i = 0; i < boxes.size(); ++i) {
      if (boxes[i].cls != c) continue;
      bool suppressed = false;
      for (const BBox& k : kept) {
        if (k.cls == c && iou(k, boxes[i]) > nms_thre) {
          suppressed = true;
          break;
        }
      }
      if (!suppressed) kept.push_back(boxes[i]);
    }
  }
  // keep overall conf-descending order like the fixed-size device output
  std::stable_sort(kept.begin(), kept.end(),
                   [](const BBox& a, const BBox& b) { return a.conf > b.conf; });
  boxes.swap(kept);
}

}  // namespace yf
