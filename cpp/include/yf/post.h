// YOLO decode + per-class NMS — native equivalent of the reference's C++
// postprocess (YOLO_ncnn.cpp:83-234), with detect.py as the semantics
// oracle.  Fixes the reference's early-return bug that dropped head_small
// (YOLO_ncnn.cpp:165, SURVEY.md §7).
#pragma once

#include <vector>

#include "yf/tensor.h"

namespace yf {

struct BBox {
  float x1, y1, x2, y2;
  float conf;       // objectness
  float cls_score;  // best class sigmoid score
  int cls;
};

// head: NHWC (h, w, A*(5+C)); anchors: A pairs (w, h) in net-input pixels.
// stride_h/w map feature cells to input pixels.  conf gate is strict '>'
// and box corners round half-to-even (detect.py:58,66).
void decode_head(const Tensor& head, const float* anchors, int num_anchors,
                 int num_cls, float stride_h, float stride_w, float conf_thre,
                 std::vector<BBox>& out);

// In-place per-class greedy NMS: sort by conf desc, suppress IOU > nms_thre
// within the same class (detect.py:69-84 semantics, no +1 offset).
void nms_per_class(std::vector<BBox>& boxes, int num_cls, float nms_thre);

}  // namespace yf
