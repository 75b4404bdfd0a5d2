// Batch benchmark driver — native equivalent of the reference's
// ncnn_deploy/main.cpp: glob a test directory, detect each image, draw
// results, print per-image and average timing in the reference's log format
// so logs diff directly against the committed test_result fixtures.
//
// Unlike the reference driver, which re-declares anchors/thresholds/shapes
// as C++ literals (ncnn_deploy/main.cpp:16-24 — the duplication hazard
// SURVEY §5 calls out), ALL run configuration here comes from the .yfb
// itself: save_native_weights(..., io_config=cfg.io) embeds anchors, conf/
// NMS thresholds, class names and input resolution as __meta__ entries, so
// a custom auto-anchor export decodes natively with its own anchors.
// Decode strides are derived per head from the feature-map shape
// (stride = in_h / head.h), never hard-coded.
//
// Usage: yf_runner <weights.yfb> <data_dir> <result_dir> [in_h in_w]
//        (in_h/in_w default to the embedded input resolution)

#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "yf/model.h"
#include "yf/post.h"

namespace {

double now_ms() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <weights.yfb> <data_dir> <result_dir> [in_h in_w]\n",
                 argv[0]);
    return 1;
  }
  const std::string weights = argv[1], data_dir = argv[2], result_dir = argv[3];

  yf::YoloFastestNet net(weights);
  const yf::RunMeta meta = yf::read_run_meta(net.weights());
  if (!meta.present) {
    std::fprintf(stderr,
                 "%s carries no __meta__ run config (anchors/thresholds); "
                 "re-export it with the current exporter "
                 "(save_native_weights(..., io_config=cfg.io))\n",
                 weights.c_str());
    return 1;
  }
  const int in_h = argc > 4 ? std::atoi(argv[4]) : meta.input_h;
  const int in_w = argc > 5 ? std::atoi(argv[5]) : meta.input_w;
  if (in_h <= 0 || in_w <= 0) {
    std::fprintf(stderr, "no input resolution in meta or argv\n");
    return 1;
  }
  const int num_cls = (int)meta.class_names.size();

  std::vector<cv::String> files;
  cv::glob(data_dir + "/*.jpg", files);
  double avg = 0.0;
  // Machine-readable twin of the drawn results: one row per detection in
  // net-input coordinates, for automated parity checks against the JAX
  // backend (the reference's correctness check was eyeballing result JPEGs;
  // SURVEY §4 asks for numeric assertions instead).
  FILE* boxes_txt = std::fopen((result_dir + "/boxes.txt").c_str(), "w");
  for (const auto& f : files) {
    cv::Mat ori = cv::imread(f);
    if (ori.empty()) continue;
    cv::Mat gray;
    cv::cvtColor(ori, gray, cv::COLOR_BGR2GRAY);
    if (gray.rows != in_h || gray.cols != in_w)
      cv::resize(gray, gray, cv::Size(in_w, in_h));

    yf::Tensor x(in_h, in_w, 1);
    for (int y = 0; y < in_h; ++y)
      for (int xx = 0; xx < in_w; ++xx)
        *x.at(y, xx) = (gray.at<uchar>(y, xx) - 128.0f) / 255.0f;

    const double t0 = now_ms();
    yf::Tensor heads[2];
    net.forward(x, heads[0], heads[1]);
    const double t1 = now_ms();

    std::vector<yf::BBox> boxes;
    // Pair anchor groups with the heads actually produced, in emission
    // order (lite emits head_small only; its single anchor group is the
    // coarse one).  Strides come from the feature-map shapes.
    int group = 0;
    for (const yf::Tensor& head : heads) {
      if (!head.size() || group >= meta.num_scales) continue;
      yf::decode_head(head, meta.anchors.data() + group * meta.num_anchors * 2,
                      meta.num_anchors, num_cls, (float)in_h / head.h,
                      (float)in_w / head.w, meta.conf_thre, boxes);
      ++group;
    }
    yf::nms_per_class(boxes, num_cls, meta.nms_thre);
    const double t2 = now_ms();

    const float sw = (float)ori.cols / in_w, sh = (float)ori.rows / in_h;
    for (const auto& b : boxes) {
      cv::rectangle(ori, cv::Point((int)(b.x1 * sw), (int)(b.y1 * sh)),
                    cv::Point((int)(b.x2 * sw), (int)(b.y2 * sh)),
                    cv::Scalar(0, 255, 0), 2);
      char label[64];
      std::snprintf(label, sizeof(label), "%s %.2f",
                    meta.class_names[b.cls].c_str(), b.conf * b.cls_score);
      cv::putText(ori, label, cv::Point((int)(b.x1 * sw), (int)(b.y1 * sh) - 4),
                  0, 0.5, cv::Scalar(0, 255, 0), 1);
    }
    std::string name = f.substr(f.find_last_of('/') + 1);
    if (boxes_txt)
      for (const auto& b : boxes)
        std::fprintf(boxes_txt, "%s %.2f %.2f %.2f %.2f %.6f %.6f %d\n",
                     name.c_str(), b.x1, b.y1, b.x2, b.y2, b.conf,
                     b.cls_score, b.cls);
    cv::imwrite(result_dir + "/result_" + name, ori);
    const double total = t2 - t0;
    avg += total;
    std::printf("image_name:%s -> infer time:%.2fms, post_process time:%.2fms, total time:%.2fms\n",
                name.c_str(), t1 - t0, t2 - t1, total);
  }
  if (boxes_txt) std::fclose(boxes_txt);
  if (!files.empty())
    std::printf("avg_time:%.2fms\n", avg / files.size());
  return 0;
}
