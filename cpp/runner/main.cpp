// Batch benchmark driver — native equivalent of the reference's
// ncnn_deploy/main.cpp: glob a test directory, detect each image, draw
// results, print per-image and average timing in the reference's log format
// so logs diff directly against the committed test_result fixtures.
//
// Usage: yf_runner <weights.yfb> <data_dir> <result_dir> [in_h in_w]

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

// Anchor presets from the framework config (configs/config.py): groups 0-1
// for 256x320 inputs, groups 1-2 for 512x640.
const float kAnchors256[12] = {10, 13, 16, 30, 33, 23, 150, 75, 100, 100, 75, 150};
const float kAnchors512[12] = {150, 75, 100, 100, 75, 150, 300, 150, 200, 200, 150, 300};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <weights.yfb> <data_dir> <result_dir> [in_h in_w]\n",
                 argv[0]);
    return 1;
  }
  const std::string weights = argv[1], data_dir = argv[2], result_dir = argv[3];
  const int in_h = argc > 4 ? std::atoi(argv[4]) : 256;
  const int in_w = argc > 5 ? std::atoi(argv[5]) : 320;
  const float* anchors = (in_h >= 512) ? kAnchors512 : kAnchors256;
  const float conf_thre = 0.5f, nms_thre = 0.2f;
  const int num_cls = 3;
  const char* cls_names[3] = {"carrier", "defender", "destroyer"};

  yf::YoloFastestNet net(weights);

  std::vector<cv::String> files;
  cv::glob(data_dir + "/*.jpg", files);
  double avg = 0.0;
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
    yf::decode_head(heads[0], anchors, 3, num_cls, 16, 16, conf_thre, boxes);
    yf::decode_head(heads[1], anchors + 6, 3, num_cls, 32, 32, conf_thre, boxes);
    yf::nms_per_class(boxes, num_cls, nms_thre);
    const double t2 = now_ms();

    const float sw = (float)ori.cols / in_w, sh = (float)ori.rows / in_h;
    for (const auto& b : boxes) {
      cv::rectangle(ori, cv::Point((int)(b.x1 * sw), (int)(b.y1 * sh)),
                    cv::Point((int)(b.x2 * sw), (int)(b.y2 * sh)),
                    cv::Scalar(0, 255, 0), 2);
      char label[64];
      std::snprintf(label, sizeof(label), "%s %.2f", cls_names[b.cls],
                    b.conf * b.cls_score);
      cv::putText(ori, label, cv::Point((int)(b.x1 * sw), (int)(b.y1 * sh) - 4),
                  0, 0.5, cv::Scalar(0, 255, 0), 1);
    }
    std::string name = f.substr(f.find_last_of('/') + 1);
    cv::imwrite(result_dir + "/result_" + name, ori);
    const double total = t2 - t0;
    avg += total;
    std::printf("image_name:%s -> infer time:%.2fms, post_process time:%.2fms, total time:%.2fms\n",
                name.c_str(), t1 - t0, t2 - t1, total);
  }
  if (!files.empty())
    std::printf("avg_time:%.2fms\n", avg / files.size());
  return 0;
}
