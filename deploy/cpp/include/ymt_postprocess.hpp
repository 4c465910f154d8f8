// yolo_master_tpu C++ serving pre/post library.
//
// Native-side counterpart of the Python predict pipeline (the TPU analog of
// the reference's examples/cpp/common/yolo_postprocess.hpp capability:
// letterbox preprocess, NHWC blob, decode, greedy + cluster-weighted NMS,
// coordinate un-letterboxing). Header-only, OpenCV for image IO/resize.
//
// Works with both export contracts of engine/exporter.py:
//   * nms=true graphs  -> output [B, max_det, 6] (x1,y1,x2,y2,score,cls)
//   * nms=false graphs -> output [B, A, 4+nc]   (xywh + class scores),
//     postprocessed here with DecodeAndNms().

#pragma once

#include <algorithm>
#include <cmath>
#include <numeric>
#include <string>
#include <vector>

#include <opencv2/imgproc.hpp>

namespace ymt {

struct Detection {
  cv::Rect2f box;  // xyxy in ORIGINAL image coordinates
  float score = 0.f;
  int class_id = -1;
};

struct LetterboxInfo {
  float ratio = 1.f;
  int pad_x = 0;
  int pad_y = 0;
};

// Aspect-preserving resize + 114-gray pad, centered — pixel-compatible with
// the Python letterbox (data/letterbox.py) and the reference LetterBox
// (ultralytics/data/augment.py:1605).
inline cv::Mat Letterbox(const cv::Mat& img, int dst_h, int dst_w, LetterboxInfo* info,
                         bool scaleup = true) {
  const float r0 = std::min(dst_h / static_cast<float>(img.rows),
                            dst_w / static_cast<float>(img.cols));
  const float r = scaleup ? r0 : std::min(r0, 1.0f);
  const int new_w = static_cast<int>(std::lround(img.cols * r));
  const int new_h = static_cast<int>(std::lround(img.rows * r));
  const float dw = (dst_w - new_w) / 2.0f;
  const float dh = (dst_h - new_h) / 2.0f;
  const int top = static_cast<int>(std::lround(dh - 0.1));
  const int bottom = static_cast<int>(std::lround(dh + 0.1));
  const int left = static_cast<int>(std::lround(dw - 0.1));
  const int right = static_cast<int>(std::lround(dw + 0.1));

  cv::Mat resized;
  cv::resize(img, resized, {new_w, new_h}, 0, 0, cv::INTER_LINEAR);
  cv::Mat out;
  cv::copyMakeBorder(resized, out, top, bottom, left, right, cv::BORDER_CONSTANT,
                     cv::Scalar(114, 114, 114));
  if (info) {
    info->ratio = r;
    info->pad_x = left;
    info->pad_y = top;
  }
  return out;
}

// BGR HWC uint8 -> RGB NHWC float32 /255 blob (TPU-native layout; the torch
// reference produces NCHW — NHWC is the deliberate difference here).
inline std::vector<float> BlobNHWC(const cv::Mat& img) {
  std::vector<float> blob(static_cast<size_t>(img.rows) * img.cols * 3);
  size_t i = 0;
  for (int y = 0; y < img.rows; ++y) {
    const cv::Vec3b* row = img.ptr<cv::Vec3b>(y);
    for (int x = 0; x < img.cols; ++x) {
      blob[i++] = row[x][2] / 255.f;  // R
      blob[i++] = row[x][1] / 255.f;  // G
      blob[i++] = row[x][0] / 255.f;  // B
    }
  }
  return blob;
}

inline float Iou(const cv::Rect2f& a, const cv::Rect2f& b) {
  const float inter = (a & b).area();
  const float uni = a.area() + b.area() - inter + 1e-7f;
  return inter / uni;
}

// Map a box from letterbox space back to original image coordinates.
inline cv::Rect2f Unletterbox(cv::Rect2f box, const LetterboxInfo& lb, int orig_w, int orig_h) {
  float x1 = (box.x - lb.pad_x) / lb.ratio;
  float y1 = (box.y - lb.pad_y) / lb.ratio;
  float x2 = (box.x + box.width - lb.pad_x) / lb.ratio;
  float y2 = (box.y + box.height - lb.pad_y) / lb.ratio;
  x1 = std::clamp(x1, 0.f, static_cast<float>(orig_w));
  y1 = std::clamp(y1, 0.f, static_cast<float>(orig_h));
  x2 = std::clamp(x2, 0.f, static_cast<float>(orig_w));
  y2 = std::clamp(y2, 0.f, static_cast<float>(orig_h));
  return {x1, y1, x2 - x1, y2 - y1};
}

// Parse the nms=true export contract: rows of (x1,y1,x2,y2,score,cls) in
// letterbox coordinates; invalid rows have score == 0 / cls == -1.
inline std::vector<Detection> ParseFusedOutput(const float* data, int max_det,
                                               const LetterboxInfo& lb, int orig_w, int orig_h,
                                               float conf_thres = 0.25f) {
  std::vector<Detection> dets;
  for (int i = 0; i < max_det; ++i) {
    const float* row = data + i * 6;
    if (row[4] <= conf_thres || row[5] < 0) continue;
    Detection d;
    d.box = Unletterbox({row[0], row[1], row[2] - row[0], row[3] - row[1]}, lb, orig_w, orig_h);
    d.score = row[4];
    d.class_id = static_cast<int>(row[5]);
    dets.push_back(d);
  }
  return dets;
}

// Greedy class-aware NMS over decoded candidates (the host fallback for
// nms=false graphs; same greedy semantics as the on-device kernel).
inline std::vector<int> GreedyNms(const std::vector<cv::Rect2f>& boxes,
                                  const std::vector<float>& scores, float iou_thres,
                                  int max_det) {
  std::vector<int> order(boxes.size());
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<bool> suppressed(boxes.size(), false);
  std::vector<int> keep;
  for (int idx : order) {
    if (suppressed[idx]) continue;
    keep.push_back(idx);
    if (static_cast<int>(keep.size()) >= max_det) break;
    for (int j : order) {
      if (!suppressed[j] && j != idx && Iou(boxes[idx], boxes[j]) > iou_thres) suppressed[j] = true;
    }
  }
  return keep;
}

// Decode the nms=false contract ([A, 4+nc] xywh + scores, letterbox coords)
// with class-aware greedy NMS or Gaussian cluster-weighted fusion (CW-NMS,
// reference README.md:338-364).
inline std::vector<Detection> DecodeAndNms(const float* data, int num_anchors, int nc,
                                           const LetterboxInfo& lb, int orig_w, int orig_h,
                                           float conf_thres = 0.25f, float iou_thres = 0.45f,
                                           int max_det = 300, bool cluster = false,
                                           float sigma = 0.1f) {
  constexpr float kMaxWh = 7680.f;
  std::vector<cv::Rect2f> boxes, offset_boxes;
  std::vector<float> scores;
  std::vector<int> classes;
  const int stride = 4 + nc;
  for (int a = 0; a < num_anchors; ++a) {
    const float* row = data + a * stride;
    const float* cls_scores = row + 4;
    const int best = static_cast<int>(std::max_element(cls_scores, cls_scores + nc) - cls_scores);
    const float conf = cls_scores[best];
    if (conf <= conf_thres) continue;
    const float cx = row[0], cy = row[1], w = row[2], h = row[3];
    cv::Rect2f box{cx - w / 2, cy - h / 2, w, h};
    boxes.push_back(box);
    offset_boxes.push_back({box.x + best * kMaxWh, box.y + best * kMaxWh, box.width, box.height});
    scores.push_back(conf);
    classes.push_back(best);
  }

  std::vector<Detection> dets;
  const std::vector<int> keep = GreedyNms(offset_boxes, scores, iou_thres, max_det);
  for (int idx : keep) {
    cv::Rect2f fused = boxes[idx];
    if (cluster) {
      // Gaussian-weighted average over same-class cluster members
      float wsum = 0.f;
      cv::Vec4f acc{0, 0, 0, 0};
      for (size_t j = 0; j < boxes.size(); ++j) {
        if (classes[j] != classes[idx]) continue;
        const float iou = Iou(boxes[idx], boxes[j]);
        if (j != static_cast<size_t>(idx) && iou <= iou_thres) continue;
        const float wj = scores[j] * std::exp(-(1 - iou) * (1 - iou) / sigma);
        acc += cv::Vec4f(boxes[j].x, boxes[j].y, boxes[j].x + boxes[j].width,
                         boxes[j].y + boxes[j].height) * wj;
        wsum += wj;
      }
      if (wsum > 0) fused = {acc[0] / wsum, acc[1] / wsum, (acc[2] - acc[0]) / wsum, (acc[3] - acc[1]) / wsum};
    }
    Detection d;
    d.box = Unletterbox(fused, lb, orig_w, orig_h);
    d.score = scores[idx];
    d.class_id = classes[idx];
    dets.push_back(d);
  }
  return dets;
}

}  // namespace ymt
