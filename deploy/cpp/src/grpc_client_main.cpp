// ymt_grpc_client — C++ gRPC client CLI for the yolo_master_tpu inference
// server (the Triton-client analog of reference
// examples/YOLO11-Triton-CPP/inference.cpp).
//
//   ymt_grpc_client <host:port> <image.jpg|synthetic> [imgsz=640] [conf=0.25]
//
// Letterboxes the image with OpenCV (identical contract to the Python
// predictor: BGR->RGB, /255, gray-114 padding), sends one ModelInfer, prints
// detections mapped back to original-image coordinates.

#include <cstdio>
#include <cstdlib>
#include <string>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "ymt_grpc.hpp"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <host:port> <image|synthetic> [imgsz=640] [conf=0.25]\n",
                 argv[0]);
    return 2;
  }
  std::string target = argv[1];
  std::string source = argv[2];
  int imgsz = argc > 3 ? std::atoi(argv[3]) : 640;
  float conf = argc > 4 ? static_cast<float>(std::atof(argv[4])) : 0.25f;
  auto colon = target.rfind(':');
  std::string host = target.substr(0, colon);
  int port = std::atoi(target.c_str() + colon + 1);

  try {
    ymt::InferenceClient client(host, port);
    if (!client.server_live()) {
      std::fprintf(stderr, "server not live\n");
      return 1;
    }
    std::printf("metadata: %s\n", client.model_metadata().c_str());

    cv::Mat img;
    if (source == "synthetic") {
      img = cv::Mat(480, 640, CV_8UC3, cv::Scalar(30, 30, 30));
      cv::rectangle(img, {100, 100, 200, 150}, {0, 200, 255}, cv::FILLED);
    } else {
      img = cv::imread(source);
      if (img.empty()) {
        std::fprintf(stderr, "cannot read %s\n", source.c_str());
        return 1;
      }
    }
    // letterbox (scaleup=false, center, 114 padding) — mirrors data/letterbox.py
    int h0 = img.rows, w0 = img.cols;
    double r = std::min(1.0, std::min(double(imgsz) / h0, double(imgsz) / w0));
    int nw = int(std::round(w0 * r)), nh = int(std::round(h0 * r));
    int pad_x = int(std::round((imgsz - nw) / 2.0 - 0.1));
    int pad_y = int(std::round((imgsz - nh) / 2.0 - 0.1));
    cv::Mat resized;
    cv::resize(img, resized, {nw, nh}, 0, 0, cv::INTER_LINEAR);
    cv::Mat canvas(imgsz, imgsz, CV_8UC3, cv::Scalar(114, 114, 114));
    resized.copyTo(canvas(cv::Rect(pad_x, pad_y, nw, nh)));
    cv::Mat rgb;
    cv::cvtColor(canvas, rgb, cv::COLOR_BGR2RGB);

    ymt::Tensor images;
    images.dtype = "float32";
    images.shape = {1, imgsz, imgsz, 3};
    images.data.resize(size_t(imgsz) * imgsz * 3 * 4);
    float* dst = reinterpret_cast<float*>(images.data.data());
    for (int i = 0; i < imgsz * imgsz * 3; ++i)
      dst[i] = rgb.data[i] / 255.0f;

    int status = 0;
    auto out = client.infer(images, &status);
    if (status != 0) {
      std::fprintf(stderr, "ModelInfer failed: grpc-status %d\n", status);
      return 1;
    }
    const auto& boxes = out.at("boxes");
    const auto& scores = out.at("scores");
    const auto& classes = out.at("classes");
    const auto& valid = out.at("valid");
    size_t max_det = boxes.shape.size() >= 2 ? size_t(boxes.shape[1]) : 0;
    int n_shown = 0;
    for (size_t i = 0; i < max_det; ++i) {
      bool ok = valid.dtype == "bool" ? valid.data[i] != 0
                                      : valid.f32()[i] > 0.5f;
      float s = scores.f32()[i];
      if (!ok || s < conf) continue;
      // map back to original-image space
      float x1 = (boxes.f32()[i * 4 + 0] - pad_x) / float(r);
      float y1 = (boxes.f32()[i * 4 + 1] - pad_y) / float(r);
      float x2 = (boxes.f32()[i * 4 + 2] - pad_x) / float(r);
      float y2 = (boxes.f32()[i * 4 + 3] - pad_y) / float(r);
      int cls = int(classes.f32()[i]);
      std::printf("det %d: cls=%d conf=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n",
                  n_shown++, cls, s, x1, y1, x2, y2);
    }
    std::printf("total: %d detection(s) >= conf %.2f\n", n_shown, conf);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
