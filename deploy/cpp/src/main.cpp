// yolo-master-tpu C++ SavedModel inference CLI.
//
// Native serving-path counterpart of the reference's C++ deployment examples
// (examples/YOLOv8-ONNXRuntime-CPP, Cross-Platform-Edge-Deployment): loads the
// exporter's TF SavedModel (decode+NMS embedded) through the TensorFlow C API
// (robust against C++ session-factory registry duplication in pip wheels),
// runs OpenCV letterbox preprocess + NHWC blob, prints detections.
//
// Usage: ymt_infer <saved_model_dir> <image> [conf] [imgsz]

#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>

#include "tensorflow/c/c_api.h"

#include "ymt_postprocess.hpp"

namespace {

struct TFSession {
  TF_Graph* graph = nullptr;
  TF_Session* session = nullptr;
  TF_Status* status = nullptr;

  bool Load(const std::string& dir) {
    status = TF_NewStatus();
    graph = TF_NewGraph();
    TF_SessionOptions* opts = TF_NewSessionOptions();
    TF_Buffer* run_opts = nullptr;
    const char* tags[] = {"serve"};
    session = TF_LoadSessionFromSavedModel(opts, run_opts, dir.c_str(), tags, 1, graph, nullptr, status);
    TF_DeleteSessionOptions(opts);
    if (TF_GetCode(status) != TF_OK) {
      std::fprintf(stderr, "error: LoadSavedModel failed: %s\n", TF_Message(status));
      return false;
    }
    return true;
  }

  ~TFSession() {
    if (session) {
      TF_CloseSession(session, status);
      TF_DeleteSession(session, status);
    }
    if (graph) TF_DeleteGraph(graph);
    if (status) TF_DeleteStatus(status);
  }
};

// jax2tf serving signatures expose the placeholder as
// "serving_default_images:0" and results via "StatefulPartitionedCall:0".
TF_Output FindOp(TF_Graph* graph, const char* name, int index) {
  TF_Operation* op = TF_GraphOperationByName(graph, name);
  return {op, index};
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <saved_model_dir> <image> [conf=0.25] [imgsz=640]\n", argv[0]);
    return 2;
  }
  const std::string model_dir = argv[1];
  const std::string image_path = argv[2];
  const float conf = argc > 3 ? std::stof(argv[3]) : 0.25f;
  const int imgsz = argc > 4 ? std::stoi(argv[4]) : 640;

  cv::Mat img = cv::imread(image_path);
  if (img.empty()) {
    std::fprintf(stderr, "error: cannot read image %s\n", image_path.c_str());
    return 1;
  }

  TFSession tf;
  if (!tf.Load(model_dir)) return 1;

  TF_Output input = FindOp(tf.graph, "serving_default_images", 0);
  TF_Output output = FindOp(tf.graph, "StatefulPartitionedCall", 0);
  if (!input.oper || !output.oper) {
    std::fprintf(stderr, "error: serving signature ops not found in graph\n");
    return 1;
  }

  ymt::LetterboxInfo lb;
  cv::Mat padded = ymt::Letterbox(img, imgsz, imgsz, &lb);
  std::vector<float> blob = ymt::BlobNHWC(padded);

  const int64_t dims[4] = {1, imgsz, imgsz, 3};
  TF_Tensor* in_tensor = TF_AllocateTensor(TF_FLOAT, dims, 4, blob.size() * sizeof(float));
  std::memcpy(TF_TensorData(in_tensor), blob.data(), blob.size() * sizeof(float));

  TF_Tensor* out_tensor = nullptr;
  const auto t0 = std::chrono::steady_clock::now();
  TF_SessionRun(tf.session, nullptr, &input, &in_tensor, 1, &output, &out_tensor, 1, nullptr, 0,
                nullptr, tf.status);
  const auto ms =
      std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - t0).count();
  TF_DeleteTensor(in_tensor);
  if (TF_GetCode(tf.status) != TF_OK) {
    std::fprintf(stderr, "error: session run failed: %s\n", TF_Message(tf.status));
    return 1;
  }

  const int ndims = TF_NumDims(out_tensor);
  const float* data = static_cast<const float*>(TF_TensorData(out_tensor));
  std::vector<ymt::Detection> dets;
  if (ndims == 3 && TF_Dim(out_tensor, 2) == 6) {  // nms=true contract
    dets = ymt::ParseFusedOutput(data, static_cast<int>(TF_Dim(out_tensor, 1)), lb, img.cols,
                                 img.rows, conf);
  } else {  // raw decode contract [1, A, 4+nc]
    const int nc = static_cast<int>(TF_Dim(out_tensor, 2)) - 4;
    dets = ymt::DecodeAndNms(data, static_cast<int>(TF_Dim(out_tensor, 1)), nc, lb, img.cols,
                             img.rows, conf);
  }
  TF_DeleteTensor(out_tensor);

  std::printf("inference %.2f ms, %zu detections\n", ms, dets.size());
  for (const auto& d : dets) {
    std::printf("class=%d score=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n", d.class_id, d.score, d.box.x,
                d.box.y, d.box.x + d.box.width, d.box.y + d.box.height);
  }
  return 0;
}
