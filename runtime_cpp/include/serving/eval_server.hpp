// Offline batch-of-frames evaluation service.
//
// Native counterpart of the reference's C++ eval servers
// (HRI/TFVT_HRI/jetson/eval_v3.cpp:1215-1310, eval_server.proto:7-21):
// `EvalServer.infer(EvalRequest{nframe, frames}) → EvalResponse
// {response, response_score, trigger_pred, nullact_score, nullact_id}`.
// Unlike the online stream server this is synchronous request/response
// — the whole window is scored in one pass (the reference clears its
// sliding-window deques per request, eval_v3.cpp:1220-1224). Used for
// precision/recall threshold sweeps by the eval client
// (jetson/parallel_eval.py ↔ paddlerobotics_tpu/hri/eval_client.py).
//
// Transport: the same length-prefixed TCP framing as stream_server.hpp
// (no gRPC C++ runtime in this image; a gRPC front could attach to
// ScoreWindow without touching this file). Wire format (little-endian):
//   frame      := uint32 payload_len | payload
//   payload    := uint8 msg_type | body
//   msg_type 3 := EvalRequest
//       body   := int32 nframe | nframe × (uint32 npix |
//                 float32 pixels[npix])
//                 (pixels = letterboxed 416·416·3 RGB in [0,1];
//                 JPEG decode stays host-side, like the stream path)
//   msg_type 4 := EvalResponse
//       body   := float32 response_score | float32 trigger_pred |
//                 float32 nullact_score | int32 nullact_id |
//                 uint32 json_len | json (utf-8)
// proto field mapping: nframe → EvalRequest.nframe, pixels →
// EvalRequest.frames (decoded), json → EvalResponse.response, the four
// scalars → the same-named EvalResponse fields.
#pragma once

#include <atomic>
#include <cstdint>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include "serving/pipeline.hpp"

namespace serving {

struct EvalConfig {
  float trigger_threshold = 0.8f;  // per-variant 0.65-0.9
  float near_field_frac = 0.1f;    // min bbox height fraction
};

// R(2+1)D clip constants (jetson/eval_r2plus1d.cpp:44-48):
// 8-frame windows of 224x224 images, Kinetics normalization.
constexpr int kClipLen = 8;
constexpr int kClipRes = 224;

// Clip-scoring backend — the r2plus1d baseline's model boundary
// (eval_r2plus1d.cpp RunCtrl): a preprocessed clip of kClipLen frames,
// each 3*224*224 CHW Kinetics-normalized floats, scored in one pass to
// the full action distribution plus a softmax-temperature top-k sampled
// action id (the model's own topK sampling head, lines 246-258).
class ClipBackend {
 public:
  virtual ~ClipBackend() = default;
  struct ClipResult {
    std::vector<float> act_scores;  // per-action probabilities
    int sampled_id = 0;             // top-k sample
  };
  virtual ClipResult Score(const std::vector<std::vector<float>>& clip) = 0;
};

// 416-letterboxed [0,1] RGB (HWC) -> 3*224*224 CHW Kinetics-normalized
// (PreprocessImage, eval_r2plus1d.cpp:113-164; nearest-neighbor resize
// like LetterboxResize).
std::vector<float> PreprocessClipFrame(const std::vector<float>& pixels);

struct EvalResult {
  std::string json;          // EvalResponse.response
  float response_score = 0.f;
  float trigger_pred = 0.f;
  float nullact_score = 0.f;
  int nullact_id = 0;
};

class EvalServer {
 public:
  // port 0 → ephemeral; the bound port is available after Start().
  EvalServer(std::shared_ptr<InferBackend> backend,
             std::vector<MultimodalAction> catalog, EvalConfig cfg,
             uint16_t port = 0);
  // R(2+1)D variant (jetson/eval_r2plus1d.cpp EvalServiceImpl): same
  // service + wire format, but requests are scored by a clip backend
  // instead of detect+attend.
  EvalServer(std::shared_ptr<ClipBackend> clip_backend,
             std::vector<MultimodalAction> catalog, EvalConfig cfg,
             uint16_t port = 0);
  ~EvalServer();

  void Start();
  void Stop();
  uint16_t port() const { return port_; }

  // Score one window of frames synchronously: detect per frame, build
  // the 10-frame token window (left-padded with empty frames if
  // shorter, tail-truncated if longer), one Attend pass, then the
  // offline decision rule (threshold + near-field; no cooldown/lag —
  // the reference's eval path passes lag=0, wakeup=false,
  // eval_v3.cpp:1297-1299). Exposed for tests and in-process use.
  EvalResult ScoreWindow(const std::vector<RawFrame>& frames);

  // Clip-variant scoring (eval_r2plus1d.cpp infer:378-410 +
  // ConvertPredToJsons:262-309): preprocess the last kClipLen frames
  // (repeat-first pad when shorter — the reference's offline RunEval
  // throws instead; a server degrades gracefully), one clip pass, then
  // the null-action rule. Dispatched by ServeConnection when this
  // server was built with a ClipBackend.
  EvalResult ScoreClip(const std::vector<RawFrame>& frames);

 private:
  void AcceptLoop();
  void ServeConnection(int fd);

  std::shared_ptr<InferBackend> backend_;
  std::shared_ptr<ClipBackend> clip_backend_;
  std::vector<MultimodalAction> catalog_;
  EvalConfig cfg_;
  uint16_t port_;
  int listen_fd_ = -1;
  std::atomic<int> client_fd_{-1};   // live connection, for Stop()
  std::atomic<bool> running_{false};
  std::thread accept_thread_;
};

}  // namespace serving
