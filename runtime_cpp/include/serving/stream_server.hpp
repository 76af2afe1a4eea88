// Bidirectional streaming transport for the greeting service.
//
// Implements `ProactiveGreeting.infer(stream VideoRequest) → stream
// InferResponse` (HRI/TFVT_HRI/jetson/proactive_greeting.proto:8-21) as
// a length-prefixed TCP protocol — this container has protoc but no
// gRPC C++ runtime, so per the documented mapping below this is the
// wire-compatible-in-spirit replacement (a gRPC front could be attached
// to the same GreetingPipeline without touching this file).
//
// Wire format (all little-endian):
//   frame        := uint32 payload_len | payload
//   payload      := uint8 msg_type | body
//   msg_type 1   := VideoRequest
//       body     := int32 reqID | int32 lag_ms |
//                   uint32 wakeup_len | wakeup (utf-8) |
//                   uint32 npix | float32 pixels[npix]
//                   (pixels = letterboxed 416·416·3 RGB in [0,1])
//   msg_type 2   := InferResponse
//       body     := uint32 json_len | json (utf-8)
//
// proto field mapping: reqID → VideoRequest.reqID, lag_ms →
// VideoRequest.lag, wakeup → VideoRequest.wakeup, pixels →
// VideoRequest.curFrame (sent decoded — JPEG decode stays host-side),
// json → InferResponse.response (the same JSON the reference's
// ConvertPredToJsons streams back, infer_v3.cpp:750-823).
#pragma once

#include <atomic>
#include <cstdint>
#include <string>
#include <thread>
#include <vector>

#include "serving/pipeline.hpp"

namespace serving {

class StreamServer {
 public:
  // port 0 → ephemeral; the bound port is available after Start().
  StreamServer(GreetingPipeline& pipeline,
               std::vector<MultimodalAction> catalog,
               uint16_t port = 0);
  ~StreamServer();

  void Start();
  void Stop();
  uint16_t port() const { return port_; }

 private:
  void AcceptLoop();
  void ReadLoop(int fd);
  void WriteLoop(int fd);

  GreetingPipeline& pipeline_;
  std::vector<MultimodalAction> catalog_;
  uint16_t port_;
  int listen_fd_ = -1;
  std::atomic<bool> running_{false};
  std::thread accept_thread_;
};

}  // namespace serving
