// Native gRPC front for the greeting + eval services.
//
// The reference's Jetson servers speak gRPC directly
// (jetson/infer_v3.cpp:1583-1690 `ProactiveGreeting.infer` bidi stream;
// jetson/eval_v3.cpp:1196-1320 `EvalServer.infer` unary;
// proactive_greeting.proto:8-21, eval_server.proto:7-21). This image
// has no gRPC C++ runtime, so this is a from-scratch HTTP/2 server
// speaking the real gRPC wire protocol: connection preface, SETTINGS /
// PING / WINDOW_UPDATE / RST_STREAM handling, HPACK header blocks
// (serving/hpack.hpp, incl. Huffman), length-prefixed gRPC messages
// across DATA frames, receive-flow-control replenishment, and
// grpc-status trailers — interoperable with grpcio and grpc C-core
// clients (validated against grpcio in tests/test_native_pipeline.py).
//
// Service semantics mirror the reference's lock-step Read/Write loop
// (infer_v3.cpp:1589-1640): one InferResponse per VideoRequest on the
// bidi stream; EvalServer.infer scores a whole window per request.
#pragma once

#include <atomic>
#include <cstdint>
#include <functional>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "serving/eval_server.hpp"
#include "serving/pipeline.hpp"

namespace serving {

class GrpcServer {
 public:
  // greeting: decision backend for /grpc.ProactiveGreeting/infer —
  //   (pixels, lag_ms, wakeup) → decision JSON. Null = method absent.
  // eval: /evalserver.EvalServer/infer — frames → EvalResult.
  using GreetFn = std::function<std::string(
      std::vector<float> pixels, int32_t lag_ms, const std::string& wakeup)>;
  using EvalFn = std::function<EvalResult(std::vector<RawFrame> frames)>;

  GrpcServer(GreetFn greeting, EvalFn eval, uint16_t port = 0);
  ~GrpcServer();

  void Start();
  void Stop();
  uint16_t port() const { return port_; }

 private:
  void AcceptLoop();
  void ServeConnection(int fd);

  GreetFn greeting_;
  EvalFn eval_;
  uint16_t port_;
  int listen_fd_ = -1;
  std::atomic<bool> running_{false};
  std::thread accept_thread_;
  std::vector<std::thread> conns_;
  std::mutex fds_mu_;
  std::vector<int> client_fds_;
};

}  // namespace serving
