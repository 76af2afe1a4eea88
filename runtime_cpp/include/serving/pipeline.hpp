// Latency-hiding serving pipeline.
// Rebuild of the thread architecture of jetson/infer_v3.cpp:1736-1756:
// four detached workers (ingest/ProcessRequest, AsyncRunDetector,
// AsyncRunVTokenizerAttnCtrl, ProcessLog) communicating through
// mutex-guarded deques (infer_v3.cpp:110-114), with bounded queues and
// clean shutdown added.
#pragma once

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <optional>
#include <thread>
#include <vector>

#include "serving/instance.hpp"

namespace serving {

// Bounded MPMC queue (the hand-rolled mutex+deque of infer_v3.cpp, with
// blocking pop + capacity backpressure).
template <typename T>
class BoundedQueue {
 public:
  explicit BoundedQueue(size_t cap = 64) : cap_(cap) {}

  bool Push(T item) {
    std::unique_lock<std::mutex> lk(mu_);
    not_full_.wait(lk, [&] { return q_.size() < cap_ || closed_; });
    if (closed_) return false;
    q_.push_back(std::move(item));
    not_empty_.notify_one();
    return true;
  }

  // Drop-oldest push for real-time streams (camera frames must not
  // back up — mirrors the lag-sensitive frame dropping,
  // infer_v3.cpp:286).
  void PushLatest(T item) {
    std::lock_guard<std::mutex> lk(mu_);
    if (closed_) return;
    if (q_.size() >= cap_) q_.pop_front();
    q_.push_back(std::move(item));
    not_empty_.notify_one();
  }

  std::optional<T> Pop() {
    std::unique_lock<std::mutex> lk(mu_);
    not_empty_.wait(lk, [&] { return !q_.empty() || closed_; });
    if (q_.empty()) return std::nullopt;
    T item = std::move(q_.front());
    q_.pop_front();
    not_full_.notify_one();
    return item;
  }

  // Timed pop for pollers that must also notice peer shutdown
  // (stream_server.cpp WriteLoop).
  template <typename Rep, typename Period>
  std::optional<T> PopFor(std::chrono::duration<Rep, Period> d) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!not_empty_.wait_for(lk, d,
                             [&] { return !q_.empty() || closed_; }))
      return std::nullopt;
    if (q_.empty()) return std::nullopt;
    T item = std::move(q_.front());
    q_.pop_front();
    not_full_.notify_one();
    return item;
  }

  void Close() {
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    not_empty_.notify_all();
    not_full_.notify_all();
  }

  size_t Size() const {
    std::lock_guard<std::mutex> lk(mu_);
    return q_.size();
  }

 private:
  mutable std::mutex mu_;
  std::condition_variable not_empty_, not_full_;
  std::deque<T> q_;
  size_t cap_;
  bool closed_ = false;
};

struct RawFrame {
  int64_t frame_id = 0;
  double timestamp = 0.0;
  std::vector<float> pixels;  // letterboxed 416*416*3 RGB in [0,1]
};

// Model-call boundary: the TPU (or any engine) sits behind this.
class InferBackend {
 public:
  virtual ~InferBackend() = default;
  // frame pixels -> detected instances with visual tokens
  virtual FrameInstances Detect(const RawFrame& frame) = 0;
  // 10-frame token window -> (trigger score, per-instance obj scores,
  // sampled action id)
  struct AttnResult {
    float trigger = 0.f;
    std::vector<float> obj_scores;  // last frame's instances
    int action_id = 0;
    // Full action distribution for the last frame (eval_server.proto
    // needs nullact_score/nullact_id, eval_v3.cpp:1292-1296). Online
    // backends may leave it empty.
    std::vector<float> act_scores;
  };
  virtual AttnResult Attend(
      const std::deque<FrameInstances>& window) = 0;
};

struct PipelineConfig {
  float trigger_threshold = 0.8f;   // per-variant 0.65-0.9
  float near_field_frac = 0.1f;     // min bbox height fraction
  double cooldown_s = 5.0;
  double max_lag_s = 0.5;
  size_t frame_queue_cap = 8;
};

// The four-thread pipeline. Decisions come out of `decisions()`.
class GreetingPipeline {
 public:
  GreetingPipeline(PipelineConfig cfg, std::shared_ptr<InferBackend> backend);
  ~GreetingPipeline();

  void Start();
  void Stop();

  // ingest a frame (non-blocking; drops oldest under pressure)
  void SubmitFrame(RawFrame frame);

  BoundedQueue<Decision>& decisions() { return decision_q_; }
  BoundedQueue<std::string>& logs() { return log_q_; }

  // Pure decision rule, exposed for tests: trigger threshold,
  // near-field, cooldown (infer_v3.cpp:274-286, 750-823).
  Decision Decide(const InferBackend::AttnResult& r,
                  const FrameInstances& latest, double now);

 private:
  void DetectorLoop();
  void ControllerLoop();

  PipelineConfig cfg_;
  std::shared_ptr<InferBackend> backend_;
  BoundedQueue<RawFrame> frame_q_;
  BoundedQueue<FrameInstances> inst_q_;
  BoundedQueue<Decision> decision_q_;
  BoundedQueue<std::string> log_q_;
  std::deque<FrameInstances> window_;
  std::mutex window_mu_;
  double last_trigger_time_ = -1e18;
  std::vector<std::thread> threads_;
  std::atomic<bool> running_{false};
};

// Letterbox preprocessing (infer_v3.cpp:189-228): aspect-preserving
// resize into a 416x416 gray canvas. Nearest-neighbor (the reference
// uses OpenCV bilinear; tests only rely on geometry).
std::vector<float> LetterboxResize(const float* rgb, int h, int w,
                                   int target = 416, float pad = 0.5f);

}  // namespace serving
