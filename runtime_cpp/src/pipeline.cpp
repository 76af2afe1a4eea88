#include "serving/pipeline.hpp"

#include <algorithm>
#include <chrono>
#include <cmath>
#include <sstream>

namespace serving {

static double NowSeconds() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

MultimodalAction MultimodalAction::Parse(const std::string& line) {
  MultimodalAction a;
  std::stringstream ss(line);
  std::string field;
  int i = 0;
  while (std::getline(ss, field, '\t')) {
    switch (i++) {
      case 0: a.act = field; break;
      case 1: a.exp = field; break;
      case 2: a.utterance = field; break;
      case 3: a.movement = field; break;
    }
  }
  return a;
}

std::string Decision::ToJson(
    const std::vector<MultimodalAction>& catalog) const {
  std::ostringstream os;
  os << "{\"frame_id\":" << frame_id
     << ",\"triggered\":" << (triggered ? "true" : "false")
     << ",\"trigger_score\":" << trigger_score;
  if (!reason.empty()) os << ",\"reason\":\"" << reason << "\"";
  if (triggered) {
    os << ",\"action_id\":" << action_id << ",\"target_bbox\":["
       << target_bbox[0] << "," << target_bbox[1] << "," << target_bbox[2]
       << "," << target_bbox[3] << "]";
    if (action_id >= 0 && action_id < static_cast<int>(catalog.size())) {
      const auto& a = catalog[action_id];
      os << ",\"action\":\"" << a.act << "\",\"expression\":\"" << a.exp
         << "\",\"utterance\":\"" << a.utterance << "\"";
    }
  }
  os << "}";
  return os.str();
}

GreetingPipeline::GreetingPipeline(PipelineConfig cfg,
                                   std::shared_ptr<InferBackend> backend)
    : cfg_(cfg),
      backend_(std::move(backend)),
      frame_q_(cfg.frame_queue_cap),
      inst_q_(cfg.frame_queue_cap),
      decision_q_(64),
      log_q_(256) {}

GreetingPipeline::~GreetingPipeline() { Stop(); }

void GreetingPipeline::Start() {
  running_ = true;
  threads_.emplace_back(&GreetingPipeline::DetectorLoop, this);
  threads_.emplace_back(&GreetingPipeline::ControllerLoop, this);
}

void GreetingPipeline::Stop() {
  if (!running_.exchange(false)) return;
  frame_q_.Close();
  inst_q_.Close();
  for (auto& t : threads_)
    if (t.joinable()) t.join();
  threads_.clear();
  decision_q_.Close();
  log_q_.Close();
}

void GreetingPipeline::SubmitFrame(RawFrame frame) {
  frame_q_.PushLatest(std::move(frame));
}

void GreetingPipeline::DetectorLoop() {
  while (running_) {
    auto frame = frame_q_.Pop();
    if (!frame) break;
    // lag-sensitive skip (infer_v3.cpp:286)
    if (NowSeconds() - frame->timestamp > cfg_.max_lag_s &&
        frame->timestamp > 0) {
      log_q_.PushLatest("skip_lagged_frame " +
                        std::to_string(frame->frame_id));
      continue;
    }
    inst_q_.PushLatest(backend_->Detect(*frame));
  }
}

void GreetingPipeline::ControllerLoop() {
  while (running_) {
    auto inst = inst_q_.Pop();
    if (!inst) break;
    std::deque<FrameInstances> window_copy;
    {
      std::lock_guard<std::mutex> lk(window_mu_);
      window_.push_back(std::move(*inst));
      while (window_.size() > kNumFrames) window_.pop_front();
      if (window_.size() < kNumFrames) continue;
      window_copy = window_;
    }
    auto result = backend_->Attend(window_copy);
    Decision d = Decide(result, window_copy.back(), NowSeconds());
    log_q_.PushLatest(d.ToJson({}));
    decision_q_.PushLatest(std::move(d));
  }
}

Decision GreetingPipeline::Decide(const InferBackend::AttnResult& r,
                                  const FrameInstances& latest,
                                  double now) {
  Decision d;
  d.frame_id = latest.frame_id;
  d.trigger_score = r.trigger;
  if (r.trigger < cfg_.trigger_threshold) {
    d.reason = "below_threshold";
    return d;
  }
  if (now - last_trigger_time_ < cfg_.cooldown_s) {
    d.reason = "cooldown";
    return d;
  }
  // pick best object among valid instances
  int best = -1;
  float best_score = -1.f;
  for (size_t i = 0; i < latest.instances.size() && i < r.obj_scores.size();
       ++i) {
    if (!latest.instances[i].valid) continue;
    if (r.obj_scores[i] > best_score) {
      best_score = r.obj_scores[i];
      best = static_cast<int>(i);
    }
  }
  if (best < 0) {
    d.reason = "no_target";
    return d;
  }
  const auto& inst = latest.instances[best];
  if (inst.height_frac() < cfg_.near_field_frac) {
    d.reason = "far_field";
    return d;
  }
  d.triggered = true;
  d.action_id = r.action_id;
  d.target_instance = best;
  d.target_bbox = inst.bbox;
  last_trigger_time_ = now;
  return d;
}

std::vector<float> LetterboxResize(const float* rgb, int h, int w,
                                   int target, float pad) {
  float scale = std::min(static_cast<float>(target) / h,
                         static_cast<float>(target) / w);
  int nh = static_cast<int>(h * scale);
  int nw = static_cast<int>(w * scale);
  int top = (target - nh) / 2;
  int left = (target - nw) / 2;
  std::vector<float> out(static_cast<size_t>(target) * target * 3, pad);
  for (int y = 0; y < nh; ++y) {
    int sy = std::min(static_cast<int>(y / scale), h - 1);
    for (int x = 0; x < nw; ++x) {
      int sx = std::min(static_cast<int>(x / scale), w - 1);
      for (int c = 0; c < 3; ++c) {
        out[((top + y) * static_cast<size_t>(target) + (left + x)) * 3 + c] =
            rgb[(sy * static_cast<size_t>(w) + sx) * 3 + c];
      }
    }
  }
  return out;
}

}  // namespace serving
