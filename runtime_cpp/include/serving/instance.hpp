// Instance & multimodal-action types for the serving pipeline.
// Rebuild of HRI/TFVT_HRI/jetson/instance.hpp (bbox/feats/tracking
// fields) and multimodal_act.hpp (catalog row parsing).
#pragma once

#include <array>
#include <cstdint>
#include <string>
#include <vector>

namespace serving {

constexpr int kTokenDim = 562;   // 512 GAP + 50 pos-emb
constexpr int kMaxInstances = 20;
constexpr int kNumFrames = 10;

struct Instance {
  std::array<float, 4> bbox{};   // xyxy in input (416) coords
  float score = 0.f;
  int class_id = 0;
  int track_id = 0;
  std::array<float, kTokenDim> token{};
  bool valid = false;

  float height_frac(float input_size = 416.f) const {
    return (bbox[3] - bbox[1]) / input_size;
  }
};

struct FrameInstances {
  int64_t frame_id = 0;
  double timestamp = 0.0;
  std::vector<Instance> instances;  // size <= kMaxInstances
};

// One row of the multimodal action catalog (multimodal_act.hpp:88):
// tab-separated "act \t exp \t utterance \t movement".
struct MultimodalAction {
  std::string act = "null";
  std::string exp = "null";
  std::string utterance;
  std::string movement = "null";

  static MultimodalAction Parse(const std::string& line);
};

struct Decision {
  int64_t frame_id = -1;  // latest frame the decision window ended on
  bool triggered = false;
  float trigger_score = 0.f;
  int action_id = 0;
  int target_instance = -1;
  std::array<float, 4> target_bbox{};
  std::string reason;
  std::string ToJson(const std::vector<MultimodalAction>& catalog) const;
};

}  // namespace serving
