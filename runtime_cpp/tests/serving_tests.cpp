// Unit tests for the native serving pipeline (no external test deps —
// the reference embedded compile-time TESTCASE_ONLY blocks,
// infer_v3.cpp:825-1041; we use a tiny assert harness instead).
#include <cassert>
#include <chrono>
#include <cstdio>
#include <thread>

#include "serving/pipeline.hpp"

using namespace serving;

static int g_failures = 0;
#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      ++g_failures;                                                   \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);     \
    }                                                                 \
  } while (0)

// Stub backend: one instance per frame, trigger rises with frame count.
class StubBackend : public InferBackend {
 public:
  FrameInstances Detect(const RawFrame& f) override {
    FrameInstances out;
    out.frame_id = f.frame_id;
    out.timestamp = f.timestamp;
    Instance inst;
    inst.bbox = {100.f, 80.f, 180.f, 300.f};  // height_frac ~0.53
    inst.score = 0.9f;
    inst.valid = true;
    out.instances.push_back(inst);
    return out;
  }
  AttnResult Attend(const std::deque<FrameInstances>& w) override {
    AttnResult r;
    r.trigger = w.back().frame_id >= 12 ? 0.95f : 0.1f;
    r.obj_scores = {0.8f};
    r.action_id = 3;
    return r;
  }
};

void TestBoundedQueue() {
  BoundedQueue<int> q(2);
  q.PushLatest(1);
  q.PushLatest(2);
  q.PushLatest(3);  // drops 1
  CHECK(q.Size() == 2);
  CHECK(q.Pop().value() == 2);
  CHECK(q.Pop().value() == 3);
  q.Close();
  CHECK(!q.Pop().has_value());
}

void TestLetterbox() {
  // 2x4 image -> 416 canvas: scale 104, content 208 high, pad 104 top
  std::vector<float> img(2 * 4 * 3, 1.0f);
  auto out = LetterboxResize(img.data(), 2, 4, 416, 0.5f);
  CHECK(out.size() == 416u * 416u * 3u);
  CHECK(out[(0 * 416 + 0) * 3] == 0.5f);           // padded corner
  CHECK(out[(208 * 416 + 208) * 3] == 1.0f);       // center content
}

void TestDecisionRules() {
  PipelineConfig cfg;
  cfg.trigger_threshold = 0.8f;
  cfg.near_field_frac = 0.2f;
  cfg.cooldown_s = 100.0;
  GreetingPipeline p(cfg, std::make_shared<StubBackend>());

  FrameInstances latest;
  Instance inst;
  inst.bbox = {0.f, 0.f, 50.f, 400.f};  // tall: near field
  inst.valid = true;
  latest.instances.push_back(inst);

  InferBackend::AttnResult low{0.5f, {0.9f}, 2};
  CHECK(!p.Decide(low, latest, 1000.0).triggered);

  InferBackend::AttnResult high{0.9f, {0.9f}, 2};
  Decision d = p.Decide(high, latest, 1000.0);
  CHECK(d.triggered);
  CHECK(d.action_id == 2);

  // cooldown suppresses immediate re-trigger
  Decision d2 = p.Decide(high, latest, 1001.0);
  CHECK(!d2.triggered);
  CHECK(d2.reason == "cooldown");

  // far-field rejection
  GreetingPipeline p2(cfg, std::make_shared<StubBackend>());
  latest.instances[0].bbox = {0.f, 0.f, 10.f, 40.f};  // tiny
  Decision d3 = p2.Decide(high, latest, 2000.0);
  CHECK(!d3.triggered);
  CHECK(d3.reason == "far_field");
}

void TestPipelineEndToEnd() {
  PipelineConfig cfg;
  cfg.trigger_threshold = 0.8f;
  cfg.near_field_frac = 0.1f;
  cfg.cooldown_s = 0.0;
  cfg.max_lag_s = 1e9;  // no skipping in test
  GreetingPipeline p(cfg, std::make_shared<StubBackend>());
  p.Start();
  for (int i = 0; i < 20; ++i) {
    RawFrame f;
    f.frame_id = i;
    f.timestamp = 0.0;
    p.SubmitFrame(std::move(f));
    std::this_thread::sleep_for(std::chrono::milliseconds(5));
  }
  std::this_thread::sleep_for(std::chrono::milliseconds(200));
  // at least one triggered decision must have come through
  bool saw_trigger = false;
  while (p.decisions().Size() > 0) {
    auto d = p.decisions().Pop();
    if (d && d->triggered) {
      saw_trigger = true;
      CHECK(d->action_id == 3);
    }
  }
  p.Stop();
  CHECK(saw_trigger);
}

void TestActionParsingAndJson() {
  auto a = MultimodalAction::Parse("wave\tsmile\thello there\tturn_left");
  CHECK(a.act == "wave");
  CHECK(a.exp == "smile");
  CHECK(a.utterance == "hello there");
  CHECK(a.movement == "turn_left");

  Decision d;
  d.triggered = true;
  d.trigger_score = 0.9f;
  d.action_id = 0;
  auto json = d.ToJson({a});
  CHECK(json.find("\"triggered\":true") != std::string::npos);
  CHECK(json.find("\"action\":\"wave\"") != std::string::npos);
}

int main() {
  TestBoundedQueue();
  TestLetterbox();
  TestDecisionRules();
  TestPipelineEndToEnd();
  TestActionParsingAndJson();
  if (g_failures == 0) {
    std::printf("ALL SERVING TESTS PASSED\n");
    return 0;
  }
  std::printf("%d failures\n", g_failures);
  return 1;
}
