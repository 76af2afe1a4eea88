// C ABI bridge: lets a Python (ctypes/cffi) host plug TPU inference
// into the native pipeline. The reference links libpaddle_fluid
// directly (jetson/CMakeLists.txt); here the engine stays out-of-
// process-agnostic: callbacks in, decisions out.
#include <atomic>
#include <chrono>
#include <cstring>
#include <memory>

#include "serving/eval_server.hpp"
#include "serving/grpc_server.hpp"
#include "serving/pipeline.hpp"
#include "serving/stream_server.hpp"

using namespace serving;

extern "C" {

// callback signatures the host provides
// detect: pixels(416*416*3) -> fills boxes(K*4), scores(K), tokens(K*562),
//         valid(K); returns count
typedef int (*DetectFn)(const float* pixels, float* boxes, float* scores,
                        float* tokens, int* valid);
// attend: token window (F*K*562) + valid (F*K) -> trigger score,
//         obj scores (K), sampled action id
typedef void (*AttendFn)(const float* tokens, const int* valid,
                         float* trigger, float* obj_scores, int* action_id);
// attend for offline eval: additionally fills the full action
// distribution of the last frame (act_scores, num_act floats — the
// count is fixed at eval_server_create time).
typedef void (*AttendEvalFn)(const float* tokens, const int* valid,
                             float* trigger, float* obj_scores,
                             int* action_id, float* act_scores);
// clip score (r2plus1d variant): preprocessed clip
// (kClipLen*3*224*224 floats) -> action distribution (num_act) +
// top-k sampled action id.
typedef void (*ClipScoreFn)(const float* clip, float* act_scores,
                            int* sampled_id);

namespace {

// Pack a frame window into the flat (F*K*562) token + (F*K) valid
// buffers both attend callbacks consume.
void FlattenWindow(const std::deque<FrameInstances>& window,
                   std::vector<float>& tokens, std::vector<int>& valid) {
  tokens.assign(kNumFrames * kMaxInstances * kTokenDim, 0.f);
  valid.assign(kNumFrames * kMaxInstances, 0);
  int f = 0;
  for (const auto& fr : window) {
    for (size_t k = 0; k < fr.instances.size() && k < kMaxInstances;
         ++k) {
      size_t base = (static_cast<size_t>(f) * kMaxInstances + k);
      std::memcpy(tokens.data() + base * kTokenDim,
                  fr.instances[k].token.data(),
                  kTokenDim * sizeof(float));
      valid[base] = fr.instances[k].valid ? 1 : 0;
    }
    ++f;
  }
}

class CallbackBackend : public InferBackend {
 public:
  CallbackBackend(DetectFn d, AttendFn a) : detect_(d), attend_(a) {}

  FrameInstances Detect(const RawFrame& frame) override {
    FrameInstances out;
    out.frame_id = frame.frame_id;
    out.timestamp = frame.timestamp;
    float boxes[kMaxInstances * 4] = {0};
    float scores[kMaxInstances] = {0};
    static thread_local std::vector<float> tokens(
        kMaxInstances * kTokenDim);
    int valid[kMaxInstances] = {0};
    int n = detect_(frame.pixels.data(), boxes, scores, tokens.data(),
                    valid);
    for (int i = 0; i < n && i < kMaxInstances; ++i) {
      Instance inst;
      std::memcpy(inst.bbox.data(), boxes + 4 * i, 4 * sizeof(float));
      inst.score = scores[i];
      inst.valid = valid[i] != 0;
      std::memcpy(inst.token.data(), tokens.data() + i * kTokenDim,
                  kTokenDim * sizeof(float));
      out.instances.push_back(inst);
    }
    return out;
  }

  AttnResult Attend(const std::deque<FrameInstances>& window) override {
    static thread_local std::vector<float> tokens;
    static thread_local std::vector<int> valid;
    FlattenWindow(window, tokens, valid);
    AttnResult r;
    float obj[kMaxInstances] = {0};
    attend_(tokens.data(), valid.data(), &r.trigger, obj, &r.action_id);
    size_t n_last = window.back().instances.size();
    r.obj_scores.assign(obj, obj + n_last);
    return r;
  }

 private:
  DetectFn detect_;
  AttendFn attend_;
};

// Eval variant: same Detect, Attend also returns the action
// distribution (for EvalResponse.nullact_score/nullact_id).
class EvalCallbackBackend : public CallbackBackend {
 public:
  EvalCallbackBackend(DetectFn d, AttendEvalFn a, int num_act)
      : CallbackBackend(d, nullptr), attend_eval_(a), num_act_(num_act) {}

  AttnResult Attend(const std::deque<FrameInstances>& window) override {
    static thread_local std::vector<float> tokens;
    static thread_local std::vector<int> valid;
    FlattenWindow(window, tokens, valid);
    AttnResult r;
    float obj[kMaxInstances] = {0};
    r.act_scores.assign(num_act_, 0.f);
    attend_eval_(tokens.data(), valid.data(), &r.trigger, obj,
                 &r.action_id, r.act_scores.data());
    size_t n_last = window.back().instances.size();
    r.obj_scores.assign(obj, obj + n_last);
    return r;
  }

 private:
  AttendEvalFn attend_eval_;
  int num_act_;
};

}  // namespace

void* pipeline_create(float trigger_threshold, float near_field_frac,
                      double cooldown_s, DetectFn detect, AttendFn attend) {
  PipelineConfig cfg;
  cfg.trigger_threshold = trigger_threshold;
  cfg.near_field_frac = near_field_frac;
  cfg.cooldown_s = cooldown_s;
  auto* p = new GreetingPipeline(
      cfg, std::make_shared<CallbackBackend>(detect, attend));
  p->Start();
  return p;
}

void pipeline_submit(void* handle, const float* pixels, long frame_id,
                     double timestamp) {
  auto* p = static_cast<GreetingPipeline*>(handle);
  RawFrame f;
  f.frame_id = frame_id;
  f.timestamp = timestamp;
  f.pixels.assign(pixels, pixels + 416 * 416 * 3);
  p->SubmitFrame(std::move(f));
}

// poll one decision; returns 1 if available (fills outputs), else 0
int pipeline_poll(void* handle, int* triggered, float* trigger_score,
                  int* action_id, float* bbox) {
  auto* p = static_cast<GreetingPipeline*>(handle);
  if (p->decisions().Size() == 0) return 0;
  auto d = p->decisions().Pop();
  if (!d) return 0;
  *triggered = d->triggered ? 1 : 0;
  *trigger_score = d->trigger_score;
  *action_id = d->action_id;
  std::memcpy(bbox, d->target_bbox.data(), 4 * sizeof(float));
  return 1;
}

void pipeline_destroy(void* handle) {
  auto* p = static_cast<GreetingPipeline*>(handle);
  p->Stop();
  delete p;
}

// --- streaming transport (stream_server.hpp) --------------------------------
// Start the length-prefixed TCP service on `port` (0 = ephemeral) in
// front of an existing pipeline; returns an opaque server handle.
void* server_create(void* pipeline_handle, unsigned short port) {
  auto* p = static_cast<GreetingPipeline*>(pipeline_handle);
  auto* s = new StreamServer(*p, {}, port);
  s->Start();
  return s;
}

int server_port(void* server_handle) {
  return static_cast<StreamServer*>(server_handle)->port();
}

void server_destroy(void* server_handle) {
  auto* s = static_cast<StreamServer*>(server_handle);
  s->Stop();
  delete s;
}

// --- offline eval service (eval_server.hpp) ---------------------------------
// Standalone batch-of-frames scorer (eval_server.proto equivalent);
// owns its own backend — no pipeline involved.
void* eval_server_create(DetectFn detect, AttendEvalFn attend, int num_act,
                         float trigger_threshold, float near_field_frac,
                         unsigned short port) {
  EvalConfig cfg;
  cfg.trigger_threshold = trigger_threshold;
  cfg.near_field_frac = near_field_frac;
  auto* s = new EvalServer(
      std::make_shared<EvalCallbackBackend>(detect, attend, num_act),
      {}, cfg, port);
  s->Start();
  return s;
}

// r2plus1d variant (jetson/eval_r2plus1d.cpp EvalServiceImpl): same
// service + wire format, clip-scoring backend instead of detect+attend.
void* eval_server_create_r2p1d(ClipScoreFn score, int num_act,
                               unsigned short port) {
  class CallbackClipBackend : public ClipBackend {
   public:
    CallbackClipBackend(ClipScoreFn f, int n) : f_(f), num_act_(n) {}
    ClipResult Score(
        const std::vector<std::vector<float>>& clip) override {
      static thread_local std::vector<float> flat;
      flat.clear();
      for (const auto& fr : clip)
        flat.insert(flat.end(), fr.begin(), fr.end());
      ClipResult r;
      r.act_scores.assign(num_act_, 0.f);
      f_(flat.data(), r.act_scores.data(), &r.sampled_id);
      return r;
    }

   private:
    ClipScoreFn f_;
    int num_act_;
  };
  auto* s = new EvalServer(
      std::make_shared<CallbackClipBackend>(score, num_act), {},
      EvalConfig{}, port);
  s->Start();
  return s;
}

int eval_server_port(void* handle) {
  return static_cast<EvalServer*>(handle)->port();
}

void eval_server_destroy(void* handle) {
  auto* s = static_cast<EvalServer*>(handle);
  s->Stop();
  delete s;
}

// --- native gRPC front (grpc_server.hpp) -------------------------------------
// Real gRPC/HTTP/2 wire protocol serving BOTH reference methods
// (/grpc.ProactiveGreeting/infer bidi + /evalserver.EvalServer/infer
// unary) from one port, in front of a GreetingPipeline (lock-step
// Read/Write like infer_v3.cpp:1589-1640) and an eval scorer.
namespace {

struct GrpcHost {
  std::unique_ptr<GreetingPipeline> pipeline;
  std::unique_ptr<EvalServer> eval;   // ScoreWindow only — never Start()ed
  std::unique_ptr<GrpcServer> server;
  std::atomic<long> next_frame{0};
};

}  // namespace

void* grpc_server_create(DetectFn detect, AttendEvalFn attend,
                         int num_act, float trigger_threshold,
                         float near_field_frac, double cooldown_s,
                         unsigned short port) {
  auto* h = new GrpcHost;
  auto backend =
      std::make_shared<EvalCallbackBackend>(detect, attend, num_act);
  PipelineConfig pcfg;
  pcfg.trigger_threshold = trigger_threshold;
  pcfg.near_field_frac = near_field_frac;
  pcfg.cooldown_s = cooldown_s;
  h->pipeline = std::make_unique<GreetingPipeline>(pcfg, backend);
  h->pipeline->Start();
  EvalConfig ecfg;
  ecfg.trigger_threshold = trigger_threshold;
  ecfg.near_field_frac = near_field_frac;
  h->eval = std::make_unique<EvalServer>(
      backend, std::vector<MultimodalAction>{}, ecfg, 0);

  GrpcServer::GreetFn greet = [h](std::vector<float> pixels,
                                  int32_t lag_ms,
                                  const std::string& /*wakeup*/) {
    RawFrame f;
    const long fid = h->next_frame.fetch_add(1);
    f.frame_id = fid;
    f.timestamp =
        std::chrono::duration<double>(
            std::chrono::steady_clock::now().time_since_epoch())
            .count() -
        lag_ms / 1000.0;
    f.pixels = std::move(pixels);
    h->pipeline->SubmitFrame(std::move(f));
    // Lock-step like infer_v3.cpp:1589-1640 but NEVER block unboundedly:
    // during window fill — and whenever the pipeline conflated or
    // lag-skipped this frame — no decision may ever arrive for it, so a
    // long wait here would stall the whole HTTP/2 stream (requests are
    // served in order) past the client deadline. Wait a bounded slice;
    // if nothing is ready, answer "pending" and let the decision ride
    // a later response (frame_id in the JSON says which frame it was).
    auto d = h->pipeline->decisions().PopFor(
        std::chrono::milliseconds(2500));
    return d ? d->ToJson({})
             : std::string("{\"triggered\":false,\"reason\":\"pending\"}");
  };
  GrpcServer::EvalFn eval = [h](std::vector<RawFrame> frames) {
    return h->eval->ScoreWindow(frames);
  };
  h->server = std::make_unique<GrpcServer>(std::move(greet),
                                           std::move(eval), port);
  h->server->Start();
  return h;
}

int grpc_server_port(void* handle) {
  return static_cast<GrpcHost*>(handle)->server->port();
}

void grpc_server_destroy(void* handle) {
  auto* h = static_cast<GrpcHost*>(handle);
  h->server->Stop();
  h->pipeline->Stop();
  delete h;
}

}  // extern "C"
