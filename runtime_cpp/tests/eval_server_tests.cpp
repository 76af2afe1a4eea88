// Offline eval service tests: ScoreWindow semantics (threshold,
// near-field, null-action stats, window padding) and the length-
// prefixed EvalRequest/EvalResponse transport — the socket replacement
// for EvalServer.infer (eval_server.proto:7-21, eval_v3.cpp:1215-1310).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cassert>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "serving/eval_server.hpp"

using namespace serving;

static int g_failures = 0;
#define CHECK(cond)                                               \
  do {                                                            \
    if (!(cond)) {                                                \
      ++g_failures;                                               \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
    }                                                             \
  } while (0)

// Trigger score = mean of first pixel across real (non-padded) frames;
// action distribution peaks at id 2.
class StubEvalBackend : public InferBackend {
 public:
  int detect_calls = 0;

  FrameInstances Detect(const RawFrame& f) override {
    ++detect_calls;
    FrameInstances out;
    out.frame_id = f.frame_id;
    Instance inst;
    inst.bbox = {100.f, 20.f, 180.f, 380.f};  // height_frac ~0.87
    inst.score = 0.9f;
    inst.valid = true;
    inst.token[0] = f.pixels.empty() ? 0.f : f.pixels[0];
    out.instances.push_back(inst);
    return out;
  }

  AttnResult Attend(const std::deque<FrameInstances>& w) override {
    AttnResult r;
    float sum = 0.f;
    int n = 0;
    for (const auto& fr : w)
      if (!fr.instances.empty()) {
        sum += fr.instances[0].token[0];
        ++n;
      }
    r.trigger = n ? sum / n : 0.f;
    r.obj_scores = w.back().instances.empty()
                       ? std::vector<float>{}
                       : std::vector<float>{0.7f};
    r.action_id = 2;
    r.act_scores = {0.05f, 0.1f, 0.6f, 0.25f};
    return r;
  }
};

static RawFrame MakeFrame(float first_pixel) {
  RawFrame f;
  f.pixels.assign(16, 0.f);
  f.pixels[0] = first_pixel;
  return f;
}

static void TestScoreWindow() {
  auto backend = std::make_shared<StubEvalBackend>();
  EvalConfig cfg;
  cfg.trigger_threshold = 0.8f;
  std::vector<MultimodalAction> catalog;
  for (int i = 0; i < 4; ++i)
    catalog.push_back(
        MultimodalAction::Parse("act" + std::to_string(i) +
                                "\texp\thello there\tnull"));
  EvalServer server(backend, catalog, cfg);  // no Start(): in-process

  // High-trigger window of 10 frames → triggered, action 2.
  std::vector<RawFrame> frames(10, MakeFrame(0.95f));
  EvalResult r = server.ScoreWindow(frames);
  CHECK(backend->detect_calls == 10);
  CHECK(r.trigger_pred > 0.9f);
  CHECK(r.json.find("\"triggered\":true") != std::string::npos);
  CHECK(r.json.find("\"action\":\"act2\"") != std::string::npos);
  CHECK(r.nullact_id == 2);                       // argmax of act_scores
  CHECK(std::abs(r.nullact_score - 0.05f) < 1e-6);  // act_scores[0]
  CHECK(std::abs(r.response_score - 0.6f) < 1e-6);  // sampled action's

  // Low trigger → below_threshold, no action.
  EvalResult lo =
      server.ScoreWindow(std::vector<RawFrame>(10, MakeFrame(0.1f)));
  CHECK(lo.json.find("below_threshold") != std::string::npos);
  CHECK(lo.json.find("\"triggered\":false") != std::string::npos);

  // Short request (3 frames) → left-padded to 10; trigger averages
  // only the 3 real frames (padding frames have no instances).
  backend->detect_calls = 0;
  EvalResult pad =
      server.ScoreWindow(std::vector<RawFrame>(3, MakeFrame(0.9f)));
  CHECK(backend->detect_calls == 3);
  CHECK(std::abs(pad.trigger_pred - 0.9f) < 1e-5);

  // Long request (14 frames) → tail 10 scored only.
  backend->detect_calls = 0;
  server.ScoreWindow(std::vector<RawFrame>(14, MakeFrame(0.9f)));
  CHECK(backend->detect_calls == 10);
}

static bool SendAll(int fd, const void* buf, size_t n) {
  const auto* p = static_cast<const uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::send(fd, p, n, MSG_NOSIGNAL);
    if (r <= 0) return false;
    p += r;
    n -= size_t(r);
  }
  return true;
}

static bool RecvAll(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= size_t(r);
  }
  return true;
}

static void TestTransport() {
  auto backend = std::make_shared<StubEvalBackend>();
  EvalConfig cfg;
  cfg.trigger_threshold = 0.8f;
  EvalServer server(backend, {}, cfg, 0);
  server.Start();
  CHECK(server.port() != 0);

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(server.port());
  CHECK(::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) ==
        0);

  // Two sequential unary requests on one connection.
  for (int req = 0; req < 2; ++req) {
    const int32_t nframe = 10;
    const float px = req == 0 ? 0.95f : 0.1f;
    std::vector<uint8_t> body;
    body.push_back(3);  // EvalRequest
    auto push32 = [&](const void* v) {
      const auto* b = static_cast<const uint8_t*>(v);
      body.insert(body.end(), b, b + 4);
    };
    push32(&nframe);
    for (int i = 0; i < nframe; ++i) {
      uint32_t npix = 4;
      push32(&npix);
      float pix[4] = {px, 0.f, 0.f, 0.f};
      body.insert(body.end(), reinterpret_cast<uint8_t*>(pix),
                  reinterpret_cast<uint8_t*>(pix) + 16);
    }
    uint32_t plen = body.size();
    CHECK(SendAll(fd, &plen, 4));
    CHECK(SendAll(fd, body.data(), body.size()));

    uint32_t rlen = 0;
    CHECK(RecvAll(fd, &rlen, 4));
    std::vector<uint8_t> resp(rlen);
    CHECK(RecvAll(fd, resp.data(), rlen));
    CHECK(resp[0] == 4);  // EvalResponse
    float response_score, trigger_pred, nullact_score;
    int32_t nullact_id;
    uint32_t jlen;
    std::memcpy(&response_score, resp.data() + 1, 4);
    std::memcpy(&trigger_pred, resp.data() + 5, 4);
    std::memcpy(&nullact_score, resp.data() + 9, 4);
    std::memcpy(&nullact_id, resp.data() + 13, 4);
    std::memcpy(&jlen, resp.data() + 17, 4);
    CHECK(resp.size() == 21 + jlen);
    std::string json(reinterpret_cast<char*>(resp.data() + 21), jlen);
    if (req == 0) {
      CHECK(trigger_pred > 0.9f);
      CHECK(json.find("\"triggered\":true") != std::string::npos);
      CHECK(nullact_id == 2);
    } else {
      CHECK(trigger_pred < 0.2f);
      CHECK(json.find("below_threshold") != std::string::npos);
    }
  }

  ::close(fd);
  server.Stop();
}

static void TestStopWithIdleClient() {
  // Stop() must return promptly even while a client connection is open
  // and idle (the accept thread is blocked in recv on it).
  auto backend = std::make_shared<StubEvalBackend>();
  EvalServer server(backend, {}, EvalConfig{}, 0);
  server.Start();
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(server.port());
  CHECK(::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) ==
        0);
  // give the accept thread time to enter recv()
  usleep(50 * 1000);
  auto t0 = std::chrono::steady_clock::now();
  server.Stop();
  double dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
  CHECK(dt < 1.0);
  ::close(fd);
}

// R(2+1)D clip backend stub: act distribution peaked at `peak`,
// sampled_id = `sample`; records the clip shape it saw.
class StubClipBackend : public ClipBackend {
 public:
  StubClipBackend(int peak, int sample) : peak_(peak), sample_(sample) {}
  int calls = 0;
  size_t last_clip_len = 0;
  size_t last_frame_floats = 0;
  float last_first = 0.f;

  ClipResult Score(const std::vector<std::vector<float>>& clip) override {
    ++calls;
    last_clip_len = clip.size();
    last_frame_floats = clip.empty() ? 0 : clip[0].size();
    last_first = clip.empty() || clip[0].empty() ? 0.f : clip[0][0];
    ClipResult r;
    r.act_scores.assign(12, 0.01f);
    r.act_scores[peak_] = 0.8f;
    r.sampled_id = sample_;
    return r;
  }

 private:
  int peak_, sample_;
};

static RawFrame MakeClipFrame(float value) {
  RawFrame f;
  f.pixels.assign(416 * 416 * 3, value);
  return f;
}

static void TestScoreClip() {
  std::vector<MultimodalAction> catalog;
  for (int i = 0; i < 12; ++i) {
    // id 5 carries the salutation marker 'C' in its utterance
    std::string utt = (i == 5) ? "helloC" : "hello";
    catalog.push_back(MultimodalAction::Parse(
        "act" + std::to_string(i) + "\texp\t" + utt + "\tnull"));
  }

  // Normal action: argmax 2, sample 2 → act2 JSON, scores filled.
  auto be = std::make_shared<StubClipBackend>(2, 2);
  EvalServer server(be, catalog, EvalConfig{});
  std::vector<RawFrame> frames(10, MakeClipFrame(0.5f));
  EvalResult r = server.ScoreClip(frames);
  CHECK(be->calls == 1);
  CHECK(be->last_clip_len == size_t(kClipLen));  // tail-truncated 10→8
  CHECK(be->last_frame_floats == size_t(3 * kClipRes * kClipRes));
  CHECK(r.json.find("\"action\":\"act2\"") != std::string::npos);
  CHECK(std::abs(r.response_score - 0.8f) < 1e-6);
  CHECK(std::abs(r.nullact_score - 0.01f) < 1e-6);
  CHECK(r.nullact_id == 2);
  CHECK(r.trigger_pred == 0.f);
  // Kinetics normalization applied: 0.5 → (0.5-0.43216)/0.22803
  CHECK(std::abs(be->last_first - (0.5f - 0.43216f) / 0.22803f) < 1e-4);

  // Null action (argmax == 0) → "{}" (ConvertPredToJsons:278-285).
  auto be0 = std::make_shared<StubClipBackend>(0, 3);
  EvalServer snull(be0, catalog, EvalConfig{});
  EvalResult r0 = snull.ScoreClip(frames);
  CHECK(r0.json == "{}");
  CHECK(r0.nullact_id == 0);

  // Salutation remap: sample 5 carries 'C' → replaced by a safe act.
  auto beC = std::make_shared<StubClipBackend>(2, 5);
  EvalServer sC(beC, catalog, EvalConfig{});
  EvalResult rC = sC.ScoreClip(frames);
  CHECK(rC.json.find("\"action\":\"act5\"") == std::string::npos);
  CHECK(rC.json.find("\"triggered\":true") != std::string::npos);

  // Short request (3 frames) → repeat-first padded to kClipLen.
  auto beS = std::make_shared<StubClipBackend>(2, 2);
  EvalServer sS(beS, catalog, EvalConfig{});
  sS.ScoreClip(std::vector<RawFrame>(3, MakeClipFrame(0.2f)));
  CHECK(beS->last_clip_len == size_t(kClipLen));
}

static void TestClipTransport() {
  // The same wire format dispatches to ScoreClip for a clip server.
  auto be = std::make_shared<StubClipBackend>(3, 3);
  std::vector<MultimodalAction> catalog;
  for (int i = 0; i < 12; ++i)
    catalog.push_back(MultimodalAction::Parse(
        "act" + std::to_string(i) + "\texp\thi\tnull"));
  EvalServer server(be, catalog, EvalConfig{}, 0);
  server.Start();
  CHECK(server.port() != 0);

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(server.port());
  CHECK(::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) ==
        0);

  const int32_t nframe = 8;
  std::vector<uint8_t> body;
  body.push_back(3);
  auto push32 = [&](const void* v) {
    const auto* b = static_cast<const uint8_t*>(v);
    body.insert(body.end(), b, b + 4);
  };
  push32(&nframe);
  std::vector<float> pix(416 * 416 * 3, 0.4f);
  for (int i = 0; i < nframe; ++i) {
    uint32_t npix = pix.size();
    push32(&npix);
    body.insert(body.end(), reinterpret_cast<uint8_t*>(pix.data()),
                reinterpret_cast<uint8_t*>(pix.data() + pix.size()));
  }
  uint32_t plen = body.size();
  CHECK(SendAll(fd, &plen, 4));
  CHECK(SendAll(fd, body.data(), body.size()));

  uint32_t rlen = 0;
  CHECK(RecvAll(fd, &rlen, 4));
  std::vector<uint8_t> resp(rlen);
  CHECK(RecvAll(fd, resp.data(), rlen));
  CHECK(resp[0] == 4);
  int32_t nullact_id;
  std::memcpy(&nullact_id, resp.data() + 13, 4);
  CHECK(nullact_id == 3);
  uint32_t jlen;
  std::memcpy(&jlen, resp.data() + 17, 4);
  std::string json(reinterpret_cast<char*>(resp.data() + 21), jlen);
  CHECK(json.find("\"action\":\"act3\"") != std::string::npos);

  ::close(fd);
  server.Stop();
}

int main() {
  TestScoreWindow();
  TestTransport();
  TestStopWithIdleClient();
  TestScoreClip();
  TestClipTransport();
  if (g_failures == 0) std::printf("eval_server_tests: all passed\n");
  return g_failures == 0 ? 0 : 1;
}
