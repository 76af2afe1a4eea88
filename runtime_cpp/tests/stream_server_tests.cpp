// End-to-end streaming transport test: a client streams VideoRequests
// over the length-prefixed TCP protocol and receives InferResponse JSON
// (the socket replacement for ProactiveGreeting.infer's gRPC bidi
// stream, proactive_greeting.proto:8-21).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cassert>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "serving/pipeline.hpp"
#include "serving/stream_server.hpp"

using namespace serving;

static int g_failures = 0;
#define CHECK(cond)                                               \
  do {                                                            \
    if (!(cond)) {                                                \
      ++g_failures;                                               \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
    }                                                             \
  } while (0)

// Triggers once the sliding window has seen frame id >= 12.
class StubBackend : public InferBackend {
 public:
  FrameInstances Detect(const RawFrame& f) override {
    FrameInstances out;
    out.frame_id = f.frame_id;
    out.timestamp = f.timestamp;
    Instance inst;
    inst.bbox = {100.f, 20.f, 180.f, 380.f};
    inst.score = 0.9f;
    inst.valid = true;
    out.instances.push_back(inst);
    return out;
  }
  AttnResult Attend(const std::deque<FrameInstances>& w) override {
    AttnResult r;
    r.trigger = w.back().frame_id >= 12 ? 0.95f : 0.1f;
    r.obj_scores = {0.8f};
    r.action_id = 1;
    return r;
  }
};

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

static void SendVideoRequest(int fd, int32_t req_id, int32_t lag_ms,
                             const std::string& wakeup,
                             const std::vector<float>& pixels) {
  const uint32_t wlen = wakeup.size();
  const uint32_t npix = pixels.size();
  const uint32_t plen = 1 + 4 + 4 + 4 + wlen + 4 + npix * 4;
  std::vector<uint8_t> buf(4 + plen);
  size_t off = 0;
  auto put = [&](const void* src, size_t n) {
    std::memcpy(buf.data() + off, src, n);
    off += n;
  };
  put(&plen, 4);
  uint8_t t = 1;
  put(&t, 1);
  put(&req_id, 4);
  put(&lag_ms, 4);
  put(&wlen, 4);
  put(wakeup.data(), wlen);
  put(&npix, 4);
  put(pixels.data(), npix * 4);
  CHECK(SendAll(fd, buf.data(), buf.size()));
}

int main() {
  PipelineConfig cfg;
  cfg.trigger_threshold = 0.8f;
  cfg.near_field_frac = 0.1f;
  cfg.cooldown_s = 0.0;
  GreetingPipeline pipeline(cfg, std::make_shared<StubBackend>());
  pipeline.Start();

  std::vector<MultimodalAction> catalog(4);
  catalog[1].act = "wave";
  catalog[1].utterance = "hello there";
  StreamServer server(pipeline, catalog, 0);
  server.Start();
  CHECK(server.port() != 0);

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(server.port());
  CHECK(::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) ==
        0);

  std::vector<float> pixels(16, 0.5f);  // tiny stand-in frame
  for (int i = 0; i < 20; ++i) {
    SendVideoRequest(fd, i, 30, i == 0 ? "hi robot" : "", pixels);
    std::this_thread::sleep_for(std::chrono::milliseconds(10));
  }

  // The service streams one InferResponse per processed frame — early
  // ones are below-threshold; read until the triggered one arrives.
  bool saw_trigger = false;
  std::string json;
  for (int msg = 0; msg < 40 && !saw_trigger; ++msg) {
    uint32_t plen = 0;
    if (!RecvAll(fd, &plen, 4)) break;
    CHECK(plen > 5);
    std::vector<uint8_t> payload(plen);
    if (!RecvAll(fd, payload.data(), plen)) break;
    CHECK(payload[0] == 2);
    uint32_t jlen = 0;
    std::memcpy(&jlen, payload.data() + 1, 4);
    CHECK(jlen == plen - 5);
    json.assign(reinterpret_cast<char*>(payload.data() + 5), jlen);
    CHECK(json.find("trigger") != std::string::npos);
    saw_trigger = json.find("\"triggered\":true") != std::string::npos;
  }
  std::printf("last response: %s\n", json.c_str());
  CHECK(saw_trigger);
  CHECK(json.find("wave") != std::string::npos);

  ::shutdown(fd, SHUT_RDWR);
  ::close(fd);
  server.Stop();
  pipeline.Stop();

  if (g_failures == 0) std::printf("stream_server_tests: all passed\n");
  return g_failures == 0 ? 0 : 1;
}
