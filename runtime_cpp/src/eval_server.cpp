#include "serving/eval_server.hpp"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cstring>
#include <deque>

namespace serving {

namespace {

bool ReadAll(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool WriteAll(int fd, const void* buf, size_t n) {
  const auto* p = static_cast<const uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::send(fd, p, n, MSG_NOSIGNAL);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

}  // namespace

EvalServer::EvalServer(std::shared_ptr<InferBackend> backend,
                       std::vector<MultimodalAction> catalog,
                       EvalConfig cfg, uint16_t port)
    : backend_(std::move(backend)),
      catalog_(std::move(catalog)),
      cfg_(cfg),
      port_(port) {}

EvalServer::EvalServer(std::shared_ptr<ClipBackend> clip_backend,
                       std::vector<MultimodalAction> catalog,
                       EvalConfig cfg, uint16_t port)
    : clip_backend_(std::move(clip_backend)),
      catalog_(std::move(catalog)),
      cfg_(cfg),
      port_(port) {}

std::vector<float> PreprocessClipFrame(const std::vector<float>& pixels) {
  // Kinetics/ig65m channel stats (eval_r2plus1d.cpp:149-151).
  static const float kMean[3] = {0.43216f, 0.394666f, 0.37645f};
  static const float kStd[3] = {0.22803f, 0.22145f, 0.216989f};
  const int src = 416;
  std::vector<float> out(3 * kClipRes * kClipRes, 0.f);
  for (int y = 0; y < kClipRes; ++y) {
    int sy = y * src / kClipRes;
    for (int x = 0; x < kClipRes; ++x) {
      int sx = x * src / kClipRes;
      const float* px = pixels.data() + (sy * src + sx) * 3;
      for (int c = 0; c < 3; ++c) {
        out[(c * kClipRes + y) * kClipRes + x] =
            (px[c] - kMean[c]) / kStd[c];
      }
    }
  }
  return out;
}

EvalResult EvalServer::ScoreClip(const std::vector<RawFrame>& frames) {
  std::vector<std::vector<float>> clip;
  size_t start =
      frames.size() > size_t(kClipLen) ? frames.size() - kClipLen : 0;
  for (size_t i = start; i < frames.size(); ++i)
    clip.push_back(PreprocessClipFrame(frames[i].pixels));
  while (clip.size() < size_t(kClipLen) && !clip.empty())
    clip.insert(clip.begin(), clip.front());

  EvalResult r;
  if (clip.empty()) {
    r.json = "{}";
    return r;
  }
  ClipBackend::ClipResult cr = clip_backend_->Score(clip);
  if (cr.act_scores.empty()) {
    r.json = "{}";
    return r;
  }
  r.nullact_score = cr.act_scores[0];
  r.nullact_id = static_cast<int>(
      std::max_element(cr.act_scores.begin(), cr.act_scores.end()) -
      cr.act_scores.begin());
  r.trigger_pred = 0.f;  // the r2plus1d head has no trigger
                         // (eval_r2plus1d.cpp:405 set_trigger_pred(0))
  // Null-action rule (ConvertPredToJsons:278-285): top-1 == action 0
  // means "do nothing".
  if (r.nullact_id == 0) {
    r.json = "{}";
    return r;
  }
  int sid = cr.sampled_id;
  // Salutation remap (ConvertPredToJsons:291-298): utterances carrying
  // the salutation marker 'C' are replaced by a safe act. The reference
  // draws uniformly from SAFE_ACTS with a time-seeded RNG; here the
  // draw is a deterministic function of the sample so eval is
  // reproducible.
  static const int kSafeActs[] = {1, 3, 4, 5, 6, 7, 8, 10};
  if (sid >= 0 && sid < static_cast<int>(catalog_.size()) &&
      catalog_[sid].utterance.find('C') != std::string::npos) {
    sid = kSafeActs[static_cast<size_t>(sid) %
                    (sizeof(kSafeActs) / sizeof(kSafeActs[0]))];
  }
  Decision d;
  d.triggered = true;
  d.trigger_score = 0.f;
  d.action_id = sid;
  r.json = d.ToJson(catalog_);
  if (sid >= 0 && sid < static_cast<int>(cr.act_scores.size()))
    r.response_score = cr.act_scores[sid];
  return r;
}

EvalServer::~EvalServer() { Stop(); }

void EvalServer::Start() {
  listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port_);
  if (::bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) != 0 ||
      ::listen(listen_fd_, 4) != 0) {
    ::close(listen_fd_);
    listen_fd_ = -1;
    return;
  }
  socklen_t len = sizeof(addr);
  ::getsockname(listen_fd_, reinterpret_cast<sockaddr*>(&addr), &len);
  port_ = ntohs(addr.sin_port);
  running_ = true;
  accept_thread_ = std::thread([this] { AcceptLoop(); });
}

void EvalServer::Stop() {
  if (!running_.exchange(false)) return;
  if (listen_fd_ >= 0) {
    ::shutdown(listen_fd_, SHUT_RDWR);
    ::close(listen_fd_);
    listen_fd_ = -1;
  }
  // unblock a recv() on the active client connection, or Stop() (and
  // the destructor / eval_server_destroy) would hang until the client
  // goes away on its own
  int cfd = client_fd_.exchange(-1);
  if (cfd >= 0) ::shutdown(cfd, SHUT_RDWR);
  if (accept_thread_.joinable()) accept_thread_.join();
}

void EvalServer::AcceptLoop() {
  while (running_) {
    int fd = ::accept(listen_fd_, nullptr, nullptr);
    if (fd < 0) break;
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // Offline eval is synchronous unary RPC — serve requests in order
    // on this connection (eval clients fan out across processes, not
    // in-connection pipelining: parallel_eval.py one stub per worker).
    client_fd_.store(fd);
    // Stop() may have swept client_fd_ between accept() and the store
    // above; re-check so its shutdown isn't missed (otherwise Stop()
    // blocks in join() until the remote client disconnects).
    if (!running_) {
      client_fd_.store(-1);
      ::shutdown(fd, SHUT_RDWR);
      ::close(fd);
      break;
    }
    ServeConnection(fd);
    client_fd_.store(-1);
    ::shutdown(fd, SHUT_RDWR);
    ::close(fd);
  }
}

void EvalServer::ServeConnection(int fd) {
  while (running_) {
    uint32_t len = 0;
    if (!ReadAll(fd, &len, 4)) return;
    if (len < 5 || len > (256u << 20)) return;  // sanity cap
    std::vector<uint8_t> payload(len);
    if (!ReadAll(fd, payload.data(), len)) return;
    // Only EvalRequest is valid inbound; closing on anything else
    // fails a confused unary client fast instead of leaving it
    // blocked on a reply that will never come.
    if (payload[0] != 3) return;
    size_t off = 1;
    int32_t nframe = 0;
    if (payload.size() < off + 4) return;
    std::memcpy(&nframe, payload.data() + off, 4);
    off += 4;
    if (nframe < 0 || nframe > 256) return;
    std::vector<RawFrame> frames;
    frames.reserve(nframe);
    for (int32_t i = 0; i < nframe; ++i) {
      uint32_t npix = 0;
      if (payload.size() < off + 4) return;
      std::memcpy(&npix, payload.data() + off, 4);
      off += 4;
      if (payload.size() < off + size_t(npix) * 4) return;
      RawFrame f;
      f.frame_id = i;
      f.pixels.resize(npix);
      std::memcpy(f.pixels.data(), payload.data() + off,
                  size_t(npix) * 4);
      off += size_t(npix) * 4;
      frames.push_back(std::move(f));
    }

    EvalResult r = clip_backend_ ? ScoreClip(frames) : ScoreWindow(frames);

    const uint32_t jlen = static_cast<uint32_t>(r.json.size());
    const uint32_t plen = 1 + 4 * 4 + 4 + jlen;
    std::vector<uint8_t> out(4 + plen);
    uint8_t* w = out.data();
    std::memcpy(w, &plen, 4);
    w += 4;
    *w++ = 4;  // EvalResponse
    std::memcpy(w, &r.response_score, 4);
    w += 4;
    std::memcpy(w, &r.trigger_pred, 4);
    w += 4;
    std::memcpy(w, &r.nullact_score, 4);
    w += 4;
    std::memcpy(w, &r.nullact_id, 4);
    w += 4;
    std::memcpy(w, &jlen, 4);
    w += 4;
    std::memcpy(w, r.json.data(), jlen);
    if (!WriteAll(fd, out.data(), out.size())) return;
  }
}

EvalResult EvalServer::ScoreWindow(const std::vector<RawFrame>& frames) {
  // Detect each frame, then assemble exactly kNumFrames of window:
  // left-pad with empty (all-invalid) frames when short, keep the tail
  // when long — the reference requires exactly OB_WINDOW_LEN frames
  // (eval_v3.cpp:1258-1270); we degrade gracefully instead.
  std::deque<FrameInstances> window;
  size_t start = frames.size() > kNumFrames ? frames.size() - kNumFrames : 0;
  for (size_t i = start; i < frames.size(); ++i)
    window.push_back(backend_->Detect(frames[i]));
  while (window.size() < kNumFrames) {
    FrameInstances pad;
    pad.frame_id = -1;
    window.push_front(std::move(pad));
  }

  InferBackend::AttnResult a = backend_->Attend(window);

  EvalResult r;
  r.trigger_pred = a.trigger;
  if (!a.act_scores.empty()) {
    r.nullact_score = a.act_scores[0];
    r.nullact_id = static_cast<int>(
        std::max_element(a.act_scores.begin(), a.act_scores.end()) -
        a.act_scores.begin());
  }

  // Offline decision rule: trigger threshold + best valid target +
  // near-field; no cooldown/lag/wakeup (eval passes lag=0 wakeup=false,
  // eval_v3.cpp:1297-1299).
  const FrameInstances& latest = window.back();
  Decision d;
  d.trigger_score = a.trigger;
  if (a.trigger < cfg_.trigger_threshold) {
    d.reason = "below_threshold";
  } else {
    int best = -1;
    float best_score = -1.f;
    for (size_t i = 0;
         i < latest.instances.size() && i < a.obj_scores.size(); ++i) {
      if (!latest.instances[i].valid) continue;
      if (a.obj_scores[i] > best_score) {
        best_score = a.obj_scores[i];
        best = static_cast<int>(i);
      }
    }
    if (best < 0) {
      d.reason = "no_target";
    } else if (latest.instances[best].height_frac() <
               cfg_.near_field_frac) {
      d.reason = "far_field";
    } else {
      d.triggered = true;
      d.action_id = a.action_id;
      d.target_instance = best;
      d.target_bbox = latest.instances[best].bbox;
    }
  }
  r.json = d.ToJson(catalog_);
  // response_score: score of the sampled response action
  // (eval_v3.cpp resActScore from ConvertPredToJsons).
  if (d.triggered && a.action_id >= 0 &&
      a.action_id < static_cast<int>(a.act_scores.size()))
    r.response_score = a.act_scores[a.action_id];
  return r;
}

}  // namespace serving
