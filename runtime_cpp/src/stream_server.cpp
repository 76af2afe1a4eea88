#include "serving/stream_server.hpp"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstring>

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

StreamServer::StreamServer(GreetingPipeline& pipeline,
                           std::vector<MultimodalAction> catalog,
                           uint16_t port)
    : pipeline_(pipeline), catalog_(std::move(catalog)), port_(port) {}

StreamServer::~StreamServer() { Stop(); }

void StreamServer::Start() {
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

void StreamServer::Stop() {
  if (!running_.exchange(false)) return;
  if (listen_fd_ >= 0) {
    ::shutdown(listen_fd_, SHUT_RDWR);
    ::close(listen_fd_);
    listen_fd_ = -1;
  }
  if (accept_thread_.joinable()) accept_thread_.join();
}

void StreamServer::AcceptLoop() {
  while (running_) {
    int fd = ::accept(listen_fd_, nullptr, nullptr);
    if (fd < 0) break;
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // one reader + one writer per stream, matching the request/response
    // halves of the gRPC bidi stream (infer_v3.cpp:1583-1679)
    std::thread writer([this, fd] { WriteLoop(fd); });
    ReadLoop(fd);
    ::shutdown(fd, SHUT_RDWR);
    writer.join();
    ::close(fd);
  }
}

void StreamServer::ReadLoop(int fd) {
  while (running_) {
    uint32_t len = 0;
    if (!ReadAll(fd, &len, 4)) return;
    if (len < 1 || len > (64u << 20)) return;   // sanity cap
    std::vector<uint8_t> payload(len);
    if (!ReadAll(fd, payload.data(), len)) return;
    if (payload[0] != 1) continue;              // only VideoRequest inbound
    size_t off = 1;
    auto rd32 = [&](void* dst) {
      std::memcpy(dst, payload.data() + off, 4);
      off += 4;
    };
    int32_t req_id = 0, lag_ms = 0;
    uint32_t wlen = 0, npix = 0;
    if (payload.size() < off + 12) return;
    rd32(&req_id);
    rd32(&lag_ms);
    rd32(&wlen);
    if (payload.size() < off + wlen + 4) return;
    std::string wakeup(reinterpret_cast<char*>(payload.data() + off), wlen);
    off += wlen;
    rd32(&npix);
    if (payload.size() < off + size_t(npix) * 4) return;
    RawFrame frame;
    frame.frame_id = req_id;
    frame.timestamp =
        std::chrono::duration<double>(
            std::chrono::steady_clock::now().time_since_epoch())
            .count() -
        lag_ms / 1000.0;
    frame.pixels.resize(npix);
    std::memcpy(frame.pixels.data(), payload.data() + off,
                size_t(npix) * 4);
    pipeline_.SubmitFrame(std::move(frame));
  }
}

void StreamServer::WriteLoop(int fd) {
  while (running_) {
    auto d = pipeline_.decisions().PopFor(std::chrono::milliseconds(100));
    if (!d.has_value()) {
      // liveness probe: detect a gone peer so the loop exits
      if (::send(fd, nullptr, 0, MSG_NOSIGNAL) < 0) return;
      continue;
    }
    const std::string json = d->ToJson(catalog_);
    const uint32_t jlen = static_cast<uint32_t>(json.size());
    const uint32_t plen = 1 + 4 + jlen;
    std::vector<uint8_t> out(4 + plen);
    std::memcpy(out.data(), &plen, 4);
    out[4] = 2;  // InferResponse
    std::memcpy(out.data() + 5, &jlen, 4);
    std::memcpy(out.data() + 9, json.data(), jlen);
    if (!WriteAll(fd, out.data(), out.size())) return;
  }
}

}  // namespace serving
