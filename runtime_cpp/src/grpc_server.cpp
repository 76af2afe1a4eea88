#include "serving/grpc_server.hpp"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <map>
#include <optional>

#include "serving/hpack.hpp"

namespace serving {

namespace {

constexpr char kPreface[] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n";
constexpr size_t kPrefaceLen = 24;
constexpr uint8_t kData = 0x0, kHeaders = 0x1, kRstStream = 0x3,
                  kSettings = 0x4, kPing = 0x6, kGoaway = 0x7,
                  kWindowUpdate = 0x8, kContinuation = 0x9;
constexpr uint8_t kFlagEndStream = 0x1, kFlagEndHeaders = 0x4,
                  kFlagAck = 0x1, kFlagPadded = 0x8, kFlagPriority = 0x20;
constexpr int32_t kDefaultWindow = 65535;
constexpr size_t kMaxFrame = 16384;   // default SETTINGS_MAX_FRAME_SIZE

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

struct Frame {
  uint8_t type = 0;
  uint8_t flags = 0;
  uint32_t stream = 0;
  std::vector<uint8_t> payload;
};

bool ReadFrame(int fd, Frame* f) {
  uint8_t hdr[9];
  if (!ReadAll(fd, hdr, 9)) return false;
  const uint32_t len = (uint32_t(hdr[0]) << 16) | (uint32_t(hdr[1]) << 8) |
                       hdr[2];
  f->type = hdr[3];
  f->flags = hdr[4];
  f->stream = ((uint32_t(hdr[5]) << 24) | (uint32_t(hdr[6]) << 16) |
               (uint32_t(hdr[7]) << 8) | hdr[8]) & 0x7fffffffu;
  if (len > (64u << 20)) return false;
  f->payload.resize(len);
  return len == 0 || ReadAll(fd, f->payload.data(), len);
}

bool WriteFrame(int fd, uint8_t type, uint8_t flags, uint32_t stream,
                const uint8_t* payload, size_t len) {
  uint8_t hdr[9] = {static_cast<uint8_t>(len >> 16),
                    static_cast<uint8_t>(len >> 8),
                    static_cast<uint8_t>(len),
                    type,
                    flags,
                    static_cast<uint8_t>(stream >> 24),
                    static_cast<uint8_t>(stream >> 16),
                    static_cast<uint8_t>(stream >> 8),
                    static_cast<uint8_t>(stream)};
  if (!WriteAll(fd, hdr, 9)) return false;
  return len == 0 || WriteAll(fd, payload, len);
}

// ---- minimal proto3 wire codec for the four service messages ----

uint64_t DecVarint(const uint8_t*& p, const uint8_t* end, bool* ok) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    v |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
  }
  *ok = false;
  return 0;
}

void EncVarint(std::string* out, uint64_t v) {
  while (v >= 128) {
    out->push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out->push_back(static_cast<char>(v));
}

void EncString(std::string* out, int field, const std::string& s) {
  EncVarint(out, (uint64_t(field) << 3) | 2);
  EncVarint(out, s.size());
  out->append(s);
}

void EncFloat(std::string* out, int field, float f) {
  EncVarint(out, (uint64_t(field) << 3) | 5);
  char buf[4];
  std::memcpy(buf, &f, 4);
  out->append(buf, 4);
}

void EncInt32(std::string* out, int field, int32_t v) {
  EncVarint(out, uint64_t(field) << 3);
  EncVarint(out, static_cast<uint64_t>(
                     static_cast<int64_t>(v) & 0xffffffffffffffffull));
}

struct Fields {
  std::map<int, uint64_t> ints;
  std::map<int, std::string> blobs;
};

bool DecMessage(const uint8_t* data, size_t len, Fields* out) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  bool ok = true;
  while (p < end && ok) {
    uint64_t tag = DecVarint(p, end, &ok);
    if (!ok) return false;
    const int num = static_cast<int>(tag >> 3);
    switch (tag & 7) {
      case 0:
        out->ints[num] = DecVarint(p, end, &ok);
        break;
      case 1:
        if (end - p < 8) return false;
        p += 8;
        break;
      case 2: {
        uint64_t n = DecVarint(p, end, &ok);
        if (!ok || static_cast<uint64_t>(end - p) < n) return false;
        out->blobs[num].assign(reinterpret_cast<const char*>(p), n);
        p += n;
        break;
      }
      case 5:
        if (end - p < 4) return false;
        p += 4;
        break;
      default:
        return false;
    }
  }
  return ok;
}

// curFrame bytes → letterboxed float32 pixels (grpc_transport.decode_frame
// semantics: float32 (416,416,3) native format, or uint8 BGR view
// (360,640,3) letterboxed + RGB-flipped here).
constexpr int kViewH = 360, kViewW = 640, kTarget = 416;

bool DecodePixels(const std::string& blob, std::vector<float>* out) {
  const size_t f32 = size_t(kTarget) * kTarget * 3 * 4;
  const size_t u8 = size_t(kViewH) * kViewW * 3;
  if (blob.size() == f32) {
    out->resize(size_t(kTarget) * kTarget * 3);
    std::memcpy(out->data(), blob.data(), blob.size());
    return true;
  }
  if (blob.size() == u8) {
    std::vector<float> rgb(u8);
    const auto* src = reinterpret_cast<const uint8_t*>(blob.data());
    for (size_t i = 0; i < u8; i += 3) {       // BGR → RGB, [0,1]
      rgb[i] = src[i + 2] / 255.f;
      rgb[i + 1] = src[i + 1] / 255.f;
      rgb[i + 2] = src[i] / 255.f;
    }
    *out = LetterboxResize(rgb.data(), kViewH, kViewW, kTarget);
    return true;
  }
  return false;
}

struct Stream {
  std::string path;
  std::vector<uint8_t> buf;        // gRPC message assembly
  std::vector<uint8_t> header_frag;
  bool headers_done = false;
  bool half_closed = false;
  bool response_headers_sent = false;
  bool closed = false;
  int32_t send_window = kDefaultWindow;
};

struct Conn {
  int fd;
  HpackDecoder hpack;
  std::map<uint32_t, Stream> streams;
  int32_t conn_send_window = kDefaultWindow;
  int32_t initial_send_window = kDefaultWindow;
  uint32_t continuation_stream = 0;
  bool goaway = false;
};

bool SendHeadersFrame(Conn& c, uint32_t sid,
                      const std::vector<Header>& headers, bool end_stream) {
  auto block = HpackEncode(headers);
  uint8_t flags = kFlagEndHeaders | (end_stream ? kFlagEndStream : 0);
  return WriteFrame(c.fd, kHeaders, flags, sid, block.data(), block.size());
}

// Process one incoming frame, updating connection/stream state.
// Message payloads accumulate in Stream::buf; callers drain them.
bool HandleFrame(Conn& c, const Frame& f) {
  switch (f.type) {
    case kSettings: {
      if (f.flags & kFlagAck) return true;
      for (size_t i = 0; i + 6 <= f.payload.size(); i += 6) {
        const uint16_t id = (uint16_t(f.payload[i]) << 8) | f.payload[i + 1];
        uint32_t val = (uint32_t(f.payload[i + 2]) << 24) |
                       (uint32_t(f.payload[i + 3]) << 16) |
                       (uint32_t(f.payload[i + 4]) << 8) | f.payload[i + 5];
        if (id == 0x4) {   // INITIAL_WINDOW_SIZE: adjust open streams
          const int32_t delta =
              static_cast<int32_t>(val) - c.initial_send_window;
          c.initial_send_window = static_cast<int32_t>(val);
          for (auto& [sid, st] : c.streams) st.send_window += delta;
        }
      }
      return WriteFrame(c.fd, kSettings, kFlagAck, 0, nullptr, 0);
    }
    case kPing:
      if (f.flags & kFlagAck) return true;
      return WriteFrame(c.fd, kPing, kFlagAck, 0, f.payload.data(),
                        f.payload.size());
    case kWindowUpdate: {
      if (f.payload.size() != 4) return false;
      const int32_t inc = static_cast<int32_t>(
          ((uint32_t(f.payload[0]) << 24) | (uint32_t(f.payload[1]) << 16) |
           (uint32_t(f.payload[2]) << 8) | f.payload[3]) & 0x7fffffffu);
      if (f.stream == 0) {
        c.conn_send_window += inc;
      } else if (auto it = c.streams.find(f.stream);
                 it != c.streams.end()) {
        it->second.send_window += inc;
      }
      return true;
    }
    case kHeaders:
    case kContinuation: {
      if (f.stream == 0) return false;
      auto& st = c.streams[f.stream];
      const uint8_t* p = f.payload.data();
      size_t len = f.payload.size();
      if (f.type == kHeaders) {
        st.send_window = c.initial_send_window;
        size_t pad = 0;
        if (f.flags & kFlagPadded) {
          if (len < 1) return false;
          pad = *p++;
          --len;
        }
        if (f.flags & kFlagPriority) {
          if (len < 5) return false;
          p += 5;
          len -= 5;
        }
        if (pad > len) return false;
        len -= pad;
      }
      st.header_frag.insert(st.header_frag.end(), p, p + len);
      if (f.flags & kFlagEndStream) st.half_closed = true;
      if (!(f.flags & kFlagEndHeaders)) {
        c.continuation_stream = f.stream;
        return true;
      }
      c.continuation_stream = 0;
      std::vector<Header> headers;
      if (!c.hpack.Decode(st.header_frag.data(), st.header_frag.size(),
                          &headers)) {
        return false;
      }
      st.header_frag.clear();
      if (!st.headers_done) {
        for (const auto& [k, v] : headers) {
          if (k == ":path") st.path = v;
        }
        st.headers_done = true;
      }
      return true;
    }
    case kData: {
      if (f.stream == 0) return false;
      auto it = c.streams.find(f.stream);
      if (it == c.streams.end()) return true;   // reset stream — drop
      auto& st = it->second;
      const uint8_t* p = f.payload.data();
      size_t len = f.payload.size();
      if (f.flags & kFlagPadded) {
        if (len < 1) return false;
        const size_t pad = *p++;
        --len;
        if (pad > len) return false;
        len -= pad;
      }
      st.buf.insert(st.buf.end(), p, p + len);
      // replenish receive flow-control windows as we consume
      if (!f.payload.empty()) {
        uint8_t wu[4] = {
            static_cast<uint8_t>(f.payload.size() >> 24),
            static_cast<uint8_t>(f.payload.size() >> 16),
            static_cast<uint8_t>(f.payload.size() >> 8),
            static_cast<uint8_t>(f.payload.size())};
        if (!WriteFrame(c.fd, kWindowUpdate, 0, 0, wu, 4)) return false;
        if (!st.half_closed && !(f.flags & kFlagEndStream) &&
            !WriteFrame(c.fd, kWindowUpdate, 0, f.stream, wu, 4)) {
          return false;
        }
      }
      if (f.flags & kFlagEndStream) st.half_closed = true;
      return true;
    }
    case kRstStream:
      c.streams.erase(f.stream);
      return true;
    case kGoaway:
      c.goaway = true;
      return true;
    default:
      return true;   // ignore PRIORITY, PUSH_PROMISE (never from client)
  }
}

// Block until `need` bytes of send window exist for the stream, pumping
// incoming frames (control + buffered data) while waiting.
bool WaitSendWindow(Conn& c, Stream& st, size_t need) {
  while (c.conn_send_window < static_cast<int32_t>(need) ||
         st.send_window < static_cast<int32_t>(need)) {
    Frame f;
    if (!ReadFrame(c.fd, &f)) return false;
    if (!HandleFrame(c, f)) return false;
  }
  return true;
}

bool SendGrpcMessage(Conn& c, uint32_t sid, Stream& st,
                     const std::string& msg) {
  if (!st.response_headers_sent) {
    if (!SendHeadersFrame(c, sid,
                          {{":status", "200"},
                           {"content-type", "application/grpc"}},
                          false)) {
      return false;
    }
    st.response_headers_sent = true;
  }
  std::string framed;
  framed.push_back('\0');                     // uncompressed
  framed.push_back(static_cast<char>(msg.size() >> 24));
  framed.push_back(static_cast<char>(msg.size() >> 16));
  framed.push_back(static_cast<char>(msg.size() >> 8));
  framed.push_back(static_cast<char>(msg.size()));
  framed += msg;
  size_t off = 0;
  while (off < framed.size()) {
    const size_t n = std::min(kMaxFrame, framed.size() - off);
    if (!WaitSendWindow(c, st, n)) return false;
    if (!WriteFrame(c.fd, kData, 0, sid,
                    reinterpret_cast<const uint8_t*>(framed.data()) + off,
                    n)) {
      return false;
    }
    c.conn_send_window -= static_cast<int32_t>(n);
    st.send_window -= static_cast<int32_t>(n);
    off += n;
  }
  return true;
}

bool SendTrailers(Conn& c, uint32_t sid, Stream& st, int grpc_status,
                  const std::string& message = "") {
  if (!st.response_headers_sent) {
    // trailers-only response
    std::vector<Header> h = {{":status", "200"},
                             {"content-type", "application/grpc"},
                             {"grpc-status", std::to_string(grpc_status)}};
    if (!message.empty()) h.push_back({"grpc-message", message});
    st.response_headers_sent = true;
    st.closed = true;
    return SendHeadersFrame(c, sid, h, true);
  }
  std::vector<Header> h = {{"grpc-status", std::to_string(grpc_status)}};
  if (!message.empty()) h.push_back({"grpc-message", message});
  st.closed = true;
  return SendHeadersFrame(c, sid, h, true);
}

}  // namespace

GrpcServer::GrpcServer(GreetFn greeting, EvalFn eval, uint16_t port)
    : greeting_(std::move(greeting)), eval_(std::move(eval)), port_(port) {}

GrpcServer::~GrpcServer() { Stop(); }

void GrpcServer::Start() {
  listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port_);
  if (::bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) != 0 ||
      ::listen(listen_fd_, 8) != 0) {
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

void GrpcServer::Stop() {
  if (!running_.exchange(false)) return;
  if (listen_fd_ >= 0) {
    ::shutdown(listen_fd_, SHUT_RDWR);
    ::close(listen_fd_);
    listen_fd_ = -1;
  }
  if (accept_thread_.joinable()) accept_thread_.join();
  {
    std::lock_guard<std::mutex> lk(fds_mu_);
    for (int cfd : client_fds_) ::shutdown(cfd, SHUT_RDWR);
  }
  for (auto& t : conns_) {
    if (t.joinable()) t.join();
  }
  conns_.clear();
}

void GrpcServer::AcceptLoop() {
  while (running_) {
    int fd = ::accept(listen_fd_, nullptr, nullptr);
    if (fd < 0) break;
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    {
      std::lock_guard<std::mutex> lk(fds_mu_);
      client_fds_.push_back(fd);
    }
    conns_.emplace_back([this, fd] {
      ServeConnection(fd);
      ::close(fd);
    });
  }
}

void GrpcServer::ServeConnection(int fd) {
  char preface[kPrefaceLen];
  if (!ReadAll(fd, preface, kPrefaceLen) ||
      std::memcmp(preface, kPreface, kPrefaceLen) != 0) {
    return;
  }
  // server preface: our SETTINGS (defaults are fine)
  if (!WriteFrame(fd, kSettings, 0, 0, nullptr, 0)) return;

  Conn c{fd};
  while (running_ && !c.goaway) {
    Frame f;
    if (!ReadFrame(fd, &f)) break;
    if (!HandleFrame(c, f)) break;

    // drain complete gRPC messages / finished streams
    bool io_ok = true;
    for (auto it = c.streams.begin(); io_ok && it != c.streams.end();) {
      auto& [sid, st] = *it;
      while (io_ok && st.headers_done && !st.closed && st.buf.size() >= 5) {
        const uint32_t mlen = (uint32_t(st.buf[1]) << 24) |
                              (uint32_t(st.buf[2]) << 16) |
                              (uint32_t(st.buf[3]) << 8) | st.buf[4];
        if (st.buf.size() < 5 + size_t(mlen)) break;
        if (st.buf[0] != 0) {   // compressed messages unsupported
          io_ok = SendTrailers(c, sid, st, 12, "compression unsupported");
          break;
        }
        Fields msg;
        const bool parsed = DecMessage(st.buf.data() + 5, mlen, &msg);
        st.buf.erase(st.buf.begin(), st.buf.begin() + 5 + mlen);
        if (!parsed) {
          io_ok = SendTrailers(c, sid, st, 13, "bad message");
          break;
        }
        if (st.path == "/grpc.ProactiveGreeting/infer" && greeting_) {
          std::vector<float> pixels;
          if (!DecodePixels(msg.blobs[4], &pixels)) {
            io_ok = SendTrailers(c, sid, st, 3, "bad curFrame size");
            break;
          }
          const std::string json = greeting_(
              std::move(pixels), static_cast<int32_t>(msg.ints[2]),
              msg.blobs[3]);
          std::string resp;
          EncString(&resp, 1, json);
          io_ok = SendGrpcMessage(c, sid, st, resp);
        } else if (st.path == "/evalserver.EvalServer/infer" && eval_) {
          const int32_t nframe = static_cast<int32_t>(msg.ints[1]);
          const std::string& blob = msg.blobs[2];
          std::vector<RawFrame> frames;
          const size_t f32 = size_t(kTarget) * kTarget * 3 * 4;
          const size_t u8 = size_t(kViewH) * kViewW * 3;
          bool good = nframe > 0;
          for (int i = 0; good && i < nframe; ++i) {
            std::string one;
            if (blob.size() == size_t(nframe) * f32) {
              one = blob.substr(size_t(i) * f32, f32);
            } else if (blob.size() == size_t(nframe) * u8) {
              one = blob.substr(size_t(i) * u8, u8);
            } else {
              good = false;
              break;
            }
            RawFrame rf;
            rf.frame_id = i;
            good = DecodePixels(one, &rf.pixels);
            frames.push_back(std::move(rf));
          }
          if (!good) {
            io_ok = SendTrailers(c, sid, st, 3, "bad frames size");
            break;
          }
          const EvalResult r = eval_(std::move(frames));
          std::string resp;
          EncString(&resp, 1, r.json);
          EncFloat(&resp, 2, r.response_score);
          EncFloat(&resp, 3, r.trigger_pred);
          EncFloat(&resp, 4, r.nullact_score);
          EncInt32(&resp, 5, r.nullact_id);
          io_ok = SendGrpcMessage(c, sid, st, resp) &&
                  SendTrailers(c, sid, st, 0);
        } else {
          io_ok = SendTrailers(c, sid, st, 12,
                               "unimplemented: " + st.path);
        }
      }
      if (io_ok && st.half_closed && !st.closed && st.buf.size() < 5) {
        io_ok = SendTrailers(c, sid, st, 0);
      }
      if (st.closed) {
        it = c.streams.erase(it);
      } else {
        ++it;
      }
    }
    if (!io_ok) break;
  }
}

}  // namespace serving
