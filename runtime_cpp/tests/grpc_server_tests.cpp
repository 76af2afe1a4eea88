// HPACK (RFC 7541 Appendix C vectors) + native gRPC/HTTP/2 loopback
// tests. The Python↔C++ interop test (grpcio client → this server)
// lives in tests/test_native_pipeline.py.
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "serving/grpc_server.hpp"
#include "serving/hpack.hpp"

using namespace serving;

static int g_failures = 0;
#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      ++g_failures;                                                   \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);     \
      std::fflush(stdout);                                            \
    }                                                                 \
  } while (0)

namespace {

std::vector<uint8_t> FromHex(const std::string& hex) {
  std::vector<uint8_t> out;
  for (size_t i = 0; i + 1 < hex.size(); i += 2) {
    out.push_back(static_cast<uint8_t>(
        std::stoul(hex.substr(i, 2), nullptr, 16)));
  }
  return out;
}

void TestHuffman() {
  // RFC 7541 C.4.1 value: "www.example.com"
  auto bytes = FromHex("f1e3c2e5f23a6ba0ab90f4ff");
  std::string s;
  CHECK(HuffmanDecode(bytes.data(), bytes.size(), &s));
  CHECK(s == "www.example.com");
  // C.4.2 value: "no-cache"
  bytes = FromHex("a8eb10649cbf");
  CHECK(HuffmanDecode(bytes.data(), bytes.size(), &s));
  CHECK(s == "no-cache");
  // C.6.1 value: "Mon, 21 Oct 2013 20:13:21 GMT"
  bytes = FromHex("d07abe941054d444a8200595040b8166e082a62d1bff");
  CHECK(HuffmanDecode(bytes.data(), bytes.size(), &s));
  CHECK(s == "Mon, 21 Oct 2013 20:13:21 GMT");
  std::puts("huffman decode: RFC 7541 vectors OK");
}

void TestHpackRequests() {
  // RFC 7541 C.4: three consecutive Huffman-coded request header blocks
  // through ONE decoder (exercises the dynamic table).
  HpackDecoder dec;
  std::vector<Header> h;
  auto b1 = FromHex("828684418cf1e3c2e5f23a6ba0ab90f4ff");
  CHECK(dec.Decode(b1.data(), b1.size(), &h));
  CHECK(h.size() == 4);
  CHECK(h[0] == Header(":method", "GET"));
  CHECK(h[1] == Header(":scheme", "http"));
  CHECK(h[2] == Header(":path", "/"));
  CHECK(h[3] == Header(":authority", "www.example.com"));

  h.clear();
  auto b2 = FromHex("828684be5886a8eb10649cbf");
  CHECK(dec.Decode(b2.data(), b2.size(), &h));
  CHECK(h.size() == 5);
  CHECK(h[3] == Header(":authority", "www.example.com"));  // dyn idx 62
  CHECK(h[4] == Header("cache-control", "no-cache"));

  h.clear();
  auto b3 = FromHex(
      "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf");
  CHECK(dec.Decode(b3.data(), b3.size(), &h));
  CHECK(h.size() == 5);
  CHECK(h[1] == Header(":scheme", "https"));
  CHECK(h[2] == Header(":path", "/index.html"));
  CHECK(h[4] == Header("custom-key", "custom-value"));
  std::puts("hpack decode: RFC 7541 C.4 request chain OK");

  // encoder → decoder round trip
  std::vector<Header> in = {{":status", "200"},
                            {"content-type", "application/grpc"},
                            {"grpc-status", "0"}};
  auto enc = HpackEncode(in);
  HpackDecoder dec2;
  h.clear();
  CHECK(dec2.Decode(enc.data(), enc.size(), &h));
  CHECK(h == in);
  std::puts("hpack encode/decode round trip OK");
}

// ---- minimal raw HTTP/2 client for the loopback test ----

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

bool WriteFrame9(int fd, uint8_t type, uint8_t flags, uint32_t stream,
                 const std::vector<uint8_t>& payload) {
  uint8_t hdr[9] = {static_cast<uint8_t>(payload.size() >> 16),
                    static_cast<uint8_t>(payload.size() >> 8),
                    static_cast<uint8_t>(payload.size()),
                    type,
                    flags,
                    static_cast<uint8_t>(stream >> 24),
                    static_cast<uint8_t>(stream >> 16),
                    static_cast<uint8_t>(stream >> 8),
                    static_cast<uint8_t>(stream)};
  return WriteAll(fd, hdr, 9) &&
         (payload.empty() ||
          WriteAll(fd, payload.data(), payload.size()));
}

struct RFrame {
  uint8_t type, flags;
  uint32_t stream;
  std::vector<uint8_t> payload;
};

bool ReadFrame9(int fd, RFrame* f) {
  uint8_t hdr[9];
  if (!ReadAll(fd, hdr, 9)) return false;
  uint32_t len = (uint32_t(hdr[0]) << 16) | (uint32_t(hdr[1]) << 8) | hdr[2];
  f->type = hdr[3];
  f->flags = hdr[4];
  f->stream = ((uint32_t(hdr[5]) << 24) | (uint32_t(hdr[6]) << 16) |
               (uint32_t(hdr[7]) << 8) | hdr[8]) & 0x7fffffffu;
  f->payload.resize(len);
  return len == 0 || ReadAll(fd, f->payload.data(), len);
}

void EncVarint(std::string* out, uint64_t v) {
  while (v >= 128) {
    out->push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out->push_back(static_cast<char>(v));
}

void TestGrpcLoopback() {
  GrpcServer server(
      [](std::vector<float> pixels, int32_t lag, const std::string& wk) {
        char buf[128];
        std::snprintf(buf, sizeof(buf),
                      "{\"npix\": %zu, \"lag\": %d, \"wakeup\": \"%s\"}",
                      pixels.size(), lag, wk.c_str());
        return std::string(buf);
      },
      [](std::vector<RawFrame> frames) {
        EvalResult r;
        r.json = "{}";
        r.trigger_pred = 0.25f * static_cast<float>(frames.size());
        r.nullact_id = 3;
        return r;
      });
  server.Start();
  CHECK(server.port() > 0);

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(server.port());
  CHECK(::connect(fd, reinterpret_cast<sockaddr*>(&addr),
                   sizeof(addr)) == 0);
  CHECK(WriteAll(fd, "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n", 24));
  CHECK(WriteFrame9(fd, 0x4, 0, 0, {}));              // SETTINGS

  // open the greeting stream
  auto hdrs = HpackEncode({{":method", "POST"},
                           {":scheme", "http"},
                           {":path", "/grpc.ProactiveGreeting/infer"},
                           {":authority", "localhost"},
                           {"content-type", "application/grpc"},
                           {"te", "trailers"}});
  CHECK(WriteFrame9(fd, 0x1, 0x4, 1, hdrs));          // END_HEADERS

  // VideoRequest{req_id: 5, lag: 40, wakeup: "1",
  //              cur_frame: 416*416*3 float32}
  std::string msg;
  msg += "\x08\x05";                                   // 1: req_id
  msg += "\x10";                                       // 2: lag
  EncVarint(&msg, 40);
  msg += "\x1a\x01\x31";                               // 3: wakeup "1"
  const size_t npix = 416 * 416 * 3;
  std::string frame_bytes(npix * 4, '\0');
  EncVarint(&msg, (4 << 3) | 2);                       // 4: cur_frame
  EncVarint(&msg, frame_bytes.size());
  msg += frame_bytes;

  std::string grpc_frame;
  grpc_frame.push_back('\0');
  grpc_frame.push_back(static_cast<char>(msg.size() >> 24));
  grpc_frame.push_back(static_cast<char>(msg.size() >> 16));
  grpc_frame.push_back(static_cast<char>(msg.size() >> 8));
  grpc_frame.push_back(static_cast<char>(msg.size()));
  grpc_frame += msg;
  for (size_t off = 0; off < grpc_frame.size(); off += 16384) {
    size_t n = std::min<size_t>(16384, grpc_frame.size() - off);
    const bool last = off + n >= grpc_frame.size();
    std::vector<uint8_t> chunk(grpc_frame.begin() + off,
                               grpc_frame.begin() + off + n);
    CHECK(WriteFrame9(fd, 0x0, last ? 0x1 : 0x0, 1, chunk));  // END_STREAM
  }

  // read until response DATA + trailers arrive
  HpackDecoder rdec;
  std::string data;
  bool got_status200 = false, got_trailer0 = false;
  while (!got_trailer0) {
    RFrame f;
    CHECK(ReadFrame9(fd, &f));
    if (f.type == 0x4 && !(f.flags & 0x1)) {
      CHECK(WriteFrame9(fd, 0x4, 0x1, 0, {}));        // SETTINGS ack
    } else if (f.type == 0x1) {
      std::vector<Header> h;
      CHECK(rdec.Decode(f.payload.data(), f.payload.size(), &h));
      for (auto& [k, v] : h) {
        if (k == ":status" && v == "200") got_status200 = true;
        if (k == "grpc-status") {
          CHECK(v == "0");
          got_trailer0 = true;
        }
      }
    } else if (f.type == 0x0) {
      data.append(reinterpret_cast<char*>(f.payload.data()),
                  f.payload.size());
    }
  }
  CHECK(got_status200);
  CHECK(data.size() > 5 && data[0] == 0);
  // InferResponse{1: json}
  const std::string json = data.substr(7);   // 5B prefix + tag + len
  CHECK(json.find("\"npix\": 519168") != std::string::npos);
  CHECK(json.find("\"lag\": 40") != std::string::npos);
  CHECK(json.find("\"wakeup\": \"1\"") != std::string::npos);
  ::close(fd);
  server.Stop();
  std::puts("grpc loopback: greeting bidi request/response OK");
}

}  // namespace

int main() {
  TestHuffman();
  TestHpackRequests();
  TestGrpcLoopback();
  if (g_failures) {
    std::printf("grpc_server_tests: %d FAILURES\n", g_failures);
    return 1;
  }
  std::puts("grpc_server_tests: ALL OK");
  return 0;
}
