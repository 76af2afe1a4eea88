// HPACK (RFC 7541) header compression for the native gRPC front.
//
// Decoder: full spec coverage — indexed fields (static + dynamic
// tables), literals with/without/never indexing, dynamic-table size
// updates, Huffman-coded string literals (Appendix B code), so any
// conforming client (grpc C-core, grpcio, Java) can be parsed.
// Encoder: literals without indexing, raw (non-Huffman) strings —
// always valid, at a few bytes of response-header overhead.
#pragma once

#include <cstdint>
#include <deque>
#include <string>
#include <utility>
#include <vector>

namespace serving {

using Header = std::pair<std::string, std::string>;

class HpackDecoder {
 public:
  HpackDecoder();

  // Decode one complete header block. Returns false on malformed
  // input (connection error per RFC 7540 §4.3).
  bool Decode(const uint8_t* data, size_t len, std::vector<Header>* out);

 private:
  bool Lookup(uint64_t index, Header* h) const;
  void Insert(Header h);
  void EvictTo(size_t target);

  std::deque<Header> dynamic_;   // newest at front (index 62)
  size_t dynamic_size_ = 0;      // per RFC: sum(len(n)+len(v)+32)
  size_t max_size_ = 4096;
};

// Encode a header block: every field as "literal without indexing —
// new name", raw strings (no dynamic-table state to keep in sync).
std::vector<uint8_t> HpackEncode(const std::vector<Header>& headers);

// Huffman-decode an HPACK string literal payload. Returns false on a
// malformed code (EOS symbol or bad padding).
bool HuffmanDecode(const uint8_t* data, size_t len, std::string* out);

}  // namespace serving
