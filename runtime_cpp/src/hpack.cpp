#include "serving/hpack.hpp"

#include <array>
#include <cstring>
#include <memory>

#include "serving/hpack_tables.hpp"

namespace serving {

namespace {

// ---- Huffman decode: a binary trie built once from the spec code ----

struct HuffNode {
  int16_t next[2] = {-1, -1};
  int16_t symbol = -1;   // 0..255 leaf; 256 = EOS
};

const std::vector<HuffNode>& HuffTrie() {
  static const std::vector<HuffNode> trie = [] {
    std::vector<HuffNode> t(1);
    for (int sym = 0; sym < hpack_tables::kHuffmanSymbols; ++sym) {
      uint32_t code = hpack_tables::kHuffmanCodes[sym];
      int len = hpack_tables::kHuffmanLengths[sym];
      int node = 0;
      for (int b = len - 1; b >= 0; --b) {
        int bit = (code >> b) & 1;
        if (t[node].next[bit] < 0) {
          t[node].next[bit] = static_cast<int16_t>(t.size());
          t.emplace_back();
        }
        node = t[node].next[bit];
      }
      t[node].symbol = static_cast<int16_t>(sym);
    }
    return t;
  }();
  return trie;
}

// ---- HPACK integer (RFC 7541 §5.1) ----

bool DecodeInt(const uint8_t*& p, const uint8_t* end, int prefix_bits,
               uint64_t* out) {
  if (p >= end) return false;
  const uint64_t mask = (1u << prefix_bits) - 1;
  uint64_t v = *p++ & mask;
  if (v < mask) {
    *out = v;
    return true;
  }
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    v += static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return true;
    }
    shift += 7;
    if (shift > 56) return false;
  }
  return false;
}

void EncodeInt(std::vector<uint8_t>* out, uint8_t first_byte_flags,
               int prefix_bits, uint64_t v) {
  const uint64_t mask = (1u << prefix_bits) - 1;
  if (v < mask) {
    out->push_back(first_byte_flags | static_cast<uint8_t>(v));
    return;
  }
  out->push_back(first_byte_flags | static_cast<uint8_t>(mask));
  v -= mask;
  while (v >= 128) {
    out->push_back(static_cast<uint8_t>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out->push_back(static_cast<uint8_t>(v));
}

bool DecodeString(const uint8_t*& p, const uint8_t* end, std::string* out) {
  if (p >= end) return false;
  const bool huffman = (*p & 0x80) != 0;
  uint64_t len = 0;
  if (!DecodeInt(p, end, 7, &len)) return false;
  if (static_cast<uint64_t>(end - p) < len) return false;
  if (huffman) {
    if (!HuffmanDecode(p, len, out)) return false;
  } else {
    out->assign(reinterpret_cast<const char*>(p), len);
  }
  p += len;
  return true;
}

}  // namespace

bool HuffmanDecode(const uint8_t* data, size_t len, std::string* out) {
  const auto& trie = HuffTrie();
  out->clear();
  int node = 0;
  int depth = 0;   // bits since last emitted symbol (for padding check)
  for (size_t i = 0; i < len; ++i) {
    for (int b = 7; b >= 0; --b) {
      int bit = (data[i] >> b) & 1;
      int16_t nxt = trie[node].next[bit];
      if (nxt < 0) return false;
      node = nxt;
      ++depth;
      if (trie[node].symbol >= 0) {
        if (trie[node].symbol == 256) return false;   // EOS in stream
        out->push_back(static_cast<char>(trie[node].symbol));
        node = 0;
        depth = 0;
      }
    }
  }
  // Padding must be < 8 bits of the EOS prefix (all ones). A partial
  // path of 1-bits is exactly what remains when padding correctly.
  return depth < 8;
}

HpackDecoder::HpackDecoder() = default;

bool HpackDecoder::Lookup(uint64_t index, Header* h) const {
  if (index == 0) return false;
  if (index <= static_cast<uint64_t>(hpack_tables::kStaticTableSize)) {
    const auto& e = hpack_tables::kStaticTable[index - 1];
    *h = {e.name, e.value};
    return true;
  }
  const uint64_t di = index - hpack_tables::kStaticTableSize - 1;
  if (di >= dynamic_.size()) return false;
  *h = dynamic_[di];
  return true;
}

void HpackDecoder::Insert(Header h) {
  dynamic_size_ += h.first.size() + h.second.size() + 32;
  dynamic_.push_front(std::move(h));
  EvictTo(max_size_);
}

void HpackDecoder::EvictTo(size_t target) {
  while (dynamic_size_ > target && !dynamic_.empty()) {
    const auto& back = dynamic_.back();
    dynamic_size_ -= back.first.size() + back.second.size() + 32;
    dynamic_.pop_back();
  }
}

bool HpackDecoder::Decode(const uint8_t* data, size_t len,
                          std::vector<Header>* out) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  while (p < end) {
    const uint8_t b = *p;
    if (b & 0x80) {                               // indexed field
      uint64_t idx = 0;
      if (!DecodeInt(p, end, 7, &idx)) return false;
      Header h;
      if (!Lookup(idx, &h)) return false;
      out->push_back(std::move(h));
    } else if (b & 0x40) {                        // literal, incremental
      uint64_t idx = 0;
      if (!DecodeInt(p, end, 6, &idx)) return false;
      Header h;
      if (idx) {
        if (!Lookup(idx, &h)) return false;
      } else if (!DecodeString(p, end, &h.first)) {
        return false;
      }
      if (!DecodeString(p, end, &h.second)) return false;
      out->push_back(h);
      Insert(std::move(h));
    } else if (b & 0x20) {                        // table size update
      uint64_t sz = 0;
      if (!DecodeInt(p, end, 5, &sz)) return false;
      max_size_ = sz;
      EvictTo(max_size_);
    } else {                                      // literal, no/never index
      uint64_t idx = 0;
      if (!DecodeInt(p, end, 4, &idx)) return false;
      Header h;
      if (idx) {
        if (!Lookup(idx, &h)) return false;
      } else if (!DecodeString(p, end, &h.first)) {
        return false;
      }
      if (!DecodeString(p, end, &h.second)) return false;
      out->push_back(std::move(h));
    }
  }
  return true;
}

std::vector<uint8_t> HpackEncode(const std::vector<Header>& headers) {
  std::vector<uint8_t> out;
  for (const auto& [name, value] : headers) {
    out.push_back(0x00);                  // literal w/o indexing, new name
    EncodeInt(&out, 0x00, 7, name.size());      // H=0
    out.insert(out.end(), name.begin(), name.end());
    EncodeInt(&out, 0x00, 7, value.size());
    out.insert(out.end(), value.begin(), value.end());
  }
  return out;
}

}  // namespace serving
