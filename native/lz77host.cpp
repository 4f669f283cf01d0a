// lz77host — native host runtime for the lz77_tpu framework.
//
// Fresh C++ implementation of the host-side codec duties (SURVEY.md §2:
// native equivalents of components 2-4, 6-7), designed differently from the
// C reference on purpose:
//
//  * Bit I/O: a 64-bit accumulator emitting whole bytes (the reference moves
//    one bit per iteration through a FILE* buffer, bitio.c:213-236).  Same
//    stream format: values LSB-first within bytes, bytes in order.
//  * Match finder: exact-2-gram hash chains + a 256-entry last-occurrence
//    table, walking candidates nearest-first with an early exit at the
//    length cap (the reference walks an unbalanced BST, tree.c:118-152).
//    Finds the *true* longest match with smallest-offset tie-break — the
//    same semantics as the device matchers, so all backends emit identical
//    streams.
//  * Decoder: token replay with a memmove-free overlap-safe copy loop.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int bitof(int n) {
  // ceil(log2(n)); 0 for n == 1.  Integer-exact (bitio.c:41-43 uses floats).
  int b = 0;
  for (unsigned v = static_cast<unsigned>(n) - 1; v; v >>= 1) ++b;
  return b;
}

struct BitWriter {
  std::vector<uint8_t>& out;
  uint64_t acc = 0;
  int nbits = 0;
  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
  inline void put(uint32_t value, int width) {
    acc |= (static_cast<uint64_t>(value) & ((width < 32)
               ? ((1u << width) - 1u) : 0xFFFFFFFFu)) << nbits;
    nbits += width;
    while (nbits >= 8) {
      out.push_back(static_cast<uint8_t>(acc & 0xFF));
      acc >>= 8;
      nbits -= 8;
    }
  }
  inline void close() {
    if (nbits > 0) {
      out.push_back(static_cast<uint8_t>(acc & 0xFF));  // zero-padded
      acc = 0;
      nbits = 0;
    }
  }
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int nbits = 0;
  BitReader(const uint8_t* data, int64_t n) : p(data), end(data + n) {}
  // Returns false when fewer than `width` bits remain (EOF rule: a trailing
  // sub-token span is padding, never a token — lz77.c:266-280).
  inline bool get(int width, uint32_t* value) {
    while (nbits < width) {
      if (p == end) return false;
      acc |= static_cast<uint64_t>(*p++) << nbits;
      nbits += 8;
    }
    *value = static_cast<uint32_t>(
        acc & ((width < 32) ? ((1ull << width) - 1ull) : 0xFFFFFFFFull));
    acc >>= width;
    nbits -= width;
    return true;
  }
};

}  // namespace

extern "C" {

// Worst-case output: header + one all-literal token per byte, rounded up.
int64_t lz77_encode_bound(int64_t n, int la, int sb) {
  if (la < 2 || sb < 1) return -1;
  int64_t width = bitof(sb) + bitof(la) + 8;
  return 4 + (n * width + 7) / 8 + 8;
}

// Encode `n` bytes into `out` (capacity `cap`).  Returns stream size or <0.
int64_t lz77_encode(const uint8_t* in, int64_t n, int la, int sb,
                    uint8_t* out, int64_t cap) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -1;
  const int off_bits = bitof(sb);
  const int len_bits = bitof(la);
  const int max_len = la - 1;                      // tree.c:136 stops early
  const int dlim = off_bits >= 31 ? sb
      : (sb < (1 << off_bits) - 1 ? sb : (1 << off_bits) - 1);

  std::vector<uint8_t> stream;
  stream.reserve(static_cast<size_t>(n / 2 + 64));
  BitWriter bw(stream);
  bw.put(static_cast<uint32_t>(sb), 16);           // header, lz77.c:74-75
  bw.put(static_cast<uint32_t>(la), 16);

  // Exact-2-gram chains: head[g] = most recent position whose 2-gram is g;
  // prev[p & mask] links to the previous such position.  prev is a ring of
  // >= 2*dlim slots: positions within the window are never clobbered, and
  // stale slots (older than the window) are cut off by the distance check
  // plus the strictly-decreasing guard in the walk.
  std::vector<int64_t> head(1 << 16, -1);
  size_t ring = 64;
  while (ring < static_cast<size_t>(2 * (dlim + 1))) ring <<= 1;
  const size_t rmask = ring - 1;
  std::vector<int64_t> prev(ring, -1);
  int64_t last_byte[256];
  for (int i = 0; i < 256; ++i) last_byte[i] = -1;

  int64_t p = 0;
  while (p < n) {
    const int cap_len =
        static_cast<int>(n - p - 1 < max_len ? n - p - 1 : max_len);
    int best_len = 0;
    int64_t best_off = 0;

    if (cap_len >= 1 && dlim >= 1) {
      // Length-1 fallback: nearest previous occurrence of this byte.
      int64_t q1 = last_byte[in[p]];
      if (q1 >= 0 && p - q1 <= dlim) {
        best_len = 1;
        best_off = p - q1;
      }
      if (cap_len >= 2 && p + 1 < n) {
        const uint32_t g = in[p] | (static_cast<uint32_t>(in[p + 1]) << 8);
        for (int64_t q = head[g]; q >= 0 && p - q <= dlim;) {
          int l = 2;
          const uint8_t* a = in + p;
          const uint8_t* b = in + q;
          while (l < cap_len && a[l] == b[l]) ++l;
          if (l > best_len) {
            best_len = l;
            best_off = p - q;
            if (l >= cap_len) break;               // cannot improve
          }
          const int64_t qp = prev[static_cast<size_t>(q) & rmask];
          if (qp >= q) break;                      // stale ring slot
          q = qp;
        }
      }
    }

    const uint8_t next = in[p + best_len];
    bw.put(static_cast<uint32_t>(best_off), off_bits);
    bw.put(static_cast<uint32_t>(best_len), len_bits);
    bw.put(next, 8);

    const int64_t consume = best_len + 1;
    for (int64_t i = 0; i < consume && p + i < n; ++i) {
      const int64_t q = p + i;
      last_byte[in[q]] = q;
      if (q + 1 < n) {
        const uint32_t g = in[q] | (static_cast<uint32_t>(in[q + 1]) << 8);
        prev[static_cast<size_t>(q) & rmask] = head[g];
        head[g] = q;
      }
    }
    p += consume;
  }
  bw.close();
  if (static_cast<int64_t>(stream.size()) > cap) return -2;
  std::memcpy(out, stream.data(), stream.size());
  return static_cast<int64_t>(stream.size());
}

// Exact decoded size of a stream (scan tokens, sum len+1).  <0 on error.
int64_t lz77_decode_bound(const uint8_t* in, int64_t n) {
  if (n < 4) return -1;
  BitReader br(in, n);
  uint32_t sb, la;
  if (!br.get(16, &sb) || !br.get(16, &la)) return -1;
  if (la < 2 || sb < 1) return -3;
  const int off_bits = bitof(static_cast<int>(sb));
  const int len_bits = bitof(static_cast<int>(la));
  int64_t total = 0;
  uint32_t off, len, next;
  while (br.get(off_bits, &off) && br.get(len_bits, &len) &&
         br.get(8, &next)) {
    total += static_cast<int64_t>(len) + 1;
  }
  return total;
}

// Decode a complete stream.  Returns decoded size or <0 on error.
int64_t lz77_decode(const uint8_t* in, int64_t n, uint8_t* out, int64_t cap) {
  if (n < 4) return -1;
  BitReader br(in, n);
  uint32_t sb, la;
  if (!br.get(16, &sb) || !br.get(16, &la)) return -1;
  if (la < 2 || sb < 1) return -3;
  const int off_bits = bitof(static_cast<int>(sb));
  const int len_bits = bitof(static_cast<int>(la));
  int64_t w = 0;
  uint32_t off, len, next;
  while (br.get(off_bits, &off) && br.get(len_bits, &len) &&
         br.get(8, &next)) {
    if (w + static_cast<int64_t>(len) + 1 > cap) return -2;
    if (len > 0) {
      if (off == 0 || static_cast<int64_t>(off) > w) return -4;  // corrupt
      const uint8_t* src = out + (w - off);
      uint8_t* dst = out + w;
      if (off >= len) {
        std::memcpy(dst, src, len);
      } else {
        for (uint32_t i = 0; i < len; ++i) dst[i] = src[i];  // overlap runs
      }
      w += len;
    }
    out[w++] = static_cast<uint8_t>(next);
  }
  return w;
}

// Greedy-parse walk over a block's match-length table (device-produced).
// L[p] is the capped longest-match length at block position p; the walk
// starts at `entry` and stops at `valid`.  Writes token start positions to
// `starts_out` (capacity >= valid), stores the exit position (>= valid) in
// *exit_pos, returns the token count.  This is the host half of the
// encode pipeline: O(T) with ~ns per token, pairing with the O(n*sb)
// device match phase (SURVEY.md §7 insight 2).
int64_t lz77_parse_block(const uint8_t* L, int64_t valid, int64_t entry,
                         int32_t* starts_out, int64_t* exit_pos) {
  int64_t p = entry;
  int64_t c = 0;
  while (p < valid) {
    starts_out[c++] = static_cast<int32_t>(p);
    p += static_cast<int64_t>(L[p]) + 1;
  }
  *exit_pos = p;
  return c;
}

// Pack T tokens into stream payload bytes (no header).  Returns the number
// of PAYLOAD BITS written; bytes written = ceil(bits/8) with the final
// partial byte zero-padded only if `flush_partial` (block payloads are
// bit-contiguous, so intermediate blocks of non-byte-aligned widths must be
// merged by the caller; for byte-aligned widths bytes are exact).
int64_t lz77_pack_tokens(const int32_t* off, const uint8_t* len,
                         const uint8_t* next, int64_t T, int la, int sb,
                         uint8_t* out, int64_t cap) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -1;
  const int off_bits = bitof(sb);
  const int len_bits = bitof(la);
  const int64_t width = off_bits + len_bits + 8;
  if ((T * width + 7) / 8 > cap) return -2;
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>((T * width + 7) / 8));
  BitWriter bw(buf);
  for (int64_t i = 0; i < T; ++i) {
    bw.put(static_cast<uint32_t>(off[i]), off_bits);
    bw.put(len[i], len_bits);
    bw.put(next[i], 8);
  }
  bw.close();
  std::memcpy(out, buf.data(), buf.size());
  return T * width;
}

// Unpack all whole tokens from a payload (no header).  Returns token count.
int64_t lz77_unpack_tokens(const uint8_t* payload, int64_t nbytes, int la,
                           int sb, int32_t* off, uint8_t* len,
                           uint8_t* next) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -1;
  const int off_bits = bitof(sb);
  const int len_bits = bitof(la);
  BitReader br(payload, nbytes);
  int64_t c = 0;
  uint32_t o, l, nx;
  while (br.get(off_bits, &o) && br.get(len_bits, &l) && br.get(8, &nx)) {
    off[c] = static_cast<int32_t>(o);
    len[c] = static_cast<uint8_t>(l);
    next[c] = static_cast<uint8_t>(nx);
    ++c;
  }
  return c;
}

}  // extern "C"
