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
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
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
  explicit BitWriter(std::vector<uint8_t>& o, int bit_phase = 0)
      : out(o), nbits(bit_phase) {}  // phase: low zero bits of the 1st byte
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
    if (nbits < width && end - p >= 4) {  // bulk refill: 32 bits at once
      uint32_t w32;
      std::memcpy(&w32, p, 4);
      acc |= static_cast<uint64_t>(w32) << nbits;
      p += 4;
      nbits += 32;
    }
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

// Longest l in [0, cap] with a[i] == b[i], word-at-a-time (b may overlap a
// ahead of it — byte equality semantics are overlap-agnostic, unlike copies).
inline int match_len(const uint8_t* a, const uint8_t* b, int cap) {
  int l = 0;
  while (l + 8 <= cap) {
    uint64_t wa, wb;
    std::memcpy(&wa, a + l, 8);
    std::memcpy(&wb, b + l, 8);
    const uint64_t x = wa ^ wb;
    if (x) return l + (__builtin_ctzll(x) >> 3);
    l += 8;
  }
  while (l < cap && a[l] == b[l]) ++l;
  return l;
}

// Exact sliding-window matcher: 2-gram hash chains + byte last-occurrence
// table.  Finds the true longest match with smallest-offset tie-break —
// identical semantics (and therefore identical streams) to the device
// matchers and the numpy spec.  Replaces the reference's path-limited BST
// (tree.c:118-152) whose answer it dominates (SURVEY.md §2.4).
struct ChainMatcher {
  std::vector<int64_t> head;
  std::vector<int64_t> prev;
  int64_t last_byte[256];
  size_t rmask = 0;
  const uint8_t* in = nullptr;
  int64_t n = 0;
  int dlim = 0;
  int max_len = 0;

  void init(const uint8_t* data, int64_t size, int dlim_, int max_len_) {
    in = data;
    n = size;
    dlim = dlim_;
    max_len = max_len_;
    head.assign(1 << 16, -1);
    size_t ring = 64;
    while (ring < static_cast<size_t>(2 * (dlim + 1))) ring <<= 1;
    rmask = ring - 1;
    prev.assign(ring, -1);
    for (int i = 0; i < 256; ++i) last_byte[i] = -1;
  }

  inline void insert(int64_t q) {
    last_byte[in[q]] = q;
    if (q + 1 < n) {
      const uint32_t g = in[q] | (static_cast<uint32_t>(in[q + 1]) << 8);
      prev[static_cast<size_t>(q) & rmask] = head[g];
      head[g] = q;
    }
  }

  // Exact longest match at p (length <= cap_len), nearest-first walk.
  inline void find(int64_t p, int cap_len, int* blen, int64_t* boff) const {
    int best_len = 0;
    int64_t best_off = 0;
    if (cap_len >= 1 && dlim >= 1) {
      const int64_t q1 = last_byte[in[p]];
      if (q1 >= 0 && p - q1 <= dlim) {
        best_len = 1;
        best_off = p - q1;
      }
      if (cap_len >= 2 && p + 1 < n) {
        const uint32_t g = in[p] | (static_cast<uint32_t>(in[p + 1]) << 8);
        for (int64_t q = head[g]; q >= 0 && p - q <= dlim;) {
          const int l = 2 + match_len(in + p + 2, in + q + 2, cap_len - 2);
          if (l > best_len) {
            best_len = l;
            best_off = p - q;
            if (l >= cap_len) break;  // cannot improve
          }
          const int64_t qp = prev[static_cast<size_t>(q) & rmask];
          if (qp >= q) break;  // stale ring slot
          q = qp;
        }
      }
    }
    *blen = best_len;
    *boff = best_off;
  }
};

// Exact longest match by ascending distance sweep (no tables).  Used for the
// short pre-resync fixup walks of the parallel encoder where building hash
// state would cost more than it saves.
inline void brute_find(const uint8_t* in, int64_t n, int64_t p, int cap_len,
                       int dlim, int* blen, int64_t* boff, int64_t* cost) {
  int best_len = 0;
  int64_t best_off = 0;
  const int64_t dmax = p < dlim ? p : dlim;
  int64_t d = 1;
  if (cap_len >= 1) {
    for (; d <= dmax; ++d) {
      if (in[p] != in[p - d]) continue;
      const int l = 1 + match_len(in + p + 1, in + p - d + 1, cap_len - 1);
      if (l > best_len) {
        best_len = l;
        best_off = d;
        if (l >= cap_len) break;
      }
    }
  }
  *cost += d;
  *blen = best_len;
  *boff = best_off;
}

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

  ChainMatcher m;
  m.init(in, n, dlim, max_len);

  int64_t p = 0;
  while (p < n) {
    const int cap_len =
        static_cast<int>(n - p - 1 < max_len ? n - p - 1 : max_len);
    int best_len;
    int64_t best_off;
    m.find(p, cap_len, &best_len, &best_off);

    // One fused put per token (width <= 32: off <= 16, len <= 8, next 8)
    // instead of three — the byte-emit loop amortizes once per token.
    const uint8_t next = in[p + best_len];
    bw.put(static_cast<uint32_t>(best_off) |
               (static_cast<uint32_t>(best_len) << off_bits) |
               (static_cast<uint32_t>(next) << (off_bits + len_bits)),
           off_bits + len_bits + 8);

    const int64_t consume = best_len + 1;
    for (int64_t i = 0; i < consume && p + i < n; ++i) m.insert(p + i);
    p += consume;
  }
  bw.close();
  if (static_cast<int64_t>(stream.size()) > cap) return -2;
  std::memcpy(out, stream.data(), stream.size());
  return static_cast<int64_t>(stream.size());
}

// ---------------------------------------------------------------------------
// Parallel exact encoder.
//
// The greedy token chain starting at a position is a pure function of that
// position (matches depend only on the window's bytes, never on how the
// parse arrived).  So: phase 1 parses every block SPECULATIVELY from its
// first byte in parallel, recording each visited position's token index;
// phase 2 chains the true entry positions serially — when a block's true
// entry differs from its start (the previous block's last token overlapped
// the boundary by < la bytes), a short fixup walk re-derives tokens with an
// ascending-distance exact matcher until it lands on a speculatively
// visited position, then splices the precomputed chain.  On typical data
// the parses resynchronise within a few tokens; periodic data that never
// resyncs is handled by an op budget that flips the fixup to a fresh
// hash-chain walk (bounded at ~1x the block's phase-1 cost).  The output
// stream is byte-identical to lz77_encode's for every input.
// ---------------------------------------------------------------------------

namespace {

struct BlockParse {
  std::vector<uint32_t> tok;       // off | len << 16 | next << 24
  std::vector<uint64_t> visited;   // bitmap over positions - start
  int64_t exit_spec = 0;           // first position >= block end

  inline bool is_visited(int64_t rel) const {
    return (visited[static_cast<size_t>(rel >> 6)] >> (rel & 63)) & 1;
  }
  // Token index of a visited position: its rank in the bitmap.
  inline int64_t rank(int64_t rel) const {
    const int64_t w = rel >> 6;
    int64_t r = 0;
    for (int64_t i = 0; i < w; ++i) {
      r += __builtin_popcountll(visited[static_cast<size_t>(i)]);
    }
    const uint64_t mask = (rel & 63) ? ((1ull << (rel & 63)) - 1) : 0;
    return r + __builtin_popcountll(visited[static_cast<size_t>(w)] & mask);
  }
};

inline uint32_t pack_tok(int64_t off, int len, uint8_t next) {
  return static_cast<uint32_t>(off) | (static_cast<uint32_t>(len) << 16) |
         (static_cast<uint32_t>(next) << 24);
}

void speculative_block(const uint8_t* in, int64_t n, int64_t bs, int64_t be,
                       int dlim, int max_len, BlockParse* bp) {
  ChainMatcher m;
  m.init(in, n, dlim, max_len);
  const int64_t h0 = bs - dlim < 0 ? 0 : bs - dlim;
  for (int64_t q = h0; q < bs; ++q) m.insert(q);  // halo: true window bytes
  bp->visited.assign(static_cast<size_t>(((be - bs) >> 6) + 1), 0);
  bp->tok.clear();
  bp->tok.reserve(static_cast<size_t>((be - bs) / 4 + 16));
  int64_t p = bs;
  while (p < be) {
    const int cap_len =
        static_cast<int>(n - p - 1 < max_len ? n - p - 1 : max_len);
    int len;
    int64_t off;
    m.find(p, cap_len, &len, &off);
    bp->visited[static_cast<size_t>((p - bs) >> 6)] |= 1ull << ((p - bs) & 63);
    bp->tok.push_back(pack_tok(off, len, in[p + len]));
    const int64_t consume = len + 1;
    for (int64_t i = 0; i < consume && p + i < n; ++i) m.insert(p + i);
    p += consume;
  }
  bp->exit_spec = p;
}

}  // namespace

// Parallel exact encode: same stream as lz77_encode, block-parallel.
// `nthreads` <= 0 means hardware concurrency; `block_size` <= 0 picks a
// default.  Returns stream size or <0 (same error codes as lz77_encode).
int64_t lz77_encode_mt(const uint8_t* in, int64_t n, int la, int sb,
                       uint8_t* out, int64_t cap, int nthreads,
                       int64_t block_size) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -1;
  const int off_bits = bitof(sb);
  const int len_bits = bitof(la);
  const int max_len = la - 1;
  const int dlim = off_bits >= 31 ? sb
      : (sb < (1 << off_bits) - 1 ? sb : (1 << off_bits) - 1);

  if (block_size <= 0) {
    // Default: one block per thread (phase-1 cost is uniform per byte, so
    // static assignment balances), floored at 1 MiB and capped at 64 MiB.
    int hw0 = static_cast<int>(std::thread::hardware_concurrency());
    if (hw0 <= 0) hw0 = 1;
    const int nt = nthreads > 0 ? nthreads : hw0;
    block_size = (n + nt - 1) / (nt > 0 ? nt : 1);
    if (block_size < (1 << 20)) block_size = 1 << 20;
    if (block_size > (64 << 20)) block_size = 64 << 20;
  }
  if (block_size < 4 * la) block_size = 4 * la;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 1;
  if (nthreads <= 0) nthreads = hw;
  const int64_t nb = n > 0 ? (n + block_size - 1) / block_size : 0;
  if (nthreads > nb) nthreads = static_cast<int>(nb > 0 ? nb : 1);

  if (n == 0 || nthreads <= 1 || nb <= 1) {
    return lz77_encode(in, n, la, sb, out, cap);
  }

  // Phase 1: speculative per-block parses, blocks strided over threads.
  std::vector<BlockParse> parses(static_cast<size_t>(nb));
  {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(nthreads));
    for (int t = 0; t < nthreads; ++t) {
      pool.emplace_back([&, t]() {
        for (int64_t b = t; b < nb; b += nthreads) {
          const int64_t bs = b * block_size;
          const int64_t be = bs + block_size < n ? bs + block_size : n;
          speculative_block(in, n, bs, be, dlim, max_len,
                            &parses[static_cast<size_t>(b)]);
        }
      });
    }
    for (auto& th : pool) th.join();
  }

  // Phase 2a: serial entry chaining.  Resolves each block's final token
  // list as (head tokens from the fixup walk) + (a spliced tail range of
  // the speculative chain).  Cheap on resynchronising data; the op budget
  // bounds pathological never-resync inputs at ~1x the block's serial cost.
  std::vector<std::vector<uint32_t>> heads(static_cast<size_t>(nb));
  std::vector<int64_t> tail_from(static_cast<size_t>(nb));  // -1: no tail
  int64_t total_tokens = 0;
  int64_t entry = 0;
  for (int64_t b = 0; b < nb; ++b) {
    const int64_t bs = b * block_size;
    const int64_t be = bs + block_size < n ? bs + block_size : n;
    BlockParse& bp = parses[static_cast<size_t>(b)];
    tail_from[static_cast<size_t>(b)] = -1;
    if (entry >= be) continue;  // previous token swallowed this whole block
    if (entry == bs) {
      tail_from[static_cast<size_t>(b)] = 0;
      total_tokens += static_cast<int64_t>(bp.tok.size());
      entry = bp.exit_spec;
      continue;
    }
    // Fixup walk from the true entry until it lands on a speculatively
    // visited position, then splice the precomputed tail.
    std::vector<uint32_t>& head = heads[static_cast<size_t>(b)];
    int64_t p = entry;
    int64_t budget = (be - bs) * 8;  // ~ phase-1 cost of this block
    while (p < be) {
      if (bp.is_visited(p - bs)) {  // resynchronised
        const int64_t idx = bp.rank(p - bs);
        tail_from[static_cast<size_t>(b)] = idx;
        total_tokens += static_cast<int64_t>(bp.tok.size()) - idx;
        p = bp.exit_spec;
        break;
      }
      const int cap_len =
          static_cast<int>(n - p - 1 < max_len ? n - p - 1 : max_len);
      int len;
      int64_t off;
      if (budget > 0) {
        int64_t cost = 0;
        brute_find(in, n, p, cap_len, dlim, &len, &off, &cost);
        budget -= cost;
      } else {
        // Budget blown (periodic input that never resyncs): finish the
        // block with a fresh hash-chain walk at ~serial cost.
        ChainMatcher m;
        m.init(in, n, dlim, max_len);
        const int64_t h0 = p - dlim < 0 ? 0 : p - dlim;
        for (int64_t q = h0; q < p; ++q) m.insert(q);
        while (p < be) {
          const int cl =
              static_cast<int>(n - p - 1 < max_len ? n - p - 1 : max_len);
          int l2;
          int64_t o2;
          m.find(p, cl, &l2, &o2);
          head.push_back(pack_tok(o2, l2, in[p + l2]));
          const int64_t consume = l2 + 1;
          for (int64_t i = 0; i < consume && p + i < n; ++i) m.insert(p + i);
          p += consume;
        }
        break;
      }
      head.push_back(pack_tok(off, len, in[p + len]));
      p += len + 1;
    }
    total_tokens += static_cast<int64_t>(head.size());
    if (std::getenv("LZ77_MT_DEBUG")) {
      std::fprintf(stderr,
                   "lz77_mt block %lld: head=%zu spliced=%d budget_left=%lld\n",
                   static_cast<long long>(b), head.size(),
                   tail_from[static_cast<size_t>(b)] >= 0 ? 1 : 0,
                   static_cast<long long>(budget));
    }
    entry = p;
  }

  // Phase 2b: parallel pack.  Token bit positions are affine (SURVEY.md §7
  // insight 1), so every block's payload span is known up front; each block
  // packs into a local buffer starting at its bit phase and the buffers are
  // OR-merged at the (at most one) shared boundary byte.
  const int64_t width = off_bits + len_bits + 8;
  const int64_t total_bits = 32 + total_tokens * width;
  if ((total_bits + 7) / 8 > cap) return -2;

  std::vector<int64_t> tok_before(static_cast<size_t>(nb) + 1, 0);
  for (int64_t b = 0; b < nb; ++b) {
    const int64_t c =
        static_cast<int64_t>(heads[static_cast<size_t>(b)].size()) +
        (tail_from[static_cast<size_t>(b)] >= 0
             ? static_cast<int64_t>(
                   parses[static_cast<size_t>(b)].tok.size()) -
                   tail_from[static_cast<size_t>(b)]
             : 0);
    tok_before[static_cast<size_t>(b) + 1] = tok_before[static_cast<size_t>(b)] + c;
  }

  std::vector<std::vector<uint8_t>> bufs(static_cast<size_t>(nb));
  {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(nthreads));
    for (int t = 0; t < nthreads; ++t) {
      pool.emplace_back([&, t]() {
        for (int64_t b = t; b < nb; b += nthreads) {
          const int64_t bit0 = 32 + tok_before[static_cast<size_t>(b)] * width;
          std::vector<uint8_t>& buf = bufs[static_cast<size_t>(b)];
          const int64_t c = tok_before[static_cast<size_t>(b) + 1] -
                            tok_before[static_cast<size_t>(b)];
          if (c == 0) continue;  // swallowed block: no bytes, no padding
          buf.reserve(static_cast<size_t>((c * width) / 8 + 2));
          BitWriter pw(buf, static_cast<int>(bit0 & 7));
          const auto emit = [&](uint32_t tk) {
            // fused single put per token (see lz77_encode)
            pw.put((tk & 0xFFFF) | (((tk >> 16) & 0xFF) << off_bits) |
                       ((tk >> 24) << (off_bits + len_bits)),
                   static_cast<int>(width));
          };
          for (uint32_t tk : heads[static_cast<size_t>(b)]) emit(tk);
          const int64_t tf = tail_from[static_cast<size_t>(b)];
          if (tf >= 0) {
            const std::vector<uint32_t>& tok =
                parses[static_cast<size_t>(b)].tok;
            for (size_t i = static_cast<size_t>(tf); i < tok.size(); ++i) {
              emit(tok[i]);
            }
          }
          pw.close();
        }
      });
    }
    for (auto& th : pool) th.join();
  }

  // Serial merge: header, then each block's bytes; a block whose payload
  // starts mid-byte contributes its low bits by OR into the shared byte.
  out[0] = static_cast<uint8_t>(sb & 0xFF);
  out[1] = static_cast<uint8_t>(sb >> 8);
  out[2] = static_cast<uint8_t>(la & 0xFF);
  out[3] = static_cast<uint8_t>(la >> 8);
  int64_t wpos = 4;  // next unwritten byte
  for (int64_t b = 0; b < nb; ++b) {
    const std::vector<uint8_t>& buf = bufs[static_cast<size_t>(b)];
    if (buf.empty()) continue;
    const int64_t bit0 = 32 + tok_before[static_cast<size_t>(b)] * width;
    const int64_t byte0 = bit0 / 8;
    size_t i = 0;
    if (byte0 < wpos) {  // shared boundary byte
      out[byte0] |= buf[0];
      i = 1;
    }
    if (i < buf.size()) {
      std::memcpy(out + byte0 + i, buf.data() + i, buf.size() - i);
    }
    wpos = byte0 + static_cast<int64_t>(buf.size());
  }
  return (total_bits + 7) / 8;
}

// Exact decoded size of a stream (scan tokens, sum len+1).  <0 on error.
int64_t lz77_decode_bound(const uint8_t* in, int64_t n) {
  if (n < 4) return -1;
  BitReader br(in, n);
  uint32_t sb, la;
  if (!br.get(16, &sb) || !br.get(16, &la)) return -1;
  // Untrusted-input surface: a crafted header with la > 255 would push the
  // fused token width past 32 bits and overflow the bulk BitReader path, so
  // reject the same bounds the encoders enforce (reference CLI, main.c:35-38).
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -3;
  const int off_bits = bitof(static_cast<int>(sb));
  const int len_bits = bitof(static_cast<int>(la));
  const int width = off_bits + len_bits + 8;
  const uint32_t len_mask = len_bits ? ((1u << len_bits) - 1u) : 0u;
  int64_t total = 0;
  uint32_t tok;
  while (br.get(width, &tok)) {
    total += static_cast<int64_t>((tok >> off_bits) & len_mask) + 1;
  }
  return total;
}

// Decode a complete stream.  Returns decoded size or <0 on error.
int64_t lz77_decode(const uint8_t* in, int64_t n, uint8_t* out, int64_t cap) {
  if (n < 4) return -1;
  BitReader br(in, n);
  uint32_t sb, la;
  if (!br.get(16, &sb) || !br.get(16, &la)) return -1;
  // Same untrusted-header bounds as lz77_decode_bound: width must stay <= 32
  // for the fused token read below.
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -3;
  const int off_bits = bitof(static_cast<int>(sb));
  const int len_bits = bitof(static_cast<int>(la));
  const int width = off_bits + len_bits + 8;
  const uint32_t off_mask = off_bits ? ((1u << off_bits) - 1u) : 0u;
  const uint32_t len_mask = len_bits ? ((1u << len_bits) - 1u) : 0u;
  int64_t w = 0;
  uint32_t tok, off, len, next;
  // One bit-read per token.  width <= 32 (off <= 16, len <= 8, next 8 bits);
  // width == 32 (sb=65535, la>=129) works only because BitReader::get and the
  // masks special-case a full 32-bit read — keep that in mind when refactoring.
  while (br.get(width, &tok)) {
    off = tok & off_mask;
    len = (tok >> off_bits) & len_mask;
    next = (tok >> (off_bits + len_bits)) & 0xFFu;
    // Spec length cap: conforming encoders never emit len > la-1
    // (lz77.c:98 consumes len+1 <= la bytes; tree.c:136 stops at size-1).
    // len_mask can exceed la-1 (e.g. la=129 -> 8-bit field, mask 255), so
    // a crafted token must be rejected, not replayed (restrict-don't-
    // replicate policy, SURVEY.md 2.3.8).
    if (len + 1 > la) return -4;
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

}  // extern "C"

// ---------------------------------------------------------------------------
// Streamed bounded-memory decoder.
//
// The reference decodes arbitrarily large files in O(window) memory: tokens
// replay through a 3*SB+LA-byte buffer fed by 4 KiB buffered reads
// (lz77.c:148-197, bitio.c:103-121).  This is the same capability as a
// resumable state machine: the only cross-chunk state is the window tail
// (<= sb bytes) and the bit-reader carry (< 8 bits once per byte boundary).
// The host feeds arbitrary input chunks and drains bounded output slices;
// the emitted bytes are identical to lz77_decode's for every stream.
// ---------------------------------------------------------------------------

namespace {

struct DecStream {
  int header_done = 0;
  int hdr_have = 0;
  uint8_t hdr[4] = {0, 0, 0, 0};
  int sb = 0, la = 0, off_bits = 0, len_bits = 0, width = 0;
  uint64_t acc = 0;  // bit carry across feeds (always < width bits)
  int nbits = 0;
  int64_t total_out = 0;
  std::vector<uint8_t> buf;  // [window tail (win_len)] [new bytes this feed]
  int win_len = 0;
};

}  // namespace

extern "C" {

void* lz77_dec_new() { return new DecStream(); }

void lz77_dec_free(void* sp) { delete static_cast<DecStream*>(sp); }

// Total bytes decoded so far (valid any time).
int64_t lz77_dec_total(void* sp) {
  return static_cast<DecStream*>(sp)->total_out;
}

// Header params once parsed; returns 0 and fills sb/la, or -1 before the
// header is complete.
int64_t lz77_dec_params(void* sp, int32_t* sb, int32_t* la) {
  DecStream& s = *static_cast<DecStream*>(sp);
  if (!s.header_done) return -1;
  *sb = s.sb;
  *la = s.la;
  return 0;
}

// Feed up to `n` input bytes, producing at most `out_cap` decoded bytes.
// Returns bytes written (>= 0) or <0 on error (-3 invalid header, -4
// corrupt offset).  *consumed reports input bytes eaten this call; consumed
// bits are retained in the carry, so the caller never re-feeds.  The caller
// loop: while consumed < n or output was produced, keep feeding.  out_cap
// must be >= 256 (one max-size token) to guarantee forward progress.
int64_t lz77_dec_feed(void* sp, const uint8_t* in, int64_t n,
                      int64_t* consumed, uint8_t* out, int64_t out_cap) {
  DecStream& s = *static_cast<DecStream*>(sp);
  int64_t ip = 0;
  *consumed = 0;
  if (!s.header_done) {
    while (s.hdr_have < 4 && ip < n) s.hdr[s.hdr_have++] = in[ip++];
    if (s.hdr_have < 4) {
      *consumed = ip;
      return 0;  // header still incomplete: need more input
    }
    s.sb = s.hdr[0] | (s.hdr[1] << 8);
    s.la = s.hdr[2] | (s.hdr[3] << 8);
    // Same untrusted-header bounds as lz77_decode: width must stay <= 32.
    if (s.la < 2 || s.la > 255 || s.sb < 1 || s.sb > 65535) return -3;
    s.off_bits = bitof(s.sb);
    s.len_bits = bitof(s.la);
    s.width = s.off_bits + s.len_bits + 8;
    s.buf.assign(static_cast<size_t>(s.sb), 0);
    s.win_len = 0;
    s.header_done = 1;
  }
  const uint32_t off_mask =
      s.off_bits ? ((1u << s.off_bits) - 1u) : 0u;
  const uint32_t len_mask =
      s.len_bits ? ((1u << s.len_bits) - 1u) : 0u;
  const uint64_t tok_mask =
      (s.width < 64) ? ((1ull << s.width) - 1ull) : ~0ull;

  int64_t room = out_cap;
  if (static_cast<int64_t>(s.buf.size()) < s.win_len + room) {
    s.buf.resize(static_cast<size_t>(s.win_len + room));
  }
  uint8_t* b = s.buf.data();
  int64_t w = s.win_len;  // write cursor in buf
  const int64_t wend = s.win_len + room;
  int64_t tot = s.total_out;

  while (wend - w >= s.la + 1) {  // room for one max token (len+1 <= la)
    while (s.nbits < s.width) {
      if (ip - n <= -4) {  // bulk refill: 32 bits at once
        uint32_t w32;
        std::memcpy(&w32, in + ip, 4);
        s.acc |= static_cast<uint64_t>(w32) << s.nbits;
        ip += 4;
        s.nbits += 32;
      } else if (ip < n) {
        s.acc |= static_cast<uint64_t>(in[ip++]) << s.nbits;
        s.nbits += 8;
      } else {
        goto drained;  // sub-token bits stay in the carry (EOF padding rule)
      }
    }
    {
      const uint32_t tok = static_cast<uint32_t>(s.acc & tok_mask);
      s.acc >>= s.width;
      s.nbits -= s.width;
      const uint32_t off = tok & off_mask;
      const uint32_t len = (tok >> s.off_bits) & len_mask;
      const uint8_t next =
          static_cast<uint8_t>((tok >> (s.off_bits + s.len_bits)) & 0xFFu);
      // Memory-safety gate: the loop guard above reserves only la+1 output
      // bytes per token, but len_mask can exceed la-1 (la=129 -> mask 255);
      // a crafted len would write past buf and past the caller's out
      // capacity.  Conforming streams never emit len > la-1 (spec length
      // cap, SURVEY.md 2.3.4), so reject as corrupt.
      if (len + 1 > static_cast<uint32_t>(s.la)) return -4;
      if (len > 0) {
        // Bounded-history rule: only the last min(sb, tot) bytes exist, so
        // a source beyond either is corrupt (conforming encoders emit
        // off <= d_limit <= sb always).
        if (off == 0 || static_cast<int64_t>(off) > tot ||
            static_cast<int>(off) > s.sb) {
          return -4;
        }
        const uint8_t* src = b + (w - off);
        uint8_t* dst = b + w;
        if (off >= len) {
          std::memcpy(dst, src, len);
        } else {
          for (uint32_t i = 0; i < len; ++i) dst[i] = src[i];  // overlap runs
        }
        w += len;
        tot += len;
      }
      b[w++] = next;
      ++tot;
    }
  }
drained:
  const int64_t produced = w - s.win_len;
  std::memcpy(out, b + s.win_len, static_cast<size_t>(produced));
  s.total_out += produced;
  const int new_wl = static_cast<int>(
      s.win_len + produced < s.sb ? s.win_len + produced : s.sb);
  std::memmove(b, b + (w - new_wl), static_cast<size_t>(new_wl));
  s.win_len = new_wl;
  *consumed = ip;
  return produced;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Streamed bounded-memory encoder.
//
// The reference encodes arbitrarily large files in O(window) memory through
// its FILE loop (lz77.c:51-140, bitio.c:80-101).  Same capability here as a
// resumable state machine: the persistent state is the last d_limit bytes of
// history, the matcher's hash chains, and the bit-writer carry.  Emitted
// streams are byte-identical to lz77_encode for every input: the greedy
// parse is gated on `p + max_len + 1 <= avail`, so every token's match cap
// and lookahead are fully determined before it is emitted, and matcher
// insertions are replayed lazily in the same order as the serial loop.
//
// Coordinates are absolute stream positions (int64); the window buffer
// compacts by memmove + base shift, and hash-chain entries are never
// rebased — the existing `p - q <= dlim` staleness checks expire them.
// ---------------------------------------------------------------------------

namespace {

struct EncStream {
  int la = 0, sb = 0, off_bits = 0, len_bits = 0, max_len = 0, dlim = 0;
  int64_t base = 0;   // absolute position of buf[0]
  int64_t avail = 0;  // absolute position one past the last buffered byte
  int64_t p = 0;      // absolute parse cursor
  int64_t ins = 0;    // absolute next-position-to-insert into the matcher
  std::vector<uint8_t> buf;
  std::vector<int64_t> head;      // 2-gram -> most recent absolute position
  std::vector<int64_t> prev;      // ring of chain links (absolute)
  int64_t last_byte[256];
  size_t rmask = 0;
  std::vector<uint8_t> out;       // drained each feed
  uint64_t acc = 0;               // bit-writer carry
  int nbits = 0;

  inline const uint8_t* at(int64_t q) const { return buf.data() + (q - base); }

  inline void put(uint32_t value, int width) {
    acc |= static_cast<uint64_t>(value) << nbits;
    nbits += width;
    while (nbits >= 8) {
      out.push_back(static_cast<uint8_t>(acc & 0xFF));
      acc >>= 8;
      nbits -= 8;
    }
  }

  inline void insert_to(int64_t stop) {  // insert positions [ins, stop)
    for (; ins < stop; ++ins) {
      const uint8_t* s = at(ins);
      last_byte[s[0]] = ins;
      if (ins + 1 < avail) {
        const uint32_t g = s[0] | (static_cast<uint32_t>(s[1]) << 8);
        prev[static_cast<size_t>(ins) & rmask] = head[g];
        head[g] = ins;
      }
    }
  }

  // Exact longest match at p (identical semantics to ChainMatcher::find).
  inline void find(int cap_len, int* blen, int64_t* boff) const {
    int best_len = 0;
    int64_t best_off = 0;
    if (cap_len >= 1 && dlim >= 1) {
      const int64_t q1 = last_byte[*at(p)];
      if (q1 >= 0 && p - q1 <= dlim) {
        best_len = 1;
        best_off = p - q1;
      }
      if (cap_len >= 2 && p + 1 < avail) {
        const uint8_t* s = at(p);
        const uint32_t g = s[0] | (static_cast<uint32_t>(s[1]) << 8);
        for (int64_t q = head[g]; q >= 0 && p - q <= dlim;) {
          const int l = 2 + match_len(s + 2, at(q) + 2, cap_len - 2);
          if (l > best_len) {
            best_len = l;
            best_off = p - q;
            if (l >= cap_len) break;
          }
          const int64_t qp = prev[static_cast<size_t>(q) & rmask];
          if (qp >= q) break;  // stale ring slot
          q = qp;
        }
      }
    }
    *blen = best_len;
    *boff = best_off;
  }

  // Parse as far as the gate allows.  `final` lifts the lookahead gate at
  // end of input (last-token shrinkage, lz77.c:87,134).
  void parse(bool final) {
    const int tok_bits = off_bits + len_bits + 8;
    while (p < avail && (final || p + max_len + 1 <= avail)) {
      insert_to(p);
      const int cap_len = static_cast<int>(
          avail - p - 1 < max_len ? avail - p - 1 : max_len);
      int best_len;
      int64_t best_off;
      find(cap_len, &best_len, &best_off);
      const uint8_t next = *at(p + best_len);
      put(static_cast<uint32_t>(best_off) |
              (static_cast<uint32_t>(best_len) << off_bits) |
              (static_cast<uint32_t>(next) << (off_bits + len_bits)),
          tok_bits);
      p += best_len + 1;
    }
  }

  void compact() {
    // Keep [p - dlim, avail); everything older is beyond match range.
    const int64_t live_from = p - dlim > base ? p - dlim : base;
    const int64_t delta = live_from - base;
    if (delta <= 0) return;
    std::memmove(buf.data(), buf.data() + delta,
                 static_cast<size_t>(avail - live_from));
    base = live_from;
    if (ins < live_from) ins = live_from;  // (cannot happen: ins >= p-? )
  }
};

}  // namespace

extern "C" {

// Create a streamed encoder; returns nullptr on invalid parameters.
void* lz77_enc_new(int la, int sb) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return nullptr;
  EncStream* s = new EncStream();
  s->la = la;
  s->sb = sb;
  s->off_bits = bitof(sb);
  s->len_bits = bitof(la);
  s->max_len = la - 1;
  s->dlim = s->off_bits >= 31
      ? sb
      : (sb < (1 << s->off_bits) - 1 ? sb : (1 << s->off_bits) - 1);
  // Buffer: window + lookahead + compaction slack (amortizes the memmove
  // to ~1/8 byte moved per input byte).
  const int64_t min_sz = static_cast<int64_t>(s->dlim) + la + 2;
  int64_t bsz = 8 * min_sz;
  if (bsz < (1 << 20)) bsz = 1 << 20;
  s->buf.resize(static_cast<size_t>(bsz));
  s->head.assign(1 << 16, -1);
  size_t ring = 64;
  while (ring < static_cast<size_t>(2 * (s->dlim + 1))) ring <<= 1;
  s->rmask = ring - 1;
  s->prev.assign(ring, -1);
  for (int i = 0; i < 256; ++i) s->last_byte[i] = -1;
  s->put(static_cast<uint32_t>(sb), 16);  // header, lz77.c:74-75
  s->put(static_cast<uint32_t>(la), 16);
  return s;
}

void lz77_enc_free(void* sp) { delete static_cast<EncStream*>(sp); }

// Feed `n` input bytes; parse every token whose lookahead is fully known;
// drain up to `out_cap` stream bytes into `out`.  Returns bytes written or
// -2 if `out_cap` is too small for the bytes already produced (nothing is
// lost; call again with a larger buffer and n=0).  All `n` input bytes are
// always consumed.
int64_t lz77_enc_feed(void* sp, const uint8_t* in, int64_t n,
                      uint8_t* out, int64_t out_cap) {
  EncStream& s = *static_cast<EncStream*>(sp);
  int64_t done = 0;
  while (done < n) {
    int64_t space = static_cast<int64_t>(s.buf.size()) - (s.avail - s.base);
    if (space <= 0) {
      s.parse(false);
      s.compact();
      space = static_cast<int64_t>(s.buf.size()) - (s.avail - s.base);
      if (space <= 0) {  // cannot happen: buf >= 8*(dlim+la+2)
        s.buf.resize(s.buf.size() * 2);
        continue;
      }
    }
    const int64_t take = n - done < space ? n - done : space;
    std::memcpy(s.buf.data() + (s.avail - s.base), in + done,
                static_cast<size_t>(take));
    s.avail += take;
    done += take;
  }
  s.parse(false);
  s.compact();
  if (static_cast<int64_t>(s.out.size()) > out_cap) return -2;
  const int64_t produced = static_cast<int64_t>(s.out.size());
  std::memcpy(out, s.out.data(), s.out.size());
  s.out.clear();
  return produced;
}

// Flush: parse the tail with end-of-input semantics, pad the final partial
// byte (bitIO_close round-up, bitio.c:180-182), drain remaining bytes.
// Returns bytes written or -2 if out_cap is too small (call again).
int64_t lz77_enc_finish(void* sp, uint8_t* out, int64_t out_cap) {
  EncStream& s = *static_cast<EncStream*>(sp);
  if (s.p < s.avail) s.parse(true);
  if (s.nbits > 0) {
    s.out.push_back(static_cast<uint8_t>(s.acc & 0xFF));
    s.acc = 0;
    s.nbits = 0;
  }
  if (static_cast<int64_t>(s.out.size()) > out_cap) return -2;
  const int64_t produced = static_cast<int64_t>(s.out.size());
  std::memcpy(out, s.out.data(), s.out.size());
  s.out.clear();
  return produced;
}

}  // extern "C"

extern "C" {

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
    bw.put(static_cast<uint32_t>(off[i]) |
               (static_cast<uint32_t>(len[i]) << off_bits) |
               (static_cast<uint32_t>(next[i]) << (off_bits + len_bits)),
           static_cast<int>(width));
  }
  bw.close();
  std::memcpy(out, buf.data(), buf.size());
  return T * width;
}

// Pack T tokens starting at bit phase `phase` in [0, 8): the first output
// byte carries only bits >= phase (low bits zero, ready to OR-merge with the
// caller's trailing partial byte), the last partial byte is zero-padded.
// This is the native bit writer for NON-byte-aligned widths across block
// boundaries (bitio.c:203-236's job, a whole block per call instead of one
// bit per iteration).  Returns payload bits written (excluding the phase).
int64_t lz77_pack_tokens_phase(const int32_t* off, const uint8_t* len,
                               const uint8_t* next, int64_t T, int la, int sb,
                               int phase, uint8_t* out, int64_t cap) {
  if (la < 2 || la > 255 || sb < 1 || sb > 65535) return -1;
  if (phase < 0 || phase > 7) return -1;
  const int off_bits = bitof(sb);
  const int len_bits = bitof(la);
  const int64_t width = off_bits + len_bits + 8;
  if ((phase + T * width + 7) / 8 > cap) return -2;
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>((phase + T * width + 7) / 8));
  BitWriter bw(buf, phase);
  for (int64_t i = 0; i < T; ++i) {
    bw.put(static_cast<uint32_t>(off[i]) |
               (static_cast<uint32_t>(len[i]) << off_bits) |
               (static_cast<uint32_t>(next[i]) << (off_bits + len_bits)),
           static_cast<int>(width));
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
  const int width = off_bits + len_bits + 8;
  const uint32_t off_mask = off_bits ? ((1u << off_bits) - 1u) : 0u;
  const uint32_t len_mask = len_bits ? ((1u << len_bits) - 1u) : 0u;
  BitReader br(payload, nbytes);
  int64_t c = 0;
  uint32_t tok;
  while (br.get(width, &tok)) {
    off[c] = static_cast<int32_t>(tok & off_mask);
    len[c] = static_cast<uint8_t>((tok >> off_bits) & len_mask);
    next[c] = static_cast<uint8_t>((tok >> (off_bits + len_bits)) & 0xFFu);
    ++c;
  }
  return c;
}

}  // extern "C"
