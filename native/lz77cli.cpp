// lz77cli — native command-line driver over the lz77host runtime.
//
// Flag-compatible with the reference binary's surface (main.c:50-58):
//   -c encode | -d decode, -i IN, -o OUT, -l LA, -s SB, -h help
// plus -t THREADS for the block-parallel encoder (lz77_encode_mt; emits
// byte-identical streams to the serial encoder).  Validation ranges match
// main.c:35-38; like the Python CLI, degenerate -s values (0, 1, powers of
// two) are rejected because the reference encoder corrupts them
// (SURVEY.md §2.3.8) — -f accepts them using the safe restricted distance.
//
// This is the "golden" native CLI used for differential testing against
// both the Python CLI and the C reference binary (tests/test_cli.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>

extern "C" {
int64_t lz77_encode_bound(int64_t n, int la, int sb);
int64_t lz77_encode_mt(const uint8_t* in, int64_t n, int la, int sb,
                       uint8_t* out, int64_t cap, int nthreads,
                       int64_t block_size);
void* lz77_enc_new(int la, int sb);
void lz77_enc_free(void* sp);
int64_t lz77_enc_feed(void* sp, const uint8_t* in, int64_t n,
                      uint8_t* out, int64_t out_cap);
int64_t lz77_enc_finish(void* sp, uint8_t* out, int64_t out_cap);
void* lz77_dec_new();
void lz77_dec_free(void* sp);
int64_t lz77_dec_params(void* sp, int32_t* sb, int32_t* la);
int64_t lz77_dec_feed(void* sp, const uint8_t* in, int64_t n,
                      int64_t* consumed, uint8_t* out, int64_t out_cap);
}

namespace {

void usage(const char* prog) {
  std::fprintf(
      stderr,
      "Usage: %s (-c|-d) -i IN -o OUT [-l LA] [-s SB] [-t THREADS] [-f] [-r]\n"
      "  -c  encode (streamed, O(window) memory)   -d  decode (streamed)\n"
      "  -l  lookahead size [2,255] (default 15)\n"
      "  -s  search-buffer size [1,65535], not 1 or a power of two unless -f\n"
      "  -t  encoder threads; >1 selects the in-memory block-parallel path\n"
      "  -r  print a JSON run report (incl. this process's peak RSS)\n",
      prog);
}

double now_s() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

// This process's own peak RSS in MB, from /proc/self/status VmHWM — the
// per-mm high-water mark, which resets at exec (getrusage ru_maxrss does
// not: a forked child inherits the parent's resident set via COW, so big
// parents pollute it).  Returns -1 when unavailable.
double peak_rss_mb() {
  FILE* f = std::fopen("/proc/self/status", "r");
  if (!f) return -1.0;
  char line[256];
  double mb = -1.0;
  while (std::fgets(line, sizeof line, f)) {
    long kb;
    if (std::sscanf(line, "VmHWM: %ld kB", &kb) == 1) {
      mb = kb / 1024.0;
      break;
    }
  }
  std::fclose(f);
  return mb;
}

void report(const char* mode, double secs, int64_t in_bytes,
            int64_t out_bytes) {
  std::fprintf(stderr,
               "{\"mode\": \"%s\", \"seconds\": %.6f, \"input_bytes\": %lld, "
               "\"output_bytes\": %lld, \"mb_per_s\": %.3f, "
               "\"peak_rss_mb\": %.1f}\n",
               mode, secs, static_cast<long long>(in_bytes),
               static_cast<long long>(out_bytes),
               secs > 0 ? in_bytes / secs / 1e6 : 0.0, peak_rss_mb());
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n < 0 ? 0 : n));
  const size_t got = n > 0 ? std::fread(out->data(), 1, out->size(), f) : 0;
  std::fclose(f);
  return got == out->size();
}

}  // namespace

int main(int argc, char** argv) {
  int mode = 0;  // 1 = encode, 2 = decode
  const char* in_path = nullptr;
  const char* out_path = nullptr;
  int la = 15, sb = 4095, threads = 1;
  bool force_sb = false, want_report = false;
  for (int i = 1; i < argc; ++i) {
    const char* a = argv[i];
    if (!std::strcmp(a, "-c")) mode = 1;
    else if (!std::strcmp(a, "-d")) mode = 2;
    else if (!std::strcmp(a, "-f")) force_sb = true;
    else if (!std::strcmp(a, "-r")) want_report = true;
    else if (!std::strcmp(a, "-h")) { usage(argv[0]); return 0; }
    else if (!std::strcmp(a, "-i") && i + 1 < argc) in_path = argv[++i];
    else if (!std::strcmp(a, "-o") && i + 1 < argc) out_path = argv[++i];
    else if (!std::strcmp(a, "-l") && i + 1 < argc) la = std::atoi(argv[++i]);
    else if (!std::strcmp(a, "-s") && i + 1 < argc) sb = std::atoi(argv[++i]);
    else if (!std::strcmp(a, "-t") && i + 1 < argc) {
      threads = std::atoi(argv[++i]);
    } else {
      std::fprintf(stderr, "Unknown or incomplete option: %s\n", a);
      usage(argv[0]);
      return 1;
    }
  }
  if (!mode || !in_path || !out_path) { usage(argv[0]); return 1; }
  if (la < 2 || la > 255) {
    std::fprintf(stderr, "Bad lookahead size value.\n");
    return 1;
  }
  if (sb < 1 || sb > 65535) {
    std::fprintf(stderr, "Bad search-buffer size value.\n");
    return 1;
  }
  if (!force_sb && (sb < 2 || (sb & (sb - 1)) == 0)) {
    std::fprintf(stderr,
                 "Search-buffer size %d is degenerate (reference corrupts "
                 "0/1/powers of two); use -f to encode safely anyway.\n",
                 sb);
    return 1;
  }

  const double t0 = now_s();
  if (mode == 2) {
    // Streamed bounded-memory decode: O(window) RSS for any stream size —
    // the reference's decode capability (lz77.c:148-197 + bitio.c:103-121)
    // through the resumable lz77_dec state machine.
    FILE* fi = std::fopen(in_path, "rb");
    if (!fi) {
      std::fprintf(stderr, "Opening input file: %s\n", in_path);
      return 1;
    }
    FILE* fo = std::fopen(out_path, "wb");
    if (!fo) {
      std::fprintf(stderr, "Opening output file: %s\n", out_path);
      std::fclose(fi);
      return 1;
    }
    void* ds = lz77_dec_new();
    std::vector<uint8_t> inbuf(8 << 20), outbuf(4 << 20);
    int rc = 0;
    int64_t in_total = 0, out_total = 0;
    size_t got;
    while ((got = std::fread(inbuf.data(), 1, inbuf.size(), fi)) > 0) {
      in_total += static_cast<int64_t>(got);
      int64_t done = 0;
      while (true) {
        int64_t consumed = 0;
        const int64_t produced = lz77_dec_feed(
            ds, inbuf.data() + done, static_cast<int64_t>(got) - done,
            &consumed, outbuf.data(), static_cast<int64_t>(outbuf.size()));
        done += consumed;
        if (produced < 0) {
          std::fprintf(stderr, "Error reading bits: corrupt stream (%lld)\n",
                       static_cast<long long>(produced));
          rc = 1;
          break;
        }
        if (produced > 0) {
          if (std::fwrite(outbuf.data(), 1, static_cast<size_t>(produced),
                          fo) != static_cast<size_t>(produced)) {
            std::fprintf(stderr, "Writing output file: %s\n", out_path);
            rc = 1;
            break;
          }
          out_total += produced;
        } else if (done >= static_cast<int64_t>(got)) {
          break;
        }
      }
      if (rc) break;
    }
    int32_t hsb = 0, hla = 0;
    if (!rc && lz77_dec_params(ds, &hsb, &hla) != 0) {
      std::fprintf(stderr, "Error reading bits: truncated header\n");
      rc = 1;
    }
    lz77_dec_free(ds);
    std::fclose(fi);
    std::fclose(fo);
    if (!rc && want_report) {
      report("decode", now_s() - t0, in_total, out_total);
    }
    return rc;
  }

  if (threads == 1) {
    // Streamed O(window) encode: chunked file-to-file through the
    // lz77_enc state machine — flat RSS at any input size, byte-identical
    // streams to the in-memory encoders (the reference's FILE-loop
    // capability, lz77.c:51-140 + bitio.c:80-101).
    void* es = lz77_enc_new(la, sb);
    if (!es) {
      std::fprintf(stderr, "Codec error: bad parameters\n");
      return 1;
    }
    FILE* fi = std::fopen(in_path, "rb");
    if (!fi) {
      std::fprintf(stderr, "Opening input file: %s\n", in_path);
      lz77_enc_free(es);
      return 1;
    }
    FILE* fo = std::fopen(out_path, "wb");
    if (!fo) {
      std::fprintf(stderr, "Opening output file: %s\n", out_path);
      std::fclose(fi);
      lz77_enc_free(es);
      return 1;
    }
    const int64_t chunk = 8 << 20;
    std::vector<uint8_t> inbuf(static_cast<size_t>(chunk));
    std::vector<uint8_t> outbuf(
        static_cast<size_t>(lz77_encode_bound(chunk, la, sb)));
    int rc = 0;
    int64_t in_total = 0, out_total = 0;
    size_t got;
    while ((got = std::fread(inbuf.data(), 1, inbuf.size(), fi)) > 0) {
      in_total += static_cast<int64_t>(got);
      const int64_t produced = lz77_enc_feed(
          es, inbuf.data(), static_cast<int64_t>(got), outbuf.data(),
          static_cast<int64_t>(outbuf.size()));
      if (produced < 0) {
        std::fprintf(stderr, "Codec error %lld\n",
                     static_cast<long long>(produced));
        rc = 1;
        break;
      }
      if (std::fwrite(outbuf.data(), 1, static_cast<size_t>(produced), fo)
          != static_cast<size_t>(produced)) {
        std::fprintf(stderr, "Writing output file: %s\n", out_path);
        rc = 1;
        break;
      }
      out_total += produced;
    }
    if (!rc) {
      const int64_t produced = lz77_enc_finish(
          es, outbuf.data(), static_cast<int64_t>(outbuf.size()));
      if (produced < 0 ||
          std::fwrite(outbuf.data(), 1, static_cast<size_t>(produced), fo)
              != static_cast<size_t>(produced)) {
        std::fprintf(stderr, "Codec error: flush failed\n");
        rc = 1;
      }
      out_total += produced > 0 ? produced : 0;
    }
    lz77_enc_free(es);
    std::fclose(fi);
    std::fclose(fo);
    if (!rc && want_report) report("encode", now_s() - t0, in_total, out_total);
    return rc;
  }

  // threads != 1: block-parallel in-memory path (byte-identical streams).
  std::vector<uint8_t> in;
  if (!read_file(in_path, &in)) {
    std::fprintf(stderr, "Opening input file: %s\n", in_path);
    return 1;
  }
  std::vector<uint8_t> out;
  const int64_t cap =
      lz77_encode_bound(static_cast<int64_t>(in.size()), la, sb);
  out.resize(static_cast<size_t>(cap));
  const int64_t size = lz77_encode_mt(
      in.data(), static_cast<int64_t>(in.size()), la, sb, out.data(), cap,
      threads, 0);
  if (size < 0) {
    std::fprintf(stderr, "Codec error %lld\n", static_cast<long long>(size));
    return 1;
  }

  FILE* f = std::fopen(out_path, "wb");
  if (!f) {
    std::fprintf(stderr, "Opening output file: %s\n", out_path);
    return 1;
  }
  const size_t wrote = std::fwrite(out.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  if (wrote != static_cast<size_t>(size)) return 1;
  if (want_report) {
    report("encode", now_s() - t0, static_cast<int64_t>(in.size()), size);
  }
  return 0;
}
