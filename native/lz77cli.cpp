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
#include <vector>

extern "C" {
int64_t lz77_encode_bound(int64_t n, int la, int sb);
int64_t lz77_encode_mt(const uint8_t* in, int64_t n, int la, int sb,
                       uint8_t* out, int64_t cap, int nthreads,
                       int64_t block_size);
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
      "Usage: %s (-c|-d) -i IN -o OUT [-l LA] [-s SB] [-t THREADS] [-f]\n"
      "  -c  encode   -d  decode\n"
      "  -l  lookahead size [2,255] (default 15)\n"
      "  -s  search-buffer size [1,65535], not 1 or a power of two unless -f\n"
      "  -t  encoder threads (default: hardware)\n",
      prog);
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
  int la = 15, sb = 4095, threads = 0;
  bool force_sb = false;
  for (int i = 1; i < argc; ++i) {
    const char* a = argv[i];
    if (!std::strcmp(a, "-c")) mode = 1;
    else if (!std::strcmp(a, "-d")) mode = 2;
    else if (!std::strcmp(a, "-f")) force_sb = true;
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
    size_t got;
    while ((got = std::fread(inbuf.data(), 1, inbuf.size(), fi)) > 0) {
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
    return rc;
  }

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
  return wrote == static_cast<size_t>(size) ? 0 : 1;
}
