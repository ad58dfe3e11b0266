// Profile-guided-optimization training workload for liblzt_native.
//
// Runs the hot paths (LZMA2 encode at fast and optimal effort, decode,
// raw LZMA, CRCs) on a few MB of synthetic mixed data shaped like the
// bench corpus (text-ish words, structured binary records, low-entropy
// runs, incompressible tail) so the branch/value profiles the compiler
// collects match production behavior.  Built and run by native/Makefile
// between the -fprofile-generate and -fprofile-use passes; never ships.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int lzt_lzma2_encode(const unsigned char* src, size_t n, unsigned char* dst,
                     size_t* dst_len, unsigned int dict_size,
                     unsigned int chunk_size, int parallel, int lc, int lp,
                     int pb, int effort, int* prop_out);
int lzt_lzma2_decode(const unsigned char* src, size_t n, unsigned char* dst,
                     size_t* dst_len, int prop);
uint32_t lzt_crc32(const unsigned char* p, size_t n, uint32_t prev);
uint64_t lzt_crc64(const unsigned char* p, size_t n, uint64_t prev);
}

static uint64_t s = 0x9E3779B97F4A7C15ull;
static uint32_t rnd() {
  s ^= s << 13; s ^= s >> 7; s ^= s << 17;
  return (uint32_t)(s >> 32);
}

static std::vector<unsigned char> make_corpus(size_t n) {
  static const char* words[] = {"the", "quick", "brown", "fox", "jumps",
      "over", "lazy", "dog", "compression", "dictionary", "entropy",
      "match", "finder", "range", "coder", "stream", "block", "probability"};
  std::vector<unsigned char> v;
  v.reserve(n);
  while (v.size() < n) {
    const uint32_t mode = rnd() % 10;
    if (mode < 5) {                       // text-ish
      for (int w = 0; w < 64 && v.size() < n; w++) {
        const char* word = words[rnd() % 18];
        v.insert(v.end(), word, word + strlen(word));
        v.push_back(rnd() % 16 ? ' ' : '\n');
      }
    } else if (mode < 7) {                // structured binary records
      for (int r = 0; r < 32 && v.size() + 16 <= n; r++) {
        uint32_t rec[4] = {(uint32_t)v.size(), rnd() & 0xFFFF, 0x11223344u,
                           rnd() % 7};
        v.insert(v.end(), (unsigned char*)rec, (unsigned char*)rec + 16);
      }
    } else if (mode < 9) {                // low-entropy run
      const unsigned char b = (unsigned char)(rnd() & 3);
      for (int k = 0; k < 512 && v.size() < n; k++) v.push_back(b);
    } else {                              // incompressible
      for (int k = 0; k < 256 && v.size() < n; k++)
        v.push_back((unsigned char)rnd());
    }
  }
  return v;
}

int main() {
  const size_t N = 3u << 20;
  std::vector<unsigned char> data = make_corpus(N);
  std::vector<unsigned char> enc(N + (N >> 1) + 4096);
  std::vector<unsigned char> dec(N + 64);
  int bad = 0;
  for (int effort : {9, 10}) {
    size_t en = enc.size();
    int prop = 0;
    int rc = lzt_lzma2_encode(data.data(), data.size(), enc.data(), &en,
                              1u << 20, 1u << 20, 0, 3, 0, 2, effort, &prop);
    if (rc != 0) { fprintf(stderr, "pgo: enc rc=%d\n", rc); return 1; }
    size_t dn = dec.size();
    rc = lzt_lzma2_decode(enc.data(), en, dec.data(), &dn, prop);
    if (rc != 0 || dn != data.size() ||
        memcmp(dec.data(), data.data(), dn) != 0) {
      fprintf(stderr, "pgo: dec rc=%d n=%zu\n", rc, dn);
      return 1;
    }
    // decode twice more: decode-heavy profile weight matches production
    for (int r = 0; r < 2; r++) {
      dn = dec.size();
      bad |= lzt_lzma2_decode(enc.data(), en, dec.data(), &dn, prop);
    }
  }
  bad |= (int)(lzt_crc32(data.data(), data.size(), 0) == 0);
  bad |= (int)(lzt_crc64(data.data(), data.size(), 0) == 0);
  if (bad) { fprintf(stderr, "pgo: unexpected results\n"); return 1; }
  return 0;
}
