/* dec_ab.c — single-process A/B timer: reference Lzma2Dec vs our native
 * lzt_lzma2_decode (dlopen'd from native/liblzt_native.so) on the SAME
 * LZMA2 stream.  Test-only measurement scaffolding (links the reference
 * like tools/oracle_driver.c does); not part of the runtime.
 *
 * usage: dec_ab <stream.l2-with-prop-byte> <unpacked_size> [reps]
 */
#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "Lzma2Dec.h"
#include "Alloc.h"

typedef int (*lzt_dec_fn)(const unsigned char*, size_t, unsigned char*,
                          size_t*, int);

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

static void *SzAlloc2(void *p, size_t size) { (void)p; return malloc(size); }
static void SzFree2(void *p, void *a) { (void)p; free(a); }
static ISzAlloc g_alloc = { SzAlloc2, SzFree2 };

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s stream.l2 size [reps]\n", argv[0]); return 2; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != (size_t)n) return 2;
  fclose(f);
  size_t usize = strtoull(argv[2], 0, 10);
  int reps = argc > 3 ? atoi(argv[3]) : 5;

  unsigned char prop = buf[0];
  unsigned char *stream = buf + 1; size_t slen = n - 1;
  unsigned char *out_ref = malloc(usize), *out_our = malloc(usize);

  double best_ref = 1e30, best_our = 1e30;
  void *h = dlopen(argc > 4 ? argv[4] : "native/liblzt_native.so", RTLD_NOW);
  if (!h) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
  lzt_dec_fn ours = (lzt_dec_fn)dlsym(h, "lzt_lzma2_decode");

  for (int r = 0; r < reps; r++) {
    /* reference (step API: the one-call Lzma2Decode in this SDK skips
     * Lzma2Dec_Init; see tools/oracle_driver.c) */
    double t = now_s();
    SizeT dlen = usize, sl = slen;
    ELzmaStatus st;
    CLzma2Dec dec;
    Lzma2Dec_Construct(&dec);
    if (Lzma2Dec_AllocateProbs(&dec, prop, &g_alloc) != 0) return 2;
    Lzma2Dec_Init(&dec);
    dec.decoder.dic = out_ref;
    dec.decoder.dicBufSize = usize;
    int res = Lzma2Dec_DecodeToDic(&dec, usize, stream, &sl,
                                   LZMA_FINISH_END, &st);
    dlen = dec.decoder.dicPos;
    Lzma2Dec_FreeProbs(&dec, &g_alloc);
    double dt = now_s() - t;
    if (res != 0 || dlen != usize) { fprintf(stderr, "ref fail %d %zu\n", res, (size_t)dlen); return 1; }
    if (dt < best_ref) best_ref = dt;
    /* ours */
    t = now_s();
    size_t olen = usize;
    res = ours(stream, slen, out_our, &olen, prop);
    dt = now_s() - t;
    if (res != 0 || olen != usize) { fprintf(stderr, "our fail %d %zu\n", res, olen); return 1; }
    if (dt < best_our) best_our = dt;
  }
  if (memcmp(out_ref, out_our, usize)) { fprintf(stderr, "MISMATCH\n"); return 1; }
  printf("ref: %.1f MB/s  ours: %.1f MB/s  ratio %.3f\n",
         usize / best_ref / 1e6, usize / best_our / 1e6, best_our / best_ref);
  return 0;
}
