/* Standalone fast-parse profiling driver: encodes a file with the native
 * LZMA2 encoder at a given effort and prints MB/s.  Built with -pg for
 * gprof by tools/enc_prof.sh.  Dev tool only. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#ifdef __cplusplus
extern "C"
#endif
int lzt_lzma2_encode(const unsigned char* src, size_t n, unsigned char* dst,
                     size_t* dst_len, unsigned int dict_size,
                     unsigned int chunk_size, int parallel, int lc, int lp,
                     int pb, int effort, int* prop_out);

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s file [effort] [dict]\n", argv[0]);
    return 2;
  }
  int effort = argc > 2 ? atoi(argv[2]) : 9;
  unsigned dict = argc > 3 ? (unsigned)atol(argv[3]) : (1u << 24);
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  unsigned char* buf = (unsigned char*)malloc(n);
  if (fread(buf, 1, n, f) != (size_t)n) return 2;
  fclose(f);
  unsigned char* dst = (unsigned char*)malloc(n + (n >> 1) + 4096);
  size_t out_len = n + (n >> 1) + 4096;
  int prop = 0;
  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  int rc = lzt_lzma2_encode(buf, n, dst, &out_len, dict, 1u << 21, 0,
                            3, 0, 2, effort, &prop);
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) / 1e9;
  printf("rc=%d out=%zu %.2f MB/s\n", rc, out_len, n / dt / 1e6);
  return rc;
}
