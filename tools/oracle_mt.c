/* MT oracle baseline: reference Lzma2Enc with MtCoder block threads
 * (Lzma2Enc.c:302-361 + MtCoder.c:272-327) running on the pthread
 * Threads shim.  Test-only scaffolding linking /root/reference — the
 * honest multi-threaded encode bar for bench.py's encode_mbs row.
 *
 * usage: oracle_mt <dict> <threads> <level> <in> <out> [blockSize]
 * Writes [dictprop byte][lzma2 stream]; prints bytes + MB/s to stderr.
 * blockSize 0/absent = reference default (4 x dict clamped to [1M,256M],
 * Lzma2Enc.c:223-233); pass an explicit size to engage block threads on
 * inputs smaller than 4 x dict.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "Lzma2Enc.h"
#include "Alloc.h"

static void *SzAlloc(void *p, size_t size) { (void)p; return MyAlloc(size); }
static void SzFree(void *p, void *a) { (void)p; MyFree(a); }
static ISzAlloc g_Alloc = {SzAlloc, SzFree};

typedef struct {
  ISeqInStream s;
  const Byte *data;
  size_t pos, len;
} MemIn;

static SRes MemIn_Read(void *pp, void *buf, size_t *size) {
  MemIn *p = (MemIn *)pp;
  size_t n = p->len - p->pos;
  if (n > *size) n = *size;
  memcpy(buf, p->data + p->pos, n);
  p->pos += n;
  *size = n;
  return SZ_OK;
}

typedef struct {
  ISeqOutStream s;
  Byte *data;
  size_t pos, cap;
} MemOut;

static size_t MemOut_Write(void *pp, const void *buf, size_t size) {
  MemOut *p = (MemOut *)pp;
  if (p->pos + size > p->cap) return 0;
  memcpy(p->data + p->pos, buf, size);
  p->pos += size;
  return size;
}

int main(int argc, char **argv) {
  if (argc != 6 && argc != 7) {
    fprintf(stderr,
            "usage: %s <dict> <threads> <level> <in> <out> [blockSize]\n",
            argv[0]);
    return 2;
  }
  UInt32 dict = (UInt32)strtoul(argv[1], NULL, 10);
  int threads = atoi(argv[2]);
  int level = atoi(argv[3]);
  FILE *f = fopen(argv[4], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  Byte *buf = (Byte *)malloc(n);
  if (fread(buf, 1, n, f) != (size_t)n) return 2;
  fclose(f);

  CLzma2EncHandle h = Lzma2Enc_Create(&g_Alloc, &g_Alloc);
  CLzma2EncProps props;
  Lzma2EncProps_Init(&props);
  props.lzmaProps.level = level;
  props.lzmaProps.dictSize = dict;
  props.numTotalThreads = threads;
  if (argc == 7) props.blockSize = (size_t)strtoul(argv[6], NULL, 10);
  Lzma2EncProps_Normalize(&props);
  SRes r = Lzma2Enc_SetProps(h, &props);
  if (r != SZ_OK) {
    fprintf(stderr, "SetProps: %d\n", r);
    return 1;
  }
  Byte prop = Lzma2Enc_WriteProperties(h);

  MemIn in = {{MemIn_Read}, buf, 0, (size_t)n};
  MemOut out = {{MemOut_Write}, NULL, 0, (size_t)n + (n >> 1) + 65536};
  out.data = (Byte *)malloc(out.cap);

  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  r = Lzma2Enc_Encode(h, &out.s, &in.s, NULL);
  clock_gettime(CLOCK_MONOTONIC, &t1);
  if (r != SZ_OK) {
    fprintf(stderr, "Encode: %d\n", r);
    return 1;
  }
  double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) / 1e9;

  FILE *o = fopen(argv[5], "wb");
  fputc(prop, o);
  fwrite(out.data, 1, out.pos, o);
  fclose(o);
  fprintf(stderr, "out=%zu %.3f s %.2f MB/s threads=%d level=%d\n",
          out.pos, dt, n / dt / 1e6, threads, level);
  Lzma2Enc_Destroy(h);
  return 0;
}
