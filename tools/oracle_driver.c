/* oracle_driver.c — TEST-ONLY golden-oracle CLI linking the reference LZMA SDK
 * (/root/reference, built with -D_7ZIP_ST). Used by the test suite to produce
 * and verify golden fixtures. This file is NOT part of the framework runtime.
 *
 * Commands:
 *   lzma2e  <dictSize> <in> <out> [level]   raw LZMA2 encode (default level 9);
 *                                   prints dict prop byte to stderr;
 *                                   writes 1-byte dictprop header + stream
 *   lzma2d  <in> <out>              raw LZMA2 decode (1-byte dictprop header)
 *   xze     <in> <out>              .xz encode (LZMA2, CRC32 check)
 *   lzma86e <in> <out>              .lzma86 encode (auto filter)
 *   lzma86d <in> <out>              .lzma86 decode
 *   lzmae   <lc> <lp> <pb> <dict> <in> <out>   raw .lzma encode w/ explicit props
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "Types.h"
#include "Alloc.h"
#include "Lzma2Enc.h"
#include "Lzma2Dec.h"
#include "LzmaEnc.h"
#include "XzEnc.h"
#include "Lzma86.h"
#include "7zFile.h"
#include "7zCrc.h"
#include "Bra.h"
#include "Delta.h"
#include "XzCrc64.h"

static void *OAlloc(void *p, size_t size) { (void)p; return malloc(size); }
static void OFree(void *p, void *addr) { (void)p; free(addr); }
static ISzAlloc g_alloc = { OAlloc, OFree };

static Byte *read_file(const char *path, size_t *n) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  fseek(f, 0, SEEK_END); long sz = ftell(f); fseek(f, 0, SEEK_SET);
  Byte *buf = malloc(sz ? sz : 1);
  if (fread(buf, 1, sz, f) != (size_t)sz) { perror("read"); exit(2); }
  fclose(f); *n = sz; return buf;
}
static void write_file(const char *path, const Byte *buf, size_t n) {
  FILE *f = fopen(path, "wb");
  if (!f) { perror(path); exit(2); }
  fwrite(buf, 1, n, f); fclose(f);
}

/* in-memory seq streams */
typedef struct { ISeqInStream s; const Byte *buf; size_t pos, size; } MemIn;
static SRes MemIn_Read(void *pp, void *data, size_t *size) {
  MemIn *p = (MemIn *)pp;
  size_t rem = p->size - p->pos;
  if (*size > rem) *size = rem;
  memcpy(data, p->buf + p->pos, *size);
  p->pos += *size;
  return SZ_OK;
}
typedef struct { ISeqOutStream s; Byte *buf; size_t pos, cap; } MemOut;
static size_t MemOut_Write(void *pp, const void *data, size_t size) {
  MemOut *p = (MemOut *)pp;
  if (p->pos + size > p->cap) {
    while (p->pos + size > p->cap) p->cap *= 2;
    p->buf = realloc(p->buf, p->cap);
  }
  memcpy(p->buf + p->pos, data, size);
  p->pos += size;
  return size;
}

static int cmd_lzma2e(UInt32 dictSize, const char *inp, const char *outp,
                      int level) {
  size_t n; Byte *data = read_file(inp, &n);
  CLzma2EncHandle h = Lzma2Enc_Create(&g_alloc, &g_alloc);
  CLzma2EncProps props; Lzma2EncProps_Init(&props);
  props.lzmaProps.dictSize = dictSize;
  props.lzmaProps.level = level;
  if (Lzma2Enc_SetProps(h, &props) != SZ_OK) return 3;
  Byte dictProp = Lzma2Enc_WriteProperties(h);
  MemIn mi = { { MemIn_Read }, data, 0, n };
  MemOut mo = { { MemOut_Write }, malloc(1 << 16), 0, 1 << 16 };
  MemOut_Write(&mo, &dictProp, 1);
  SRes r = Lzma2Enc_Encode(h, &mo.s, &mi.s, NULL);
  if (r != SZ_OK) { fprintf(stderr, "enc fail %d\n", r); return 3; }
  write_file(outp, mo.buf, mo.pos);
  fprintf(stderr, "dictprop=%d\n", dictProp);
  Lzma2Enc_Destroy(h);
  return 0;
}

static int cmd_lzma2d(const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  if (n < 1) return 3;
  Byte prop = data[0];
  /* step API (the one-call Lzma2Decode skips Lzma2Dec_Init in this SDK) */
  SizeT destLen = 256u << 20, srcLen = n - 1;
  Byte *dest = malloc(destLen);
  ELzmaStatus status;
  CLzma2Dec dec;
  Lzma2Dec_Construct(&dec);
  if (Lzma2Dec_AllocateProbs(&dec, prop, &g_alloc) != SZ_OK) return 3;
  Lzma2Dec_Init(&dec);
  dec.decoder.dic = dest;
  dec.decoder.dicBufSize = destLen;
  SRes r = Lzma2Dec_DecodeToDic(&dec, destLen, data + 1, &srcLen,
                                LZMA_FINISH_END, &status);
  destLen = dec.decoder.dicPos;
  if (r != SZ_OK || (status != LZMA_STATUS_FINISHED_WITH_MARK)) {
    fprintf(stderr, "dec fail %d status=%d\n", r, status); if (r) return 3;
  }
  write_file(outp, dest, destLen);
  return 0;
}

static int cmd_xze(const char *inp, const char *outp) {
  CrcGenerateTable();
  size_t n; Byte *data = read_file(inp, &n);
  CLzma2EncProps props; Lzma2EncProps_Init(&props);
  props.lzmaProps.level = 9;
  MemIn mi = { { MemIn_Read }, data, 0, n };
  MemOut mo = { { MemOut_Write }, malloc(1 << 16), 0, 1 << 16 };
  SRes r = Xz_Encode(&mo.s, &mi.s, &props, False, NULL);
  if (r != SZ_OK) { fprintf(stderr, "xz enc fail %d\n", r); return 3; }
  write_file(outp, mo.buf, mo.pos);
  return 0;
}

static int cmd_lzma86e(const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  size_t destLen = n + n / 3 + 4096 + LZMA86_HEADER_SIZE;
  Byte *dest = malloc(destLen);
  int r = Lzma86_Encode(dest, &destLen, data, n, 9, 1 << 24, SZ_FILTER_AUTO);
  if (r != SZ_OK) { fprintf(stderr, "86 enc fail %d\n", r); return 3; }
  write_file(outp, dest, destLen);
  return 0;
}

static int cmd_lzma86d(const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  UInt64 outSize64;
  if (Lzma86_GetUnpackSize(data, n, &outSize64) != SZ_OK) return 3;
  SizeT destLen = (SizeT)outSize64, srcLen = n;
  Byte *dest = malloc(destLen ? destLen : 1);
  int r = Lzma86_Decode(dest, &destLen, data, &srcLen);
  if (r != SZ_OK) { fprintf(stderr, "86 dec fail %d\n", r); return 3; }
  write_file(outp, dest, destLen);
  return 0;
}

static int cmd_lzmae(int lc, int lp, int pb, UInt32 dict,
                     const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  CLzmaEncProps props; LzmaEncProps_Init(&props);
  props.level = 9; props.lc = lc; props.lp = lp; props.pb = pb; props.dictSize = dict;
  size_t destLen = n + n / 3 + 4096;
  Byte *dest = malloc(destLen + 13);
  Byte header[5]; size_t headerSize = 5;
  SizeT outLen = destLen;
  int r = LzmaEncode(dest + 13, &outLen, data, n, &props, header, &headerSize,
                     0 /* writeEndMark */, NULL, &g_alloc, &g_alloc);
  if (r != SZ_OK) { fprintf(stderr, "enc fail %d\n", r); return 3; }
  memcpy(dest, header, 5);
  for (int i = 0; i < 8; i++) dest[5 + i] = (Byte)((UInt64)n >> (8 * i));
  write_file(outp, dest, outLen + 13);
  return 0;
}

static int cmd_filter(const char *name, int encoding, UInt32 ip,
                      const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  if (!strcmp(name, "x86")) {
    UInt32 state; x86_Convert_Init(state);
    SizeT done = x86_Convert(data, n, ip, &state, encoding);
    fprintf(stderr, "state=%u done=%zu\n", state, (size_t)done);
  } else if (!strcmp(name, "arm")) {
    ARM_Convert(data, n, ip, encoding);
  } else if (!strcmp(name, "armt")) {
    ARMT_Convert(data, n, ip, encoding);
  } else if (!strcmp(name, "ppc")) {
    PPC_Convert(data, n, ip, encoding);
  } else if (!strcmp(name, "sparc")) {
    SPARC_Convert(data, n, ip, encoding);
  } else if (!strcmp(name, "ia64")) {
    IA64_Convert(data, n, ip, encoding);
  } else if (!strncmp(name, "delta", 5)) {
    unsigned dist = (unsigned)atoi(name + 5);
    Byte st[DELTA_STATE_SIZE];
    Delta_Init(st);
    if (encoding) Delta_Encode(st, dist, data, n);
    else Delta_Decode(st, dist, data, n);
  } else { fprintf(stderr, "unknown filter\n"); return 1; }
  write_file(outp, data, n);
  return 0;
}

static int cmd_bcj2d(const char *mainp, const char *callp, const char *jumpp,
                     const char *rcp, const char *outp, size_t outSize) {
  size_t n0, n1, n2, n3;
  Byte *b0 = read_file(mainp, &n0);
  Byte *b1 = read_file(callp, &n1);
  Byte *b2 = read_file(jumpp, &n2);
  Byte *b3 = read_file(rcp, &n3);
  Byte *out = malloc(outSize ? outSize : 1);
  int r = Bcj2_Decode(b0, n0, b1, n1, b2, n2, b3, n3, out, outSize);
  if (r != 0) { fprintf(stderr, "bcj2 dec fail %d\n", r); return 3; }
  write_file(outp, out, outSize);
  return 0;
}

static int cmd_crc(const char *which, const char *inp) {
  size_t n; Byte *data = read_file(inp, &n);
  if (!strcmp(which, "crc32")) {
    CrcGenerateTable();
    printf("%08x\n", CrcCalc(data, n));
  } else {
    Crc64GenerateTable();
    printf("%016llx\n", (unsigned long long)Crc64Calc(data, n));
  }
  return 0;
}

int cmd_ppmd7e(int order, UInt32 mem, const char *inp, const char *outp);
int cmd_ppmd7d(int order, UInt32 mem, size_t outSize, const char *inp, const char *outp);

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: see header\n"); return 1; }
  if (!strcmp(argv[1], "lzma2e") && (argc == 5 || argc == 6))
    return cmd_lzma2e((UInt32)strtoul(argv[2], 0, 0), argv[3], argv[4],
                      argc == 6 ? atoi(argv[5]) : 9);
  if (!strcmp(argv[1], "lzma2d") && argc == 4) return cmd_lzma2d(argv[2], argv[3]);
  if (!strcmp(argv[1], "xze") && argc == 4) return cmd_xze(argv[2], argv[3]);
  if (!strcmp(argv[1], "lzma86e") && argc == 4) return cmd_lzma86e(argv[2], argv[3]);
  if (!strcmp(argv[1], "lzma86d") && argc == 4) return cmd_lzma86d(argv[2], argv[3]);
  if (!strcmp(argv[1], "filter") && argc == 7)
    return cmd_filter(argv[2], atoi(argv[3]), (UInt32)strtoul(argv[4], 0, 0),
                      argv[5], argv[6]);
  if (!strcmp(argv[1], "crc") && argc == 4)
    return cmd_crc(argv[2], argv[3]);
  if (!strcmp(argv[1], "ppmd7e") && argc == 6)
    return cmd_ppmd7e(atoi(argv[2]), (UInt32)strtoul(argv[3], 0, 0), argv[4], argv[5]);
  if (!strcmp(argv[1], "ppmd7d") && argc == 7)
    return cmd_ppmd7d(atoi(argv[2]), (UInt32)strtoul(argv[3], 0, 0),
                      (size_t)strtoul(argv[4], 0, 0), argv[5], argv[6]);
  if (!strcmp(argv[1], "bcj2d") && argc == 8)
    return cmd_bcj2d(argv[2], argv[3], argv[4], argv[5], argv[6],
                     (size_t)strtoul(argv[7], 0, 0));
  if (!strcmp(argv[1], "lzmae") && argc == 8)
    return cmd_lzmae(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                     (UInt32)strtoul(argv[5], 0, 0), argv[6], argv[7]);
  fprintf(stderr, "bad args\n");
  return 1;
}
/* appended: PPMd7 oracle commands */
#include "Ppmd7.h"

typedef struct { IByteIn p; const Byte *buf; size_t pos, size; } MemByteIn;
static Byte MemByteIn_Read(void *pp) {
  MemByteIn *p = (MemByteIn *)pp;
  return p->pos < p->size ? p->buf[p->pos++] : 0;
}
typedef struct { IByteOut p; MemOut *mo; } MemByteOut;
static void MemByteOut_Write(void *pp, Byte b) {
  MemByteOut *p = (MemByteOut *)pp;
  MemOut_Write(p->mo, &b, 1);
}

int cmd_ppmd7e(int order, UInt32 mem, const char *inp, const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  CPpmd7 ppmd; Ppmd7_Construct(&ppmd);
  if (!Ppmd7_Alloc(&ppmd, mem, &g_alloc)) return 3;
  Ppmd7_Init(&ppmd, order);
  CPpmd7z_RangeEnc rc; Ppmd7z_RangeEnc_Init(&rc);
  MemOut mo = { { MemOut_Write }, malloc(1 << 16), 0, 1 << 16 };
  MemByteOut bo = { { MemByteOut_Write }, &mo };
  rc.Stream = &bo.p;
  for (size_t i = 0; i < n; i++)
    Ppmd7_EncodeSymbol(&ppmd, &rc, data[i]);
  Ppmd7z_RangeEnc_FlushData(&rc);
  write_file(outp, mo.buf, mo.pos);
  return 0;
}

int cmd_ppmd7d(int order, UInt32 mem, size_t outSize, const char *inp,
               const char *outp) {
  size_t n; Byte *data = read_file(inp, &n);
  CPpmd7 ppmd; Ppmd7_Construct(&ppmd);
  if (!Ppmd7_Alloc(&ppmd, mem, &g_alloc)) return 3;
  Ppmd7_Init(&ppmd, order);
  CPpmd7z_RangeDec rc; Ppmd7z_RangeDec_CreateVTable(&rc);
  MemByteIn bi = { { MemByteIn_Read }, data, 0, n };
  rc.Stream = &bi.p;
  if (!Ppmd7z_RangeDec_Init(&rc)) return 3;
  Byte *out = malloc(outSize ? outSize : 1);
  for (size_t i = 0; i < outSize; i++) {
    int sym = Ppmd7_DecodeSymbol(&ppmd, &rc.p);
    if (sym < 0) { fprintf(stderr, "sym err %d at %zu\n", sym, i); return 3; }
    out[i] = (Byte)sym;
  }
  if (!Ppmd7z_RangeDec_IsFinishedOK(&rc)) { fprintf(stderr, "rc tail\n"); return 3; }
  write_file(outp, out, outSize);
  return 0;
}
