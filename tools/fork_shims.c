/* fork_shims.c — Linux implementations of the Win32 wide-char file APIs the
 * fork's streaming extractor expects (OutFile_OpenW / InFile_OpenW).
 * TEST-ONLY: lets My_Fucking_Main.cpp run on Linux as a parity oracle.
 *
 * Names arriving here are pointers into the archive's UTF-16LE name table
 * (cast through wchar_t* on the way); temp opens use the hardcoded
 * "temp.dat" like the reference (7zFile.c:68).
 */
#include <stdio.h>
#include <string.h>
#include <sys/stat.h>

typedef struct { FILE *file; } CSzFile;

static void utf16_to_narrow(const unsigned short *w, char *out, size_t cap) {
  size_t i = 0;
  if (w == NULL) { out[0] = 0; return; }
  while (w[i] && i + 1 < cap) {
    unsigned short c = w[i];
    out[i] = (c < 0x80) ? (char)c : '_';
    i++;
  }
  out[i] = 0;
}

static void make_parents(const char *path) {
  char buf[2048];
  snprintf(buf, sizeof buf, "%s", path);
  for (char *p = buf + 1; *p; p++) {
    if (*p == '/') {
      *p = 0;
      mkdir(buf, 0777);
      *p = '/';
    }
  }
}

static int open_common(CSzFile *p, const void *name, int isTemp, int write) {
  char narrow[2048];
  if (isTemp) {
    snprintf(narrow, sizeof narrow, "temp.dat");
  } else {
    if (name == NULL) return 1;
    utf16_to_narrow((const unsigned short *)name, narrow, sizeof narrow);
    if (write) make_parents(narrow);
  }
  p->file = fopen(narrow, write ? "wb" : "rb");
  return p->file == NULL;
}

int OutFile_OpenW(CSzFile *p, const void *name, int isTemp) {
  return open_common(p, name, isTemp, 1);
}

int InFile_OpenW(CSzFile *p, const void *name, int isTemp) {
  return open_common(p, name, isTemp, 0);
}
