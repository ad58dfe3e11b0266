# Build helpers: golden-oracle binaries (test-only, link /root/reference)
# and the native C++ runtime library.

REF := /root/reference
BUILD := build
NATIVE := native
CFLAGS := -O2 -D_7ZIP_ST -DTRUE=1 -DFALSE=0
CXXFLAGS := -O2 -std=c++17 -fPIC -Wall

ORACLE_BINS := $(BUILD)/oracle_lzma $(BUILD)/oracle_driver $(BUILD)/oracle_7z \
  $(BUILD)/oracle_fork $(BUILD)/oracle_mt

.PHONY: all oracle native clean test

all: oracle native

oracle: $(ORACLE_BINS)

$(BUILD)/oracle_shims.c:
	@mkdir -p $(BUILD)
	@printf '/* Linux link shims for the Win32-only fork file APIs (test-only) */\n#include <stddef.h>\ntypedef struct CSzFile CSzFile;\ntypedef unsigned short WCHAR;\nint OutFile_OpenW(CSzFile *p, const WCHAR *n, int t){(void)p;(void)n;(void)t;return 1;}\nint InFile_OpenW(CSzFile *p, const WCHAR *n, int t){(void)p;(void)n;(void)t;return 1;}\n' > $@

$(BUILD)/oracle_lzma: $(BUILD)/oracle_shims.c
	gcc $(CFLAGS) -o $@ $(REF)/LzmaUtil.c $(REF)/LzmaDec.c $(REF)/LzmaEnc.c \
	  $(REF)/LzFind.c $(REF)/Alloc.c $(REF)/7zFile.c $(REF)/7zStream.c \
	  $(BUILD)/oracle_shims.c

$(BUILD)/oracle_driver: tools/oracle_driver.c
	@mkdir -p $(BUILD)
	gcc $(CFLAGS) -I$(REF) -o $@ tools/oracle_driver.c $(REF)/LzmaDec.c \
	  $(REF)/LzmaEnc.c $(REF)/LzFind.c $(REF)/Alloc.c $(REF)/Lzma2Enc.c \
	  $(REF)/Lzma2Dec.c $(REF)/XzEnc.c $(REF)/Xz.c $(REF)/7zCrc.c \
	  $(REF)/7zCrcOpt.c $(REF)/Sha256.c $(REF)/XzCrc64.c $(REF)/Lzma86Enc.c \
	  $(REF)/Lzma86Dec.c $(REF)/Bcj2.c $(REF)/Ppmd7.c $(REF)/Ppmd7Dec.c $(REF)/Ppmd7Enc.c $(REF)/Bra86.c $(REF)/Bra.c $(REF)/BraIA64.c $(REF)/Delta.c $(REF)/CpuArch.c

$(BUILD)/oracle_7z: $(BUILD)/oracle_shims.c
	gcc $(CFLAGS) -D_7ZIP_PPMD_SUPPPORT -o $@ $(REF)/7zMain.c $(REF)/7zIn.c \
	  $(REF)/7zDec.c \
	  $(REF)/7zAlloc.c $(REF)/7zBuf.c $(REF)/7zBuf2.c $(REF)/7zCrc.c \
	  $(REF)/7zCrcOpt.c $(REF)/CpuArch.c $(REF)/LzmaDec.c $(REF)/Lzma2Dec.c \
	  $(REF)/Bra.c $(REF)/Bra86.c $(REF)/BraIA64.c $(REF)/Bcj2.c \
	  $(REF)/Ppmd7.c $(REF)/Ppmd7Dec.c \
	  $(REF)/7zFile.c $(REF)/7zStream.c $(REF)/Alloc.c $(BUILD)/oracle_shims.c

FORK_OBJS := 7zIn 7zDec 7zAlloc 7zBuf 7zBuf2 7zCrc 7zCrcOpt CpuArch LzmaDec \
  Lzma2Dec Bra Bra86 BraIA64 Bcj2 7zFile 7zStream Alloc

$(BUILD)/oracle_fork: tools/fork_shims.c
	@mkdir -p $(BUILD)/fork_obj
	@for f in $(FORK_OBJS); do \
	  gcc $(CFLAGS) -w -c $(REF)/$$f.c -o $(BUILD)/fork_obj/$$f.o; done
	gcc -O2 -c tools/fork_shims.c -o $(BUILD)/fork_obj/fork_shims.o
	g++ -O2 -fpermissive -include wchar.h $(CFLAGS) -o $@ \
	  $(REF)/My_Fucking_Main.cpp $(BUILD)/fork_obj/*.o 2>/dev/null

# MT oracle: reference MtCoder/LzFindMt block-parallel encode running on
# the pthread Threads shim (no -D_7ZIP_ST) — the honest multi-threaded
# encode baseline for bench.py
$(BUILD)/oracle_mt: tools/oracle_mt.c tools/threads_pthread.c tools/threads_pthread.h
	@mkdir -p $(BUILD)
	gcc -O2 -DTRUE=1 -DFALSE=0 -I$(REF) -Itools \
	  -include tools/threads_pthread.h -o $@ tools/oracle_mt.c \
	  tools/threads_pthread.c $(REF)/Lzma2Enc.c $(REF)/LzmaEnc.c \
	  $(REF)/LzmaDec.c $(REF)/LzFind.c $(REF)/LzFindMt.c $(REF)/MtCoder.c \
	  $(REF)/Alloc.c -lpthread

native: $(NATIVE)/liblzt_native.so

$(NATIVE)/liblzt_native.so: $(wildcard $(NATIVE)/*.cc $(NATIVE)/*.h)
	$(MAKE) -C $(NATIVE)

test:
	python -m pytest tests/ -x -q

# on-chip kernel selftest: the Pallas suites' assertions COMPILED on the
# attached TPU (decode bit-exactness, encode byte-identity)
test-tpu:
	python tools/chip_selftest.py

clean:
	rm -rf $(BUILD) $(NATIVE)/liblzt_native.so $(NATIVE)/*.o
