"""Quick A/B timer for the native ST encoders on the bench slice.

Usage: python tools/enc_ab.py [effort] [mb] [reps]
Prints min-of-reps MB/s and the compressed size for the given effort
(10 = BT4 optimal parse, 9 = fast parse) on the first `mb` MB of the
bench corpus — the same shape as bench.py's ST rows.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    effort = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu import native as lzt_native
    sl = big_mixed(mb << 20)
    best = 1e18
    size = 0
    for _ in range(reps):
        t0 = time.time()
        out, _ = lzt_native.lzma2_encode(
            sl, dict_size=1 << 24, chunk_size=1 << 21, parallel=0,
            effort=effort)
        best = min(best, time.time() - t0)
        size = len(out)
    print(f"effort={effort} {len(sl)/best/1e6:.3f} MB/s size={size}")


if __name__ == "__main__":
    main()
