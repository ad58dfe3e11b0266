"""Measure compressed-size + speed gap vs the oracle (reference SDK).

Usage: python tools/size_gap.py [MB] [effort ...]
Encodes the mixed corpus with the native engine at each effort and with the
oracle (lzma2e, default level-5 props: BT4 + optimal parse), same dict size,
then reports sizes and single-thread MB/s.
"""

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.corpus import big_mixed  # noqa: E402
from lzma_sdk_zliblike_tpu import native  # noqa: E402


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    efforts = [int(x) for x in sys.argv[2:]] or [9, 10]
    data = big_mixed(mb << 20)
    dict_size = 1 << 24  # 16 MB, reference default (LzmaEnc.c:58)

    d = tempfile.mkdtemp()
    src = os.path.join(d, "in.bin")
    enc = os.path.join(d, "out.l2")
    with open(src, "wb") as f:
        f.write(data)
    oracle = os.path.join(REPO, "build", "oracle_driver")
    t = time.time()
    subprocess.run([oracle, "lzma2e", str(dict_size), src, enc],
                   check=True, capture_output=True)
    o_dt = time.time() - t
    o_size = os.path.getsize(enc) - 1  # strip dictprop byte
    print(f"corpus {len(data)} bytes, dict {dict_size}")
    print(f"oracle:  {o_size} bytes, {len(data)/o_dt/1e6:.2f} MB/s")

    for eff in efforts:
        t = time.time()
        stream, prop = native.lzma2_encode(
            data, dict_size=dict_size, chunk_size=1 << 21, parallel=0,
            effort=eff)
        dt = time.time() - t
        delta = (len(stream) - o_size) / o_size * 100
        print(f"eff{eff:2d}:  {len(stream)} bytes ({delta:+.2f}%), "
              f"{len(data)/dt/1e6:.2f} MB/s")


if __name__ == "__main__":
    main()
