"""Microbenchmark for the Pallas decode kernel on the real chip.

Usage: python tools/pallas_bench.py [S] [chunk_kb] [mb]
Encodes a mixed corpus into LZMA2 chunks, decodes batches on the TPU,
reports MB/s/chip (excluding encode, including H2D/D2H).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "build", "jax_cache"))

import numpy as np


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk = (int(sys.argv[2]) if len(sys.argv) > 2 else 16) << 10
    mb = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P

    data = big_mixed(mb << 20)
    stream, prop = framing.encode(data, dict_size=chunk, chunk_size=chunk)
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    singles = [g[0] for g in groups if len(g) == 1 and g[0].is_lzma]
    print(f"corpus {len(data)>>20} MB -> {len(groups)} groups "
          f"({len(singles)} single-chunk lzma)", file=sys.stderr)

    pack_cap = max(c.pack_size for c in singles)
    batches = []
    for i in range(0, len(singles), S):
        grp = singles[i:i + S]
        src = np.zeros((S, pack_cap), np.uint8)
        pl_ = np.zeros(S, np.int32)
        ul = np.zeros(S, np.int32)
        act = np.zeros(S, np.int32)
        for j, c in enumerate(grp):
            src[j, :c.pack_size] = np.frombuffer(
                stream, np.uint8, c.pack_size, c.data_off)
            pl_[j] = c.pack_size
            ul[j] = c.unpack_size
            act[j] = 1
        batches.append((src, pl_, ul, act, grp))

    t0 = time.time()
    out, ok, cons = P.decode_chunks(batches[0][0], batches[0][1],
                                    batches[0][2], batches[0][3],
                                    dic_cap=chunk)
    print(f"compile+first call: {time.time()-t0:.1f}s", file=sys.stderr)
    assert ok[batches[0][3] != 0].all(), "decode failed"
    for j, c in enumerate(batches[0][4]):
        exp = data[c.unpack_off:c.unpack_off + c.unpack_size]
        got = out[j, :c.unpack_size].tobytes()
        assert got == exp, f"lane {j} mismatch"
    print("bit-exact on batch 0", file=sys.stderr)

    t0 = time.time()
    total = 0
    handles = [P.submit_chunks(src, pl_, ul, act, dic_cap=chunk)
               for src, pl_, ul, act, grp in batches]
    for (src, pl_, ul, act, grp), h in zip(batches, handles):
        out, ok, cons = P.finalize_chunks(h, dic_cap=chunk)
        assert ok[act != 0].all()
        total += int(ul.sum())
    dt = time.time() - t0
    print(f"S={S} chunk={chunk>>10}KB: {total/dt/1e6:.2f} MB/s "
          f"({dt:.2f}s, {len(batches)} calls, {total/(1<<20):.1f} MB)")


if __name__ == "__main__":
    main()
