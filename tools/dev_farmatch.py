"""Dev check: kernel v8 far-match path (dist > RING*512 → HBM DMA reads).

Run with JAX_PLATFORMS=cpu for interpret mode, or on the real chip with
LZT_PALLAS_INTERPRET=0 (default on TPU).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from lzma_sdk_zliblike_tpu.models.lzma2 import framing  # noqa: E402
from lzma_sdk_zliblike_tpu.ops import pallas_decode as P  # noqa: E402


def main():
    interpret = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    block = bytes(range(256)) * 4
    data = block + b"A" * 36000 + block + b"B" * 2000 + block[:300]
    stream, prop = framing.encode(data, dict_size=1 << 16,
                                  chunk_size=1 << 20, engine="native")
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    assert len(groups) == 1 and all(c.is_lzma for c in groups[0]), groups
    g = groups[0]
    S = 2
    pe = np.zeros((S, len(g)), np.int32)
    ue = np.zeros((S, len(g)), np.int32)
    fl = np.zeros((S, len(g)), np.int32)
    bodies = bytearray()
    for j, c in enumerate(g):
        bodies += stream[c.data_off:c.data_off + c.pack_size]
        pe[:, j] = len(bodies)
        ue[:, j] = c.unpack_off + c.unpack_size
        fl[:, j] = 1 | (2 if (j > 0 and c.mode >= framing.MODE_STATE) else 0)
    src = np.zeros((S, len(bodies) + 64), np.uint8)
    src[:, :len(bodies)] = np.frombuffer(bytes(bodies), np.uint8)
    act = np.ones(S, np.int32)
    t = time.time()
    out, ok, cons = P.finalize_chunks(
        P.submit_groups(src, pe, ue, fl, act, dic_cap=len(data),
                        interpret=interpret),
        dic_cap=len(data))
    print("time", round(time.time() - t, 1), "s; ok:", ok)
    assert ok.all(), ok
    assert out[0, :len(data)].tobytes() == data
    print("v8 far-match (HBM DMA read path) OK, unpack", len(data))


if __name__ == "__main__":
    main()
