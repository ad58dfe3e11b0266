"""Profile the v8 kernel on the big-dict bench shapes (reuses jax cache).

Splits end-to-end time into: batch assembly, dispatch+compute (status
materialization), and D2H of the packed output.  Reports us/iter and
bytes/iter from the kernel's own iteration counters.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))

import numpy as np  # noqa: E402

from tests.corpus import big_mixed  # noqa: E402
from lzma_sdk_zliblike_tpu.models.lzma2 import framing  # noqa: E402
from lzma_sdk_zliblike_tpu.ops import pallas_decode as P  # noqa: E402
from tools.dev_bigdict_bench import oracle_lzma2_stream  # noqa: E402


def main():
    mb = int(os.environ.get("LZT_MB", "32"))
    block = int(os.environ.get("LZT_BLOCK", str(1 << 20)))
    data = big_mixed(mb << 20)
    stream = oracle_lzma2_stream(data, block, f"{mb}m_{block // 1024}k")
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    lanes = int(os.environ.get("LZT_LANES", str(len(groups))))
    groups = groups[:lanes]
    n_chunks = max(len(g) for g in groups)
    max_pack = max(sum(c.pack_size for c in g) for g in groups)
    pack_cap = -(-max_pack // 4096) * 4096
    src = np.zeros((lanes, pack_cap), np.uint8)
    pe = np.zeros((lanes, n_chunks), np.int32)
    ue = np.zeros((lanes, n_chunks), np.int32)
    fl = np.zeros((lanes, n_chunks), np.int32)
    act = np.ones(lanes, np.int32)
    for li, g in enumerate(groups):
        ap = au = 0
        for j, c in enumerate(g):
            src[li, ap:ap + c.pack_size] = np.frombuffer(
                stream, np.uint8, c.pack_size, c.data_off)
            ap += c.pack_size
            au += c.unpack_size
            pe[li, j] = ap
            ue[li, j] = au
            fl[li, j] = 1 | (2 if (j > 0 and c.mode >= framing.MODE_STATE)
                             else 0)
        pe[li, len(g):] = ap
        ue[li, len(g):] = au
    total_unpack = int(ue[:, -1].sum())

    def run():
        t0 = time.time()
        handle = P.submit_groups(src, pe, ue, fl, act, dic_cap=block)
        t1 = time.time()
        packed, status = handle
        status_np = np.asarray(status)
        t2 = time.time()
        packed_np = np.asarray(packed)
        t3 = time.time()
        return t1 - t0, t2 - t1, t3 - t2, status_np, packed_np

    # warmup/compile
    *_, st, _pk = run()
    assert (st[0, :, 0] != 0).all(), st[0, :, 0]
    iters = st[2, :, 0]
    print(f"lanes {lanes}  n_chunks {n_chunks}  pack_cap {pack_cap}  "
          f"iters max {iters.max()}  mean {iters.mean():.0f}", flush=True)
    for _ in range(int(os.environ.get("LZT_REPS", "3"))):
        d_sub, d_cmp, d_d2h, st, _pk = run()
        it = int(st[2, :, 0].max())
        print(f"submit {d_sub*1e3:6.1f} ms  compute {d_cmp*1e3:7.1f} ms  "
              f"d2h {d_d2h*1e3:6.1f} ms  us/iter {d_cmp*1e6/it:6.2f}  "
              f"agg {total_unpack/(d_sub+d_cmp+d_d2h)/1e6:6.2f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
