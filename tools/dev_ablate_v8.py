"""Ablation timing of the v8 kernel on the realistic 1MB-group bench shape.

Runs the kernel with LZT_ABLATE phase gates and a fixed iteration count so
every variant does identical trip counts (decode results are garbage for
ablated variants — this measures per-iteration cost only).  All variants
run in ONE process (the ablate spec is a jit-static arg), so the ~3min
per-process device init is paid once.

Usage: LZT_LANES=32 LZT_ITERS=20000 python tools/dev_ablate_v8.py [variants]
Default variants: full bits lit copy stage events
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    lane_list = [int(x) for x in
                 os.environ.get("LZT_LANES", "32").split(",")]
    iters = int(os.environ.get("LZT_ITERS", "20000"))
    variants = sys.argv[1:] or ["full", "bits", "lit", "copy", "stage",
                                "copystage", "events"]
    block = 1 << 20

    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P
    from tools.dev_bigdict_bench import oracle_lzma2_stream

    data = big_mixed(32 << 20)
    stream = oracle_lzma2_stream(data, block, "32m_1024k")
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)

    os.environ["LZT_ABLATE_I_KNOW_RESULTS_ARE_WRONG"] = "1"
    os.environ["LZT_ABLATE_ITERS"] = str(iters)
    for lanes in lane_list:
        # single-chunk tables (first chunk of each group), lanes cycle groups
        src = np.zeros((lanes, 1 << 16), np.uint8)
        pe = np.zeros((lanes, 1), np.int32)
        ue = np.zeros((lanes, 1), np.int32)
        fl = np.ones((lanes, 1), np.int32)
        act = np.ones(lanes, np.int32)
        for li in range(lanes):
            c = groups[li % len(groups)][0]
            nb = min(c.pack_size, 1 << 16)
            src[li, :nb] = np.frombuffer(stream, np.uint8, nb, c.data_off)
            pe[li, 0] = nb
            ue[li, 0] = c.unpack_size

        for v in variants:
            # '+'-joined variants ablate several phases at once
            os.environ["LZT_ABLATE"] = (
                "noerr" if v == "full"
                else "noerr," + v.replace("+", ","))
            h = P.submit_groups(src, pe, ue, fl, act, dic_cap=block)
            np.asarray(h[1])  # compile + first exec
            best = 1e9
            for _ in range(3):
                t = time.time()
                h = P.submit_groups(src, pe, ue, fl, act, dic_cap=block)
                st = np.asarray(h[1])
                best = min(best, time.time() - t)
            it = int(st[2, 0, 0])
            print(f"S={lanes:<4d} {v:10s} iters={it}  "
                  f"{best*1e6/max(it, 1):6.2f} us/iter  "
                  f"({best*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
