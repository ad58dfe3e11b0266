"""In-library counters/timers (utils/trace.py) and their wiring."""

import time

from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.utils.trace import TRACE, Tracer


def test_tracer_counters_and_timers():
    t = Tracer()
    t.add("x")
    t.add("x", 2)
    with t.timer("op"):
        time.sleep(0.01)
    snap = t.snapshot()
    assert snap["x"] == 3
    assert snap["op"]["count"] == 1
    assert snap["op"]["total_s"] >= 0.009
    t.reset()
    assert t.snapshot() == {}


def test_hybrid_records_work_split():
    from lzma_sdk_zliblike_tpu.parallel.hybrid import decode_lzma2_hybrid
    data = bytes(range(256)) * 2000
    stream, prop = framing.encode(data, dict_size=1 << 16,
                                  chunk_size=1 << 16)
    TRACE.reset()
    out = decode_lzma2_hybrid(stream, prop, device=False)
    assert out == data
    snap = TRACE.snapshot()
    assert snap.get("hybrid.host_bytes", 0) == len(data)
