"""Device range encoder (ops/pallas_encode.py) vs the native host coder.

Parity model: the native fast parse exports op streams; replaying them on
the kernel must reproduce the native chunk bodies BYTE FOR BYTE (the
device half of the find→parse→code pipeline, LzmaEnc.c:456-573 range
coder semantics).  CPU runs use interpret mode — identical trace; the
compiled path is exercised by bench.py and tools/ on the real chip.
"""

import os

import numpy as np
import pytest

from lzma_sdk_zliblike_tpu import native
from lzma_sdk_zliblike_tpu.models.lzma.spec import LzmaProps
from lzma_sdk_zliblike_tpu.models.lzma import op_replay
from lzma_sdk_zliblike_tpu.ops import pallas_encode as PE
from tests.corpus import big_mixed, x86_like, random_bytes

pytestmark = pytest.mark.skipif(not native.group_ops_available(),
                                reason="native runtime not built")

# The interpret-mode ENCODE kernel compile is pathologically slow under
# the suite's 8-virtual-CPU-device env on small hosts (measured round 4:
# >20 min for a (64,32)-page shape that compiles in ~1 min standalone;
# the 8 device runtimes' thread pools thrash 2 physical cores).  The
# compiled encode path runs ON THE REAL CHIP in tools/chip_selftest.py
# (make test-tpu: byte-identity vs the host coder) and bench.py
# (encode_device_identical), so the default suite keeps the fast
# op-replay parity spec below and gates the interpret-kernel replicas.
_kernel = pytest.mark.skipif(
    os.environ.get("LZT_ENC_KERNEL_TESTS") != "1",
    reason="interpret-mode encode kernel compile is minutes-to-hours on "
           "small hosts; compiled path covered by make test-tpu + bench "
           "(set LZT_ENC_KERNEL_TESTS=1 to run here)")

DICT = 1 << 16
SUB = 4 << 10      # small sub-chunks: several chunk boundaries per lane


def _parse(datas):
    ops, tabs, bodies = [], [], []
    for d in datas:
        o, t, b = native.lzma2_group_ops(d, DICT, sub_size=SUB)
        ops.append(o)
        tabs.append(t)
        bodies.append(b)
    return ops, tabs, bodies


def _run(datas):
    ops, tabs, ref = _parse(datas)
    # ONE padded shape for every test in this module, and a SMALL one:
    # interpret-mode compile time explodes with the padded page counts
    # (measured round 4 on a 2-core host: (64,32) pages ~1 min,
    # (128,64) >20 min, (1024,1024) >55 min), so the corpora below are
    # sized to fit (64,32) — the worst lanes are the literal-dense ones
    # at 2 op words/byte.  The compiled path at production shapes runs
    # on the real chip via tools/chip_selftest.py (make test-tpu) and
    # bench.py; this module pins kernel SEMANTICS in interpret mode.
    ops_words, meta, out_pages, nch = PE.pack_ops_batch(
        ops, tabs, op_pages_min=64, out_pages4_min=32)
    h = PE.submit_encode_groups(ops_words, meta, out_pages=out_pages,
                                interpret=True)
    bodies, ok = PE.finalize_encode(h, nch)
    return bodies, ok, ref


def test_op_replay_matches_native():
    """The executable spec: Python replay == native encode_segment."""
    data = big_mixed(60_000, seed=5)
    ops, tab, body = native.lzma2_group_ops(data, DICT, sub_size=SUB)
    bodies = op_replay.replay_group(data, ops, tab,
                                    LzmaProps(dict_size=DICT))
    assert b"".join(bodies) == body


@_kernel
def test_kernel_bodies_bit_exact():
    datas = [big_mixed(6_000 + 1_000 * s, seed=s + 1) for s in range(8)]
    bodies, ok, ref = _run(datas)
    assert ok.all(), ok
    for s in range(8):
        assert b"".join(bodies[s]) == ref[s], s


@_kernel
def test_kernel_edge_data():
    datas = [
        x86_like(3_000),                      # matched-literal heavy
        random_bytes(3_500, seed=2),          # all literals
        bytes(12_000),                        # zeros: shortrep/rep chains
        (b"abcdef" * 2000)[:12_000],          # tight reps
        big_mixed(10_000, seed=3),            # multi-chunk
    ]
    bodies, ok, ref = _run(datas)
    # pad lanes (5 -> 8) are inactive by design: check the real lanes
    assert ok[:len(datas)].all(), ok
    for s in range(len(datas)):
        assert b"".join(bodies[s]) == ref[s], s


@_kernel
def test_lane_padding_and_inactive_lanes():
    # 3 lanes pad to 8; the pad lanes must stay inert
    datas = [big_mixed(8_000, seed=s + 9) for s in range(3)]
    bodies, ok, ref = _run(datas)
    assert ok[:3].all()
    for s in range(3):
        assert b"".join(bodies[s]) == ref[s], s


@_kernel
def test_device_coded_stream_identical_to_host_mt():
    from lzma_sdk_zliblike_tpu.parallel.host_pool import (
        encode_lzma2_mt, decode_lzma2_mt)
    from lzma_sdk_zliblike_tpu.parallel.device_encode import (
        encode_lzma2_device_coded)
    # chunk 8 KB keeps the e2e path's own compiled shape small too
    # (_op_pages_cap: 34 pages; the 64 KB shape compiled for many minutes
    # in interpret mode)
    data = big_mixed(60_000, seed=13) + random_bytes(12_000, seed=1) \
        + big_mixed(30_000, seed=14)
    ref, prop_r = encode_lzma2_mt(data, dict_size=1 << 16,
                                  chunk_size=1 << 13)
    dev, prop_d = encode_lzma2_device_coded(
        data, dict_size=1 << 16, chunk_size=1 << 13, lanes=8,
        interpret=True)
    assert prop_r == prop_d
    assert dev == ref
    assert decode_lzma2_mt(dev, prop_d) == data
