"""Hybrid host+device decode: ordering, adaptivity, fallback routing."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lzma_sdk_zliblike_tpu.models.lzma2 import framing  # noqa: E402
from lzma_sdk_zliblike_tpu.parallel.hybrid import (  # noqa: E402
    decode_lzma2_hybrid)


def _mk_stream(n_groups=6, group=2048):
    from tests.corpus import big_mixed
    data = big_mixed(n_groups * group)
    stream, prop = framing.encode(data, dict_size=group, chunk_size=group)
    return data, stream, prop


def test_hybrid_host_only_matches_reference_decode():
    data, stream, prop = _mk_stream()
    out = decode_lzma2_hybrid(stream, prop, device=False)
    assert out == data


def test_hybrid_host_only_single_thread_order():
    data, stream, prop = _mk_stream(n_groups=9)
    out = decode_lzma2_hybrid(stream, prop, device=False, threads=1)
    assert out == data


def test_hybrid_corrupt_group_fails_alone():
    from lzma_sdk_zliblike_tpu.utils.errors import DataError
    data, stream, prop = _mk_stream()
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    bad = bytearray(stream)
    bad[groups[2][0].data_off + 9] ^= 0xFF
    with pytest.raises(DataError):
        decode_lzma2_hybrid(bytes(bad), prop, device=False)


@pytest.mark.slow
def test_hybrid_with_interpret_device():
    """Device feeder + host workers together (interpret-mode kernel)."""
    code = r"""
import os, sys
sys.path.insert(0, %(repo)r)
os.environ["LZT_PALLAS_INTERPRET"] = "1"
from tests.test_hybrid import _mk_stream
from lzma_sdk_zliblike_tpu.parallel.hybrid import decode_lzma2_hybrid
from lzma_sdk_zliblike_tpu.parallel.scheduler import BatchShape
data, stream, prop = _mk_stream(n_groups=6, group=512)
shape = BatchShape(n_lanes=2, pack_cap=4096, dic_cap=512)
out = decode_lzma2_hybrid(stream, prop, shape=shape, threads=1)
assert out == data
print("HYBRID_DEVICE_OK", flush=True)
""" % {"repo": REPO}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert "HYBRID_DEVICE_OK" in r.stdout, r.stderr[-2000:]


def test_hybrid_progress_reported_in_order():
    data, stream, prop = _mk_stream(n_groups=8)
    seen = []
    out = decode_lzma2_hybrid(stream, prop, device=False,
                              progress=lambda i, o: seen.append((i, o)))
    assert out == data
    assert len(seen) == 8
    # monotone in both coordinates; final totals match the stream/output
    assert all(a < b for a, b in zip(seen, seen[1:]))
    assert seen[-1][1] == len(data)


def test_hybrid_abort_poisons_all_engines():
    """ICompressProgress abort (Types.h:220-225): returning False from
    the callback mid-decode unwinds promptly with ProgressAborted —
    host workers stop at their next group boundary and the feeder
    abandons in-flight device work (MtCoder_SetError poisoning,
    MtCoder.c:101-107)."""
    import time
    from lzma_sdk_zliblike_tpu.utils.errors import ProgressAborted
    data, stream, prop = _mk_stream(n_groups=32, group=4096)
    calls = []

    def cancel_after_3(i, o):
        calls.append((i, o))
        return len(calls) < 3

    t0 = time.monotonic()
    with pytest.raises(ProgressAborted):
        decode_lzma2_hybrid(stream, prop, device=False, threads=2,
                            progress=cancel_after_3)
    assert time.monotonic() - t0 < 30
    # poisoned promptly: workers stop at the next boundary, so at most
    # one straggler claim per worker thread lands after the abort
    assert len(calls) <= 3 + 2


def test_api_hybrid_progress_routes_to_hybrid_engine(monkeypatch):
    import lzma_sdk_zliblike_tpu as lzt
    monkeypatch.setenv("LZT_PALLAS_INTERPRET", "1")
    data, stream, prop = _mk_stream(n_groups=4)
    seen = []
    out = lzt.lzma2_uncompress(stream, prop, engine="hybrid",
                               progress=lambda i, o: seen.append(o))
    assert out == data and seen and seen[-1] == len(data)
