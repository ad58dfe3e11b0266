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
