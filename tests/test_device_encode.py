"""Device-assisted encode: TPU match candidates + native host coding."""

import numpy as np
import pytest

from lzma_sdk_zliblike_tpu import native
from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from tests.corpus import big_mixed, random_bytes


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_roundtrip_and_ratio():
    from lzma_sdk_zliblike_tpu.parallel.device_encode import \
        encode_lzma2_device
    data = big_mixed(1 << 20) + b"Z" * 5000 + random_bytes(1 << 16, seed=2)
    host, _ = native.lzma2_encode(data, 1 << 14, 1 << 14, True)
    dev, prop = encode_lzma2_device(data, dict_size=1 << 14,
                                    chunk_size=1 << 14, lanes=8)
    assert framing.decode(dev, prop) == data
    # candidate quality: within 0.5% of the host hash-chain finder
    # (measured on this corpus: the 24+12-candidate sorted-bucket default
    # is +0.21%; 12+6 was +0.80%, 16+8 +0.59%)
    assert len(dev) <= len(host) * 1.005, (len(dev), len(host))


def test_empty_and_tiny():
    from lzma_sdk_zliblike_tpu.parallel.device_encode import \
        encode_lzma2_device
    for data in (b"", b"a", b"ab" * 3):
        dev, prop = encode_lzma2_device(data, dict_size=1 << 12,
                                        chunk_size=1 << 12, lanes=4)
        assert framing.decode(dev, prop) == data


def test_reference_decodes_device_stream(oracle):
    """The reference SDK must accept device-encoded LZMA2 output."""
    import subprocess
    import tempfile
    import os
    from lzma_sdk_zliblike_tpu.parallel.device_encode import \
        encode_lzma2_device
    data = big_mixed(300_000, seed=4)
    dev, prop = encode_lzma2_device(data, dict_size=1 << 13,
                                    chunk_size=1 << 13, lanes=8)
    d = tempfile.mkdtemp()
    inp = os.path.join(d, "in.lzma2")
    out = os.path.join(d, "out.bin")
    with open(inp, "wb") as f:
        f.write(bytes([prop]) + dev)
    r = subprocess.run([oracle["oracle_driver"], "lzma2d", inp, out],
                       capture_output=True)
    assert r.returncode == 0, r.stderr[-300:]
    assert open(out, "rb").read() == data


def test_device_candidates_feed_optimal_parse(oracle):
    """Device candidates can drive the effort-10 optimal parse.

    (The LzFindMt role, LzFindMt.c:311-429.  Measured round 3: removing
    the persistent BT4 finder buys only ~7% native-side speed — the DP
    parse dominates — and bucket candidates cost ~+2% size at effort 10,
    so the BT4 path remains the size-parity default; this test pins the
    capability and its validity, not a perf claim.)
    """
    import os
    import subprocess
    import tempfile
    from lzma_sdk_zliblike_tpu.parallel.device_encode import \
        encode_lzma2_device
    data = big_mixed(300_000, seed=11)
    dev, prop = encode_lzma2_device(data, dict_size=1 << 14,
                                    chunk_size=1 << 14, lanes=8, effort=10)
    assert framing.decode(dev, prop) == data
    d = tempfile.mkdtemp()
    inp = os.path.join(d, "in.lzma2")
    out = os.path.join(d, "out.bin")
    with open(inp, "wb") as f:
        f.write(bytes([prop]) + dev)
    r = subprocess.run([oracle["oracle_driver"], "lzma2d", inp, out],
                       capture_output=True)
    assert r.returncode == 0, r.stderr[-300:]
    assert open(out, "rb").read() == data
