"""CRC32 / CRC64 / SHA-256 parity with the reference kernels."""

import subprocess

from lzma_sdk_zliblike_tpu.utils import checksums as CK
from tests.corpus import random_bytes


def test_crc32_known_vector():
    assert CK.crc32(b"123456789") == 0xCBF43926


def test_crc64_known_vector():
    # standard CRC-64/XZ check value
    assert CK.crc64(b"123456789") == 0x995DC9BBDF1939FA


def test_crc_oracle_parity(oracle, tmp_path):
    data = random_bytes(30000)
    p = tmp_path / "d.bin"
    p.write_bytes(data)
    for which, fn in (("crc32", CK.crc32), ("crc64", CK.crc64)):
        r = subprocess.run([oracle["oracle_driver"], "crc", which, str(p)],
                           check=True, capture_output=True, text=True)
        assert int(r.stdout.strip(), 16) == fn(data)


def test_rolling_updates():
    data = random_bytes(10000)
    assert CK.crc32(data[5000:], CK.crc32(data[:5000])) == CK.crc32(data)
    assert CK.crc64(data[5000:], CK.crc64(data[:5000])) == CK.crc64(data)
    s = CK.Sha256Stream()
    s.update(data[:1000])
    s.update(data[1000:])
    assert s.digest() == CK.sha256(data)


def test_native_sha256_matches_hashlib():
    """Owned SHA-256 (native/lzt_sha256.cc) vs hashlib on boundary sizes."""
    import hashlib

    import pytest

    from lzma_sdk_zliblike_tpu import native
    if not native.sha256_available():
        pytest.skip("native runtime not built")
    from tests.corpus import random_bytes
    for n in (0, 1, 55, 56, 63, 64, 65, 119, 128, 1000, 1 << 16):
        data = random_bytes(n, seed=n + 1)
        assert native.sha256(data) == hashlib.sha256(data).digest(), n
    # streaming: odd-sized updates + mid-stream digest
    h = native.Sha256()
    ref = hashlib.sha256()
    data = random_bytes(100_000, seed=3)
    for off in (0, 1, 63, 64, 100, 5000, 99_000):
        chunk = data[off:off + 977]
        h.update(chunk)
        ref.update(chunk)
        assert h.digest() == ref.digest()
