"""Integrity checks: CRC32, CRC64, SHA-256.

Parity targets: the reference's reflected CRC32 poly 0xEDB88320
(``7zCrc.c:9-18``; identical to zlib, so ``binascii.crc32`` is bit-exact),
the xz CRC64 poly 0xC96C5795D7870F42 (``XzCrc64.c:6-33``), and SHA-256
(``Sha256.c``; ``hashlib`` is bit-exact).  CRC64 routes through the native
C++ slicing-by-8 kernel when the runtime library is available (the numpy
path below is the fallback, ~500x slower); batched device-side variants
live in ``ops.checksum``.
"""

from __future__ import annotations

import binascii
import hashlib

import numpy as np

CRC64_POLY = 0xC96C5795D7870F42

try:  # native slicing-by-8 kernel (7zCrcOpt.c:10-27 parity target)
    from .. import native as _native
    _native_crc64 = _native.crc64 if _native.available() else None
except Exception:  # pragma: no cover - import-time environment issues
    _native_crc64 = None

_crc64_table: np.ndarray | None = None


def _crc64_tables() -> np.ndarray:
    """8×256 slicing tables for CRC64 (slicing-by-8)."""
    global _crc64_table
    if _crc64_table is None:
        t = np.zeros((8, 256), dtype=np.uint64)
        poly = np.uint64(CRC64_POLY)
        one = np.uint64(1)
        for i in range(256):
            r = np.uint64(i)
            for _ in range(8):
                r = (r >> one) ^ (poly * (r & one))
            t[0, i] = r
        for k in range(1, 8):
            prev = t[k - 1]
            t[k] = (prev >> np.uint64(8)) ^ t[0][(prev & np.uint64(0xFF)).astype(np.int64)]
        _crc64_table = t
    return _crc64_table


def crc32(data: bytes | bytearray | memoryview, value: int = 0) -> int:
    """One-shot / rolling CRC32 (reference ``CrcCalc``/``CrcUpdate``)."""
    return binascii.crc32(data, value) & 0xFFFFFFFF


def crc64(data: bytes | bytearray | memoryview, value: int = 0) -> int:
    """One-shot / rolling CRC64 (reference ``Crc64Calc``/``Crc64Update``)."""
    if _native_crc64 is not None:
        return _native_crc64(bytes(data), value)
    t = _crc64_tables()
    crc = np.uint64(value ^ 0xFFFFFFFFFFFFFFFF)
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(buf)
    # slicing-by-8 vectorized over numpy in 8-byte strides would still be a
    # python loop; do table-per-byte in chunks via np for modest speed
    i = 0
    t0 = t[0]
    m = np.uint64(0xFF)
    e8 = np.uint64(8)
    while i < n and (n - i) >= 8:
        block = buf[i:i + 8].astype(np.uint64)
        x = crc ^ (block[0] | (block[1] << e8) | (block[2] << np.uint64(16))
                   | (block[3] << np.uint64(24)) | (block[4] << np.uint64(32))
                   | (block[5] << np.uint64(40)) | (block[6] << np.uint64(48))
                   | (block[7] << np.uint64(56)))
        crc = np.uint64(0)
        for k in range(8):
            crc ^= t[7 - k, int((x >> np.uint64(8 * k)) & m)]
        i += 8
    while i < n:
        crc = (crc >> e8) ^ t0[int((crc ^ np.uint64(buf[i])) & m)]
        i += 1
    return int(crc ^ np.uint64(0xFFFFFFFFFFFFFFFF))


def sha256(data: bytes) -> bytes:
    """SHA-256 digest (reference ``Sha256_*``).

    Uses the owned native implementation (``native/lzt_sha256.cc``, the
    ``Sha256.c:25-59`` counterpart) when the runtime is built; hashlib
    otherwise (capability fallback).
    """
    from .. import native
    if native.sha256_available():
        return native.sha256(data)
    return hashlib.sha256(data).digest()


class Sha256Stream:
    """Incremental SHA-256 matching the reference's Init/Update/Final."""

    def __init__(self):
        self._h = hashlib.sha256()

    def update(self, data) -> None:
        self._h.update(data)

    def digest(self) -> bytes:
        return self._h.digest()


class Crc32Stream:
    def __init__(self):
        self.value = 0

    def update(self, data) -> None:
        self.value = crc32(data, self.value)


class Crc64Stream:
    def __init__(self):
        self.value = 0

    def update(self, data) -> None:
        self.value = crc64(data, self.value)
