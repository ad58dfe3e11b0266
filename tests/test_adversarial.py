"""Adversarial/malformed container inputs (VERDICT r4 item 8).

Asserts the reference's error taxonomy on corrupted archives: the 7z
reader's signature/CRC failure paths (``7zIn.c:1231-1245`` start
header, ``7zIn.c:1378-1397`` content CRCs) and the xz state machine's
header/check validations — every corruption must surface as the typed
``SRes``-mapped exception, never as garbage output or an unrelated
crash.
"""

import pytest

from lzma_sdk_zliblike_tpu.containers import sevenzip as SZ
from lzma_sdk_zliblike_tpu.containers import xz
from lzma_sdk_zliblike_tpu.utils.errors import (
    ArchiveError, CrcError, DataError, InputEofError, LzmaError,
    NoArchiveError, UnsupportedError)

FILES = {"a.txt": b"hello adversary " * 200,
         "b/c.bin": bytes(range(256)) * 40}


@pytest.fixture(scope="module")
def img7z():
    return SZ.write(FILES, dict_size=1 << 16)


@pytest.fixture(scope="module")
def imgxz():
    return xz.encode(b"payload " * 5000)


# --- 7z -------------------------------------------------------------------

def test_7z_bad_signature(img7z):
    bad = b"NOT7ZSIG" + img7z[8:]
    with pytest.raises(NoArchiveError):
        SZ.parse(bad)


def test_7z_start_header_crc(img7z):
    # bytes 12..20 hold the start header; its CRC lives at offset 8
    bad = bytearray(img7z)
    bad[14] ^= 0xFF
    with pytest.raises(CrcError):
        SZ.parse(bytes(bad))


def test_7z_next_header_crc(img7z):
    # flip a byte inside the trailing metadata block (next header)
    bad = bytearray(img7z)
    bad[-3] ^= 0xFF
    with pytest.raises((CrcError, ArchiveError, DataError, InputEofError)):
        SZ.extract(bytes(bad))


def test_7z_truncated(img7z):
    for cut in (5, 20, len(img7z) // 2, len(img7z) - 2):
        with pytest.raises(LzmaError):
            SZ.extract(img7z[:cut])


def test_7z_content_crc(img7z):
    """Corrupt packed payload: the per-file/folder CRC check must fire
    (7zIn.c:1378-1397), not silent garbage extraction."""
    bad = bytearray(img7z)
    bad[40] ^= 0x55   # inside the first packed stream
    with pytest.raises((CrcError, DataError)):
        SZ.extract(bytes(bad))


def test_7z_empty_and_tiny():
    with pytest.raises(LzmaError):
        SZ.parse(b"")
    with pytest.raises(LzmaError):
        SZ.parse(b"7z\xbc\xaf\x27\x1c")   # signature only, no header


# --- xz -------------------------------------------------------------------

def test_xz_bad_magic(imgxz):
    with pytest.raises(ArchiveError):
        xz.decode(b"\x00" * 6 + imgxz[6:])


def test_xz_stream_header_crc(imgxz):
    bad = bytearray(imgxz)
    bad[8] ^= 0xFF   # stream flags CRC32 region
    with pytest.raises((CrcError, UnsupportedError)):
        xz.decode(bytes(bad))


def test_xz_block_payload_crc(imgxz):
    """Corrupt compressed payload: either the LZMA2 decode fails
    (DataError) or the block check mismatches (CrcError)."""
    bad = bytearray(imgxz)
    bad[len(bad) // 2] ^= 0x55
    with pytest.raises((CrcError, DataError, InputEofError)):
        xz.decode(bytes(bad))


def test_xz_truncated(imgxz):
    for cut in (4, 11, len(imgxz) // 2, len(imgxz) - 4):
        with pytest.raises(LzmaError):
            xz.decode(imgxz[:cut])


def test_xz_index_corruption(imgxz):
    """The backward reader walks footer->index; a corrupt index must
    fail typed (Xz.h state machine's index CRC)."""
    bad = bytearray(imgxz)
    bad[-16] ^= 0xFF
    with pytest.raises(LzmaError):
        xz.decode(bytes(bad))
    with pytest.raises(LzmaError):
        list(xz.read_backward(bytes(bad)))


def test_xz_streaming_decoder_corrupt(imgxz):
    """The incremental XzStreamDecoder must fail typed mid-feed."""
    bad = bytearray(imgxz)
    bad[len(bad) // 2] ^= 0x55
    out = bytearray()
    dec = xz.XzStreamDecoder(out.extend)
    with pytest.raises(LzmaError):
        for k in range(0, len(bad), 997):
            dec.feed(bytes(bad[k:k + 997]))
        dec.finish()
