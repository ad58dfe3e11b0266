""".xz / .lzma86 containers: round trips + interop with system xz and the
reference oracle."""

import shutil
import subprocess

import pytest

from lzma_sdk_zliblike_tpu.containers import lzma86, xz
from lzma_sdk_zliblike_tpu.utils.errors import CrcError, LzmaError

HAVE_XZ = shutil.which("xz") is not None


def _data(corpus):
    return corpus["text"][:30000] + corpus["binary"][:8000]


@pytest.mark.parametrize("check", ["none", "crc32", "crc64", "sha256"])
def test_xz_roundtrip_checks(corpus, check):
    data = _data(corpus)
    img = xz.encode(data, check=check, dict_size=1 << 16)
    assert xz.decode(img) == data


@pytest.mark.skipif(not HAVE_XZ, reason="no system xz")
@pytest.mark.parametrize("check", ["crc32", "crc64", "sha256"])
def test_system_xz_decodes_ours(corpus, tmp_path, check):
    data = _data(corpus)
    img = xz.encode(data, check=check, dict_size=1 << 16, block_size=16384)
    p = tmp_path / "t.xz"
    p.write_bytes(img)
    r = subprocess.run(["xz", "-dc", str(p)], capture_output=True)
    assert r.returncode == 0 and r.stdout == data


@pytest.mark.skipif(not HAVE_XZ, reason="no system xz")
@pytest.mark.parametrize("args", [["-0"], ["-6"], ["--check=crc64"],
                                  ["--check=sha256"],
                                  ["--block-size=16384"],
                                  ["--delta=dist=4", "--lzma2=preset=4"],
                                  ["--x86", "--lzma2=preset=4"]])
def test_we_decode_system_xz(corpus, tmp_path, args):
    data = _data(corpus)
    p = tmp_path / "in.bin"
    p.write_bytes(data)
    r = subprocess.run(["xz", "-kfc"] + args + [str(p)], capture_output=True)
    assert r.returncode == 0
    assert xz.decode(r.stdout) == data


def test_we_decode_oracle_xz(oracle, corpus, tmp_path):
    data = _data(corpus)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.xz"
    src.write_bytes(data)
    subprocess.run([oracle["oracle_driver"], "xze", str(src), str(dst)],
                   check=True, capture_output=True)
    assert xz.decode(dst.read_bytes()) == data


def test_xz_multiblock_and_backward_index(corpus):
    data = _data(corpus)
    img = xz.encode(data, check="crc64", dict_size=1 << 16, block_size=8192)
    assert xz.decode(img) == data
    infos = xz.read_backward(img)
    assert len(infos) == 1
    assert len(infos[0].blocks) == (len(data) + 8191) // 8192
    assert sum(b[1] for b in infos[0].blocks) == len(data)


def test_xz_concatenated_streams(corpus):
    a = corpus["text"][:5000]
    b = corpus["code"][:5000]
    img = xz.encode(a, dict_size=1 << 16) + xz.encode(b, dict_size=1 << 16)
    assert xz.decode(img) == a + b
    infos = xz.read_backward(img)
    assert len(infos) == 2


@pytest.mark.parametrize("f", [
    xz.XzFilter(xz.FILTER_DELTA, bytes([3])),
    xz.XzFilter(xz.FILTER_X86),
    xz.XzFilter(xz.FILTER_ARM),
    xz.XzFilter(xz.FILTER_SPARC),
])
def test_xz_filter_chains(corpus, f):
    data = corpus["x86"]
    img = xz.encode(data, dict_size=1 << 16, filters=[f])
    assert xz.decode(img) == data


def test_xz_corrupt_check_raises(corpus):
    data = _data(corpus)
    img = bytearray(xz.encode(data, check="crc32", dict_size=1 << 16))
    img[40] ^= 0x01  # flip a payload bit
    with pytest.raises(LzmaError):
        xz.decode(bytes(img))


def test_lzma86_roundtrip_all_modes(corpus):
    data = corpus["x86"]
    for mode in (lzma86.FILTER_NO, lzma86.FILTER_YES, lzma86.FILTER_AUTO):
        img = lzma86.encode(data, dict_size=1 << 16, filter_mode=mode)
        assert lzma86.decode(img) == data
        assert lzma86.get_unpack_size(img) == len(data)


def test_lzma86_oracle_interop(oracle, corpus, tmp_path):
    data = corpus["x86"]
    img = lzma86.encode(data, dict_size=1 << 16)
    p = tmp_path / "t.l86"
    p.write_bytes(img)
    out = tmp_path / "t.out"
    subprocess.run([oracle["oracle_driver"], "lzma86d", str(p), str(out)],
                   check=True, capture_output=True)
    assert out.read_bytes() == data
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    enc = tmp_path / "o.l86"
    subprocess.run([oracle["oracle_driver"], "lzma86e", str(src), str(enc)],
                   check=True, capture_output=True)
    assert lzma86.decode(enc.read_bytes()) == data


@pytest.mark.parametrize("feed", [1, 13, 997, 1 << 20])
def test_xz_streaming_decoder_feed_sizes(corpus, feed):
    data = corpus["text"][:40000] + corpus["binary"][:10000]
    img = xz.encode(data, check="crc64", dict_size=1 << 16, block_size=16384)
    out = []
    dec = xz.XzStreamDecoder(out.append)
    for i in range(0, len(img), feed):
        dec.feed(img[i:i + feed])
    dec.finish()
    assert b"".join(out) == data


@pytest.mark.skipif(not HAVE_XZ, reason="no system xz")
@pytest.mark.parametrize("args", [["--x86", "--lzma2=preset=4,dict=64KiB"],
                                  ["--delta=dist=4", "--lzma2=preset=2"]])
def test_xz_streaming_decoder_sysxz_filters(corpus, tmp_path, args):
    data = corpus["x86"]
    p = tmp_path / "in.bin"
    p.write_bytes(data)
    r = subprocess.run(["xz", "-kfc"] + args + [str(p)], capture_output=True)
    out = []
    dec = xz.XzStreamDecoder(out.append)
    for i in range(0, len(r.stdout), 777):
        dec.feed(r.stdout[i:i + 777])
    dec.finish()
    assert b"".join(out) == data


def test_xz_streaming_decoder_truncation_raises(corpus):
    data = corpus["text"][:20000]
    img = xz.encode(data, dict_size=1 << 16)
    dec = xz.XzStreamDecoder(lambda b: None)
    dec.feed(img[:len(img) // 2])
    with pytest.raises(LzmaError):
        dec.finish()


def test_xz_streaming_decoder_corruption_raises(corpus):
    data = corpus["text"][:20000]
    img = bytearray(xz.encode(data, check="crc32", dict_size=1 << 16))
    img[40] ^= 1
    dec = xz.XzStreamDecoder(lambda b: None)
    with pytest.raises(LzmaError):
        dec.feed(bytes(img))
        dec.finish()


def test_xz_encode_threads_identical(corpus):
    """threads plumb-through (XzEnc.c:431-450 MtCoder-backed path):
    byte-identical stream at any thread count, decodable."""
    from lzma_sdk_zliblike_tpu.containers import xz
    data = corpus["code"][:300_000]
    a = xz.encode(data, dict_size=1 << 16, chunk_size=1 << 14)
    b = xz.encode(data, dict_size=1 << 16, chunk_size=1 << 14, threads=4)
    assert a == b
    assert xz.decode(b) == data
