"""Streaming / bounded-memory LZMA2 encode (native sliding window).

Parity target: the reference's streaming encode path — sliding window with
refill+MoveBlock (LzFind.c:57-121) driven by LzmaEnc_Encode2's block loop
(LzmaEnc.c:2154-2184) and position normalization (LzFind.c:285-320).
"""

import os
import subprocess

import pytest

from tests.corpus import big_mixed
from lzma_sdk_zliblike_tpu import api, native
from lzma_sdk_zliblike_tpu.models.lzma2 import framing

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _stream_encode(data, dict_size, effort, feed):
    enc = native.Lzma2StreamEncoder(dict_size, effort=effort)
    out = bytearray()
    for off in range(0, len(data), feed):
        out += enc.compress(data[off:off + feed])
    out += enc.flush()
    return bytes(out), enc.dict_prop


def test_roundtrip_with_slides_both_efforts(corpus):
    data = (corpus["text"] + corpus["code"] + corpus["binary"]) * 3
    for eff in (9, 10):
        s, p = _stream_encode(data, 1 << 16, eff, feed=50_000)
        assert framing.decode(s, p, engine="native") == data


def test_no_slide_matches_whole_buffer_encoder(corpus):
    # single feed, dict >= input: the incremental encoder must produce
    # byte-identical output to the one-shot whole-buffer encoder
    data = corpus["text"] + corpus["code"]
    s1, p1 = _stream_encode(data, 1 << 22, 9, feed=len(data) + 1)
    s2, p2 = native.lzma2_encode(data, dict_size=1 << 22,
                                 chunk_size=1 << 21, parallel=0, effort=9)
    assert (s1, p1) == (s2, p2)


def test_feed_granularity_invariance(corpus):
    # output depends on (data, dict), not on how the bytes arrive, as long
    # as a full sub-chunk backlog is maintained
    data = (corpus["text"] + corpus["code"]) * 2
    s1, _ = _stream_encode(data, 1 << 16, 9, feed=49152 + 273)
    s2, _ = _stream_encode(data, 1 << 16, 9, feed=49152 + 273)
    assert s1 == s2


def test_oracle_decodes_slid_stream(tmp_path, oracle, corpus):
    data = big_mixed(1 << 20)
    s, p = _stream_encode(data, 1 << 16, 9, feed=65536)
    enc = tmp_path / "s.l2"
    out = tmp_path / "s.out"
    enc.write_bytes(bytes([p]) + s)
    subprocess.run([oracle["oracle_driver"], "lzma2d", str(enc), str(out)],
                   check=True, capture_output=True)
    assert out.read_bytes() == data


def test_incompressible_copy_chunks_streaming():
    data = os.urandom(300_000)
    s, p = _stream_encode(data, 1 << 16, 9, feed=70_000)
    assert framing.decode(s, p, engine="native") == data
    assert len(s) < len(data) + len(data) // 100 + 64  # copy-chunk overhead


def test_file_to_file(tmp_path, oracle):
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.l2"
    data = big_mixed(2 << 20)
    src.write_bytes(data)
    calls = []
    prop = api.lzma2_compress_file(str(src), str(dst), dict_size=1 << 16,
                                   progress=lambda a, b: calls.append(a))
    assert calls and calls[-1] == len(data)
    assert framing.decode(dst.read_bytes(), prop, engine="native") == data
    # oracle cross-check
    enc = tmp_path / "o.l2"
    out = tmp_path / "o.out"
    enc.write_bytes(bytes([prop]) + dst.read_bytes())
    subprocess.run([oracle["oracle_driver"], "lzma2d", str(enc), str(out)],
                   check=True, capture_output=True)
    assert out.read_bytes() == data


def test_empty_and_tiny():
    for data in (b"", b"x", b"ab" * 3):
        enc = native.Lzma2StreamEncoder(1 << 16)
        s = enc.compress(data) + enc.flush()
        assert framing.decode(s, enc.dict_prop, engine="native") == data
