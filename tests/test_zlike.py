"""Zlib-like streaming decompression objects (streams/zlike.py).

Parity model: the reference's LzmaDec_DecodeToBuf contract — arbitrary
input fragmentation, bounded output drains, exact results — checked
against one-shot decodes of the same streams.
"""

import pytest

from lzma_sdk_zliblike_tpu import api
from lzma_sdk_zliblike_tpu.containers import xz
from lzma_sdk_zliblike_tpu.models.lzma.spec import LzmaProps
from lzma_sdk_zliblike_tpu.streams import zlike
from lzma_sdk_zliblike_tpu.utils.errors import InputEofError


def _mixed(corpus, n=120_000):
    return (corpus["text"] + corpus["x86"] + corpus["random"])[:n]


@pytest.mark.parametrize("engine", ["auto", "py"])
@pytest.mark.parametrize("step", [1, 7, 997, 1 << 20])
def test_lzma_stream_fragmented_input(corpus, step, engine):
    data = _mixed(corpus)
    props = LzmaProps(dict_size=1 << 16)
    stream, props_b = api.compress(data, dict_size=1 << 16)
    dec = zlike.LzmaDecodeStream(props_b, unpack_size=len(data),
                                 engine=engine)
    out = bytearray()
    for i in range(0, len(stream), step):
        out += dec.decompress(stream[i:i + step])
    out += dec.flush()
    assert bytes(out) == data
    assert dec.eof


def test_lzma_stream_end_marker_and_unused_data(corpus):
    data = _mixed(corpus, 30_000)
    from lzma_sdk_zliblike_tpu.engine import lzma_raw_encode
    props = LzmaProps(dict_size=1 << 16)
    stream = lzma_raw_encode(data, props, write_end_mark=True)
    dec = zlike.LzmaDecodeStream(props)  # size unknown: until end marker
    out = dec.decompress(stream + b"TRAILING")
    out += dec.flush()
    assert out == data
    assert dec.eof
    assert dec.unused_data == b"TRAILING"


def test_lzma_stream_bounded_output_drains(corpus):
    data = _mixed(corpus, 60_000)
    stream, props_b = api.compress(data, dict_size=1 << 16)
    dec = zlike.LzmaDecodeStream(props_b, unpack_size=len(data))
    chunks = [dec.decompress(stream, max_length=777)]
    while True:
        c = dec.decompress(b"", max_length=777)
        if not c:
            break
        chunks.append(c)
    assert b"".join(chunks) + dec.flush() == data


def test_lzma_stream_truncated_raises(corpus):
    data = _mixed(corpus, 30_000)
    stream, props_b = api.compress(data, dict_size=1 << 16)
    dec = zlike.LzmaDecodeStream(props_b, unpack_size=len(data))
    dec.decompress(stream[:len(stream) // 2])
    with pytest.raises(InputEofError):
        dec.flush()


def test_lzma_stream_bounded_memory(corpus):
    # window trimming: internal history stays near dict_size, not output size
    data = (corpus["text"] * 8)[:400_000]
    stream, props_b = api.compress(data, dict_size=1 << 14)
    dec = zlike.LzmaDecodeStream(props_b, unpack_size=len(data))
    out = bytearray()
    for i in range(0, len(stream), 4096):
        out += dec.decompress(stream[i:i + 4096])
    out += dec.flush()
    assert bytes(out) == data
    assert len(dec._out) < (1 << 14) + (1 << 17)


@pytest.mark.parametrize("engine", ["auto", "py"])
@pytest.mark.parametrize("step", [1, 13, 1 << 20])
def test_lzma2_stream_fragmented_input(corpus, step, engine):
    data = _mixed(corpus)
    stream, prop = api.lzma2_compress(data, dict_size=1 << 16,
                                      chunk_size=1 << 14)
    dec = zlike.Lzma2DecodeStream(prop, engine=engine)
    out = bytearray()
    for i in range(0, len(stream), step):
        out += dec.decompress(stream[i:i + step])
    out += dec.flush()
    assert bytes(out) == data
    assert dec.eof


def test_lzma2_stream_copy_chunks_and_unused(corpus):
    # incompressible data forces copy chunks through the stream parser
    data = corpus["random"][:100_000]
    stream, prop = api.lzma2_compress(data, dict_size=1 << 16,
                                      chunk_size=1 << 14)
    dec = zlike.Lzma2DecodeStream(prop)
    out = dec.decompress(stream + b"xx")
    out += dec.flush()
    assert out == data
    assert dec.unused_data == b"xx"


def test_lzma2_stream_truncated_raises(corpus):
    data = _mixed(corpus, 50_000)
    stream, prop = api.lzma2_compress(data, dict_size=1 << 16)
    dec = zlike.Lzma2DecodeStream(prop)
    dec.decompress(stream[:-10])
    with pytest.raises(InputEofError):
        dec.flush()


@pytest.mark.parametrize("step", [1, 333, 1 << 20])
def test_xz_stream_obj(corpus, step):
    data = _mixed(corpus, 80_000)
    img = xz.encode(data, dict_size=1 << 16, check="crc64")
    dec = zlike.XzDecodeStream()
    out = bytearray()
    for i in range(0, len(img), step):
        out += dec.decompress(img[i:i + step])
    out += dec.flush()
    assert bytes(out) == data


def test_decompressobj_factory(corpus):
    data = _mixed(corpus, 20_000)
    stream, props_b = api.compress(data, dict_size=1 << 16)
    d = zlike.decompressobj("lzma", props=props_b, unpack_size=len(data))
    assert d.decompress(stream) + d.flush() == data
    with pytest.raises(ValueError):
        zlike.decompressobj("nope")


def test_uncompress_engine_tpu_and_hybrid(monkeypatch):
    """api.lzma2_uncompress engine='tpu'/'hybrid' routes (interpret on CPU)."""
    import os

    from lzma_sdk_zliblike_tpu.api import lzma2_compress, lzma2_uncompress
    data = bytes(range(256)) * 600
    stream, prop = lzma2_compress(data, dict_size=1 << 14,
                                  chunk_size=1 << 14)
    monkeypatch.setenv("LZT_PALLAS_INTERPRET", "1")
    assert lzma2_uncompress(stream, prop, engine="hybrid") == data
    assert lzma2_uncompress(stream, prop, engine="tpu") == data


def test_native_stream_decoder_in_use(corpus):
    # guard: the fast path must actually be wired when the runtime is built
    from lzma_sdk_zliblike_tpu import native
    if not native.stream_dec_available():
        pytest.skip("native runtime not built")
    dec = zlike.Lzma2DecodeStream(18)
    assert dec._nd is not None
    dec = zlike.LzmaDecodeStream(LzmaProps(dict_size=1 << 16))
    assert dec._nd is not None


def test_native_py_engine_parity(corpus):
    """Native and pure-Python streaming decoders agree at every drain."""
    from lzma_sdk_zliblike_tpu import native
    if not native.stream_dec_available():
        pytest.skip("native runtime not built")
    data = _mixed(corpus, 80_000)
    stream, prop = api.lzma2_compress(data, dict_size=1 << 16,
                                      chunk_size=1 << 14)
    a = zlike.Lzma2DecodeStream(prop, engine="auto")
    b = zlike.Lzma2DecodeStream(prop, engine="py")
    assert a._nd is not None and b._nd is None
    out_a = bytearray()
    out_b = bytearray()
    for i in range(0, len(stream) + 1, 1777):
        piece = stream[i:i + 1777]
        out_a += a.decompress(piece, max_length=4096)
        out_b += b.decompress(piece, max_length=4096)
    out_a += a.flush()
    out_b += b.flush()
    assert bytes(out_a) == bytes(out_b) == data
    assert a.unused_data == b.unused_data
