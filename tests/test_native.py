"""Native C++ engine: byte parity with the Python reference + speed paths."""

import pytest

from lzma_sdk_zliblike_tpu import native
from lzma_sdk_zliblike_tpu.models.lzma.spec import LzmaProps
from lzma_sdk_zliblike_tpu.models.lzma import encoder_ref, decoder_ref
from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.utils import checksums as CK
from lzma_sdk_zliblike_tpu.utils.errors import DataError, LzmaError

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine not built")


@pytest.mark.parametrize("name", ["text", "code", "binary", "random",
                                  "repeat", "x86", "tiny", "empty"])
def test_encoder_byte_parity(corpus, name):
    data = corpus[name][:25000]
    props = LzmaProps(dict_size=1 << 16)
    assert native.lzma_encode(data, props) == \
        encoder_ref.lzma_encode(data, props)


def test_decoder_parity_with_python(corpus):
    data = corpus["text"][:25000]
    props = LzmaProps(dict_size=1 << 16)
    stream = encoder_ref.lzma_encode(data, props)
    assert native.lzma_decode(stream, props, len(data)) == data
    assert decoder_ref.lzma_decode(stream, props, len(data)) == data


def test_lzma2_byte_parity(corpus):
    data = corpus["text"] + corpus["binary"] + corpus["random"]
    sn, pn = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 15,
                            engine="native")
    sp, pp = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 15,
                            engine="python")
    assert pn == pp and sn == sp
    assert framing.decode(sn, pn, engine="native") == data


def test_lzma2_nonparallel_parity(corpus):
    data = corpus["code"][:60000]
    sn, pn = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14,
                            parallel_groups=False, engine="native")
    sp, _ = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14,
                           parallel_groups=False, engine="python")
    assert sn == sp


def test_endmark_mode(corpus):
    data = corpus["binary"][:20000]
    props = LzmaProps(dict_size=1 << 16)
    stream = native.lzma_encode(data, props, write_end_mark=True)
    assert native.lzma_decode(stream, props, None) == data


def test_native_crc_parity(corpus):
    data = corpus["text"]
    assert native.crc32(data) == CK.crc32(data)
    assert native.crc64(data) == CK.crc64(data)


def test_native_error_codes(corpus):
    props = LzmaProps(dict_size=1 << 16)
    with pytest.raises(LzmaError):
        native.lzma_decode(b"\x01\x00\x00\x00\x00\x00", props, 100)
    stream = native.lzma_encode(corpus["text"][:5000], props)
    with pytest.raises(LzmaError):
        bad = b"\x00" + bytes([stream[1] ^ 0xFF]) + stream[2:]
        out = native.lzma_decode(bad, props, 5000)
        if out != corpus["text"][:5000]:
            raise DataError("payload mismatch")


def test_mt_encode_identical_any_thread_count(corpus):
    from lzma_sdk_zliblike_tpu.parallel.host_pool import encode_lzma2_mt
    data = (corpus["text"] + corpus["binary"] + corpus["random"])[:200_000]
    s1, p1 = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 16)
    for nt in (1, 2, 4):
        sm, pm = encode_lzma2_mt(data, dict_size=1 << 16,
                                 chunk_size=1 << 16, threads=nt)
        assert (sm, pm) == (s1, p1)
    assert framing.decode(s1, p1) == data


def test_progress_callback_and_abort(corpus):
    from lzma_sdk_zliblike_tpu import api
    from lzma_sdk_zliblike_tpu.utils.errors import ProgressAborted
    data = corpus["text"][:100_000]
    calls = []
    api.lzma2_compress(data, dict_size=1 << 16, chunk_size=1 << 15,
                       threads=2, progress=lambda a, b: calls.append((a, b)))
    assert calls and calls[-1][0] == len(data)
    with pytest.raises(ProgressAborted):
        api.lzma2_compress(data, dict_size=1 << 16, chunk_size=1 << 15,
                           threads=2, progress=lambda a, b: False)


def test_optimal_effort_smaller(corpus):
    data = (corpus["text"] + corpus["code"])[:150_000]
    s9, _ = native.lzma2_encode(data, 1 << 16, 1 << 16, True, effort=9)
    s10, p10 = native.lzma2_encode(data, 1 << 16, 1 << 16, True, effort=10)
    assert len(s10) < len(s9)
    assert framing.decode(s10, p10, engine="python") == data
