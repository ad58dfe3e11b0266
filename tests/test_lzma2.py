"""LZMA2 framing: grammar, scanner, round trips, oracle cross-checks."""

import lzma as stdlzma
import subprocess

import pytest

from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.utils.errors import DataError, LzmaError

SMALL = 30_000


def test_dict_prop_table():
    # 40 sizes 2^(11+k/2)·(2|k&1) — parity with Lzma2Enc.c:423-432
    assert framing.decode_dict_prop(0) == 1 << 12
    assert framing.decode_dict_prop(1) == 3 << 11
    assert framing.decode_dict_prop(2) == 1 << 13
    assert framing.decode_dict_prop(40) == 0xFFFFFFFF
    for k in range(40):
        sz = framing.decode_dict_prop(k)
        assert framing.encode_dict_prop(sz) == k


@pytest.mark.parametrize("name", ["text", "code", "binary", "random", "repeat",
                                  "tiny", "empty"])
def test_roundtrip_parallel_groups(corpus, name):
    data = corpus[name][:SMALL]
    stream, prop = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14)
    assert framing.decode(stream, prop) == data


def test_roundtrip_single_stream_mode(corpus):
    data = corpus["text"][:SMALL]
    stream, prop = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14,
                                  parallel_groups=False)
    assert framing.decode(stream, prop) == data
    # continuity mode should compress better than dict-reset-per-chunk mode
    p_stream, _ = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14)
    assert len(stream) <= len(p_stream)


def test_decode_oracle_lzma2(oracle, corpus, tmp_path):
    data = corpus["text"][:SMALL] + corpus["binary"][:SMALL]
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.l2"
    src.write_bytes(data)
    subprocess.run([oracle["oracle_driver"], "lzma2e", "65536", str(src),
                    str(dst)], check=True, capture_output=True)
    img = dst.read_bytes()
    assert framing.decode(img[1:], img[0]) == data


def test_oracle_decodes_ours(oracle, corpus, tmp_path):
    data = corpus["code"][:SMALL]
    stream, prop = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 14)
    src = tmp_path / "in.l2"
    dst = tmp_path / "out.bin"
    src.write_bytes(bytes([prop]) + stream)
    subprocess.run([oracle["oracle_driver"], "lzma2d", str(src), str(dst)],
                   check=True, capture_output=True)
    assert dst.read_bytes() == data


def test_stdlib_decodes_ours(corpus):
    data = corpus["binary"][:SMALL]
    stream, prop = framing.encode(data, dict_size=1 << 20)
    filters = [{"id": stdlzma.FILTER_LZMA2, "dict_size": 1 << 20}]
    assert stdlzma.decompress(stream, format=stdlzma.FORMAT_RAW,
                              filters=filters) == data


def test_decode_stdlib_lzma2(corpus):
    data = corpus["text"][:SMALL]
    filters = [{"id": stdlzma.FILTER_LZMA2, "preset": 6, "dict_size": 1 << 16}]
    stream = stdlzma.compress(data, format=stdlzma.FORMAT_RAW, filters=filters)
    prop = framing.encode_dict_prop(1 << 16)
    assert framing.decode(stream, prop) == data


def test_scanner_groups(corpus):
    data = corpus["text"][:SMALL]
    stream, _prop = framing.encode(data, dict_size=1 << 16, chunk_size=1 << 13)
    chunks, end = framing.scan(stream)
    assert end == len(stream)
    groups = framing.split_groups(chunks)
    assert len(groups) == (len(data) + (1 << 13) - 1) // (1 << 13)
    assert sum(c.unpack_size for c in chunks) == len(data)
    for g in groups:
        assert g[0].reset_dic


def test_truncated_raises(corpus):
    data = corpus["text"][:2000]
    stream, prop = framing.encode(data, dict_size=1 << 16)
    with pytest.raises(LzmaError):
        framing.decode(stream[:len(stream) // 2], prop)


def test_bad_control_byte():
    with pytest.raises(DataError):
        framing.scan(bytes([0x7F, 0, 0]))


def test_decode_progress_and_abort(corpus):
    from lzma_sdk_zliblike_tpu import api
    from lzma_sdk_zliblike_tpu.utils.errors import ProgressAborted
    import pytest as _pytest
    data = (corpus["text"] + corpus["code"])[:200_000]
    stream, prop = api.lzma2_compress(data, dict_size=1 << 15,
                                      chunk_size=1 << 15)
    calls = []
    out = api.lzma2_uncompress(stream, prop, threads=2,
                               progress=lambda a, b: calls.append((a, b)))
    assert out == data
    assert calls and calls[-1][1] == len(data)
    with _pytest.raises(ProgressAborted):
        api.lzma2_uncompress(stream, prop, threads=2,
                             progress=lambda a, b: False)


def test_copy_fallback_mid_group_roundtrip(oracle, tmp_path):
    """Copy chunks INSIDE a dict-sharing stream (regression, round 3).

    The encoder's copy fallback restored the pre-segment model snapshot
    but the decoder re-inits on the post-copy state-reset flag — the two
    desynced, producing wild match distances in the next LZMA chunk.
    Both engines and the oracle must accept the stream now.
    """
    import subprocess

    from tests.corpus import big_mixed, random_bytes

    cap = 384
    data = (big_mixed(cap * 6) + random_bytes(cap * 8, seed=9)
            + big_mixed(cap * 6, seed=5))
    for eng in ("native", "python"):
        stream, prop = framing.encode(data, dict_size=16384, chunk_size=cap,
                                      parallel_groups=False, engine=eng)
        chunks, _ = framing.scan(stream)
        assert any(not c.is_lzma for c in chunks), "no copy fallback fired"
        assert any(c.is_lzma for c in chunks)
        assert framing.decode(stream, prop) == data
        src = tmp_path / f"cf_{eng}.l2"
        dst = tmp_path / f"cf_{eng}.out"
        src.write_bytes(bytes([prop]) + stream)
        r = subprocess.run([oracle["oracle_driver"], "lzma2d", str(src),
                            str(dst)], capture_output=True)
        assert r.returncode == 0, r.stderr[-200:]
        assert dst.read_bytes() == data
