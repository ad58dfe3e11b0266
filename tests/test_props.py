"""EncProps normalization (CLzmaEncProps/CLzma2EncProps parity surface)."""

from lzma_sdk_zliblike_tpu.utils.props import EncProps, from_level


def test_level_defaults_match_reference_table():
    # LzmaEncProps_Normalize (LzmaEnc.c:53-74) + LzmaLib.h:44-52
    p5 = from_level(5)
    assert (p5.dict_size, p5.lc, p5.lp, p5.pb) == (1 << 24, 3, 0, 2)
    assert (p5.algo, p5.fb, p5.bt_mode, p5.mc) == (1, 32, 1, 32)
    p1 = from_level(1)
    assert (p1.dict_size, p1.algo) == (1 << 16, 0)
    assert p1.mc == (16 + 16) >> 1           # hash-chain halves mc
    p9 = from_level(9)
    assert (p9.dict_size, p9.fb) == (1 << 26, 64)
    assert from_level(12).level == 9         # clamp


def test_block_size_rule():
    # 4 x dict clamped [1MB, 256MB] then engine group cap (Lzma2Enc.c:223)
    assert from_level(0).chunk_size == 1 << 20
    assert from_level(5).chunk_size == 1 << 21


def test_effort_mapping_and_api_roundtrip(corpus):
    from lzma_sdk_zliblike_tpu import api
    assert from_level(1).effort == 9
    assert from_level(5).effort == 10
    assert from_level(9).effort == 11
    data = corpus["text"][:120_000]
    s, prop = api.lzma2_compress(data, props=EncProps(level=4), threads=1)
    assert api.lzma2_uncompress(s, prop) == data


def test_thread_factorization():
    p = EncProps(level=5, num_total_threads=8).normalize()
    assert p.num_block_threads == 8
