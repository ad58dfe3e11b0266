"""Memory budget accounting (the reference's ISzAlloc surface, SURVEY L1)."""

from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.utils.memory import (decode_batch_hbm_bytes,
                                                pick_lanes,
                                                shape_for_groups)


def test_pick_lanes_budget():
    # 64 MB dict + 4 MB pack, 2 in flight: 128 lanes would want ~17 GB
    assert pick_lanes(4 << 20, 64 << 20, hbm_budget=8 << 30,
                      max_lanes=128) == 32
    # small groups fit at full width
    assert pick_lanes(1 << 20, 1 << 20, hbm_budget=8 << 30,
                      max_lanes=128) == 128
    # tiny budget degrades to 1 lane, never 0
    assert pick_lanes(64 << 20, 64 << 20, hbm_budget=1 << 20,
                      max_lanes=128) == 1


def test_budget_accounting_monotone():
    a = decode_batch_hbm_bytes(8, 1 << 20, 16 << 20)
    b = decode_batch_hbm_bytes(16, 1 << 20, 16 << 20)
    assert b == 2 * a


def test_shape_for_groups_covers_stream():
    data = bytes(range(256)) * 64
    stream, _prop = framing.encode(data, dict_size=4096, chunk_size=1024)
    groups = framing.split_groups(framing.scan(stream)[0])
    shape = shape_for_groups(groups)
    assert shape.dic_cap >= max(sum(c.unpack_size for c in g)
                                for g in groups)
    assert shape.pack_cap >= max(sum(c.pack_size for c in g)
                                 for g in groups)
    assert shape.n_lanes >= 1


def test_normalize_axes_factorization():
    """t1*t2=t3 resolution precedence mirrors Lzma2EncProps_Normalize
    (Lzma2Enc.c:176-221)."""
    from lzma_sdk_zliblike_tpu.parallel.mesh import normalize_axes
    # nothing given: one chip, default lanes
    assert normalize_axes(None, None, None, default_per_chip=8) == (8, 1, 8)
    # total only: chips derived from default per-chip
    assert normalize_axes(None, None, 32, default_per_chip=8) == (8, 4, 32)
    # total smaller than one chip's lanes: per-chip collapses to 1
    assert normalize_axes(None, None, 4, default_per_chip=8) == (1, 4, 4)
    # chips only
    assert normalize_axes(None, 4, None, default_per_chip=8) == (8, 4, 32)
    # per-chip + total: chips derived
    assert normalize_axes(16, None, 64, default_per_chip=8) == (16, 4, 64)
    # chips + total: per-chip derived
    assert normalize_axes(None, 4, 64, default_per_chip=8) == (16, 4, 64)
    # fully specified pair wins over total (reference: t3 = t1n * t2)
    assert normalize_axes(8, 2, 1000, default_per_chip=8) == (8, 2, 16)
    # chip cap
    assert normalize_axes(1, None, 1 << 20, max_chips=64)[1] == 64
