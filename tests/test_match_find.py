"""Device match finder: candidate validity + quality vs the host finder."""

import numpy as np

from lzma_sdk_zliblike_tpu.ops import match_find
from tests.corpus import big_mixed, random_bytes


def test_candidates_are_real_matches():
    L = 1 << 12
    data = np.zeros((3, L), np.uint8)
    raw0 = big_mixed(L)
    raw1 = (b"abcdefgh" * 600)[:L]
    raw2 = random_bytes(L, seed=7)
    valid = np.array([L, L, L - 100], np.int32)
    for i, raw in enumerate((raw0, raw1, raw2)):
        data[i] = np.frombuffer(raw, np.uint8)
    bl, bd, cands = match_find.find_matches(data, valid)
    for s in range(3):
        v = int(valid[s])
        for p in range(v):
            d = int(bd[s, p])
            ln = int(bl[s, p])
            if d == 0:
                continue
            assert 0 < d <= p, (s, p, d)
            assert 0 <= ln <= 16
            # the reported (capped) length must be an actual byte match
            lim = min(ln, v - p)
            assert (data[s, p - d:p - d + lim] == data[s, p:p + lim]).all(), \
                (s, p, d, ln)
        # candidate distances point at genuine earlier positions
        for c in cands:
            dd = int(c[s, min(v - 5, 97)])
            assert 0 <= dd <= min(v - 5, 97)


def test_finds_obvious_repeats():
    L = 1 << 10
    pat = b"the quick brown fox jumps over the lazy dog. "
    raw = (pat * 40)[:L]
    data = np.frombuffer(raw, np.uint8)[None, :].copy()
    valid = np.array([L], np.int32)
    bl, bd, _ = match_find.find_matches(data, valid)
    # after the first period, almost every position has a full-cap match at
    # distance len(pat)
    hits = 0
    for p in range(len(pat) + 4, L - 20):
        if int(bl[0, p]) >= 16 and int(bd[0, p]) % len(pat) == 0:
            hits += 1
    assert hits > (L - len(pat) - 24) * 0.9, hits


def test_quality_close_to_host_chain():
    """>= 4-byte matches found for most positions where the host hash-chain
    finder (chain walk 48) finds one."""
    L = 1 << 12
    raw = big_mixed(L, seed=11)
    data = np.frombuffer(raw, np.uint8)[None, :].copy()
    bl, bd, cands = match_find.find_matches(data, np.array([L], np.int32))

    # brute host-side: nearest previous position sharing the 4-byte prefix
    from collections import defaultdict
    last = defaultdict(list)
    found = dev_found = 0
    for p in range(L - 4):
        key = raw[p:p + 4]
        if last[key]:
            found += 1
            if int(bd[0, p]) > 0 and int(bl[0, p]) >= 4:
                dev_found += 1
            else:
                # any candidate distance that yields a 4-byte match counts
                for c in cands:
                    d = int(c[0, p])
                    if d > 0 and raw[p - d:p - d + 4] == key:
                        dev_found += 1
                        break
        last[key].append(p)
    assert dev_found >= found * 0.95, (dev_found, found)
