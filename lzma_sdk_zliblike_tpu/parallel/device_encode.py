"""Device-assisted LZMA2 encoding: TPU match finding + native host coding.

The reference encoder's hot engine is the match finder (SURVEY §2.1,
``LzFind.c``); the range coder that consumes its output is serial and
cheap.  This module splits the pipeline accordingly, the TPU way:

* the **TPU** computes per-position match candidates for a whole batch of
  chunks at once (``ops/match_find.py`` — sorted-bucket finder, one
  ``lax.sort`` instead of a hash-chain walk),
* the **native host coder** runs the lazy fast parse + range coding over
  the candidates (``native/lzt_codec.cc lzt_lzma2_encode_ext``),
  re-measuring true match lengths with memcmp as it consumes them.

Chunks are LZMA2 dict-reset groups (``Lzma2Enc.c:324-327`` equivalent), so
candidates never cross chunk boundaries and every chunk is an independent
lane — the same data-parallel unit the batched decoder uses.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..ops import match_find


def encode_lzma2_device(data: bytes, *, dict_size: int = 1 << 16,
                        chunk_size: int = 1 << 16, lanes: int = 32,
                        n_cand: int = 24, lc: int = 3, lp: int = 0,
                        pb: int = 2, effort: int = 9) -> tuple[bytes, int]:
    """Encode to a parallel-group LZMA2 stream; returns (stream, prop).

    Byte-compatible with any LZMA2 decoder; compressed size tracks the
    host fast path (same parse, candidate source differs).
    """
    if chunk_size & (chunk_size - 1):
        raise ValueError("chunk_size must be a power of two")
    if dict_size < chunk_size:
        dict_size = chunk_size
    n = len(data)
    if n == 0:
        return native.lzma2_encode(data, dict_size, chunk_size, True,
                                   lc, lp, pb, effort)
    arr = np.frombuffer(data, np.uint8)
    n_chunks = -(-n // chunk_size)
    padded = np.zeros((n_chunks, chunk_size), np.uint8)
    padded.reshape(-1)[:n] = arr
    valid = np.minimum(
        n - np.arange(n_chunks, dtype=np.int64) * chunk_size,
        chunk_size).astype(np.int32)

    n_cand8 = max(1, n_cand // 2)
    k_tot = n_cand + n_cand8
    ext = np.zeros((n_chunks * chunk_size, k_tot), np.int32)
    for base in range(0, n_chunks, lanes):
        hi = min(base + lanes, n_chunks)
        rows = np.zeros((lanes, chunk_size), np.uint8)
        rows[:hi - base] = padded[base:hi]
        v = np.zeros(lanes, np.int32)
        v[:hi - base] = valid[base:hi]
        _bl, _bd, cands = match_find.find_matches(rows, v, n_cand=n_cand,
                                                  n_cand8=n_cand8)
        stacked = np.stack(cands, axis=-1)       # [lanes, L, K]
        ext[base * chunk_size:hi * chunk_size] = \
            stacked[:hi - base].reshape(-1, k_tot)

    return native.lzma2_encode_ext(data, ext[:n], dict_size, chunk_size,
                                   lc=lc, lp=lp, pb=pb, effort=effort)
