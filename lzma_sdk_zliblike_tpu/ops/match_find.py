"""Batched TPU match finder: sorted-bucket candidates, no random gathers.

The reference finds matches by walking per-position hash chains
(``LzFind.c:322-351`` hash-chain, ``LzFind.c:353-406`` binary tree) — a
pointer-chasing loop that is hostile to the TPU memory system (measured on
this platform: XLA gathers run ~90M elem/s, so a gather-per-candidate
design caps below 3 MB/s).  This module restructures match finding around
what the TPU *is* good at — wide elementwise ops and `lax.sort`:

1. hash every position's 4-byte prefix (Fibonacci multiply — one vector
   multiply, no CRC table lookups),
2. sort ``(hash << log2(L)) | pos`` once per chunk: positions that share a
   bucket become *adjacent, in increasing position order*, so the K nearest
   previous same-hash occurrences of position p are simply the K previous
   sort slots (masked to the same bucket) — the entire hash-chain walk
   collapses into K vector shifts,
3. carry each position's first 16 suffix bytes through the sort as payload
   words, so candidate quality (a 16-byte-capped LCP) is a payload XOR —
   again no gather,
4. sort back to position order with the chosen candidates as payload.

Output per position: K candidate distances ordered nearest-first plus the
16-byte-capped match length of the best one.  The host parse re-measures
true lengths with a memcmp when it consumes a candidate (cheap, cache-hot),
so the 16-byte payload cap does not cap emitted match lengths.

Scope note: one sort covers one chunk (the LZMA2 dict-reset group used by
the parallel encoder, ``Lzma2Enc.c:324-327`` equivalent); chunks are lanes
of the batch.  All shapes static; jit-compatible on TPU and CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FIB = np.uint32(2654435761)


FIB2 = np.uint32(2246822519)


@functools.partial(jax.jit, static_argnames=("n_cand", "n_cand8",
                                             "hash_bits"))
def _find(data_i32, valid, *, n_cand: int, n_cand8: int, hash_bits: int):
    S, L = data_i32.shape
    lb = (L - 1).bit_length()
    b = data_i32.astype(jnp.uint32)

    def at(off):
        if off == 0:
            return b
        return jnp.pad(b[:, off:], ((0, 0), (0, off)))

    w0 = at(0) | (at(1) << 8) | (at(2) << 16) | (at(3) << 24)
    w4 = at(4) | (at(5) << 8) | (at(6) << 16) | (at(7) << 24)
    w8 = at(8) | (at(9) << 8) | (at(10) << 16) | (at(11) << 24)
    w12 = at(12) | (at(13) << 8) | (at(14) << 16) | (at(15) << 24)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (S, L))

    def pass_candidates(h, min_pref, n_k):
        """One sorted-bucket pass: K nearest same-bucket predecessors."""
        invalid = pos + min_pref > valid[:, None]
        hh = jnp.where(invalid, 1 << hash_bits, h)
        key = (hh << lb) | pos
        skey, s0, s4, s8, s12 = jax.lax.sort(
            (key, w0, w4, w8, w12), dimension=1, num_keys=1)
        sp = skey & (L - 1)
        sb = skey >> lb
        avail = jnp.maximum(valid[:, None] - sp, 0)

        def lcp16(k):
            def back(x):
                return jnp.pad(x[:, :-k], ((0, 0), (k, 0)))
            ln = jnp.zeros_like(sp)
            alive = jnp.ones_like(sp, dtype=bool)
            for words in (s0, s4, s8, s12):
                x = words ^ back(words)
                nb = (jnp.where(x & 0xFF == 0, 1, 0)
                      + jnp.where(x & 0xFFFF == 0, 1, 0)
                      + jnp.where(x & 0xFFFFFF == 0, 1, 0)
                      + jnp.where(x == 0, 1, 0)).astype(jnp.int32)
                ln = ln + jnp.where(alive, nb, 0)
                alive = alive & (x == 0)
            same = sb == jnp.pad(sb[:, :-k], ((0, 0), (k, 0)),
                                 constant_values=-1)
            cpos = jnp.pad(sp[:, :-k], ((0, 0), (k, 0)))
            dist = jnp.where(same, sp - cpos, 0)
            return jnp.minimum(jnp.where(same, ln, 0), avail), dist

        lens, dists = zip(*(lcp16(k + 1) for k in range(n_k)))
        # restore position order within the pass
        out = jax.lax.sort((sp,) + tuple(lens) + tuple(dists),
                           dimension=1, num_keys=1)
        return out[1:1 + n_k], out[1 + n_k:]

    # pass 1: 4-byte-prefix buckets — the nearest occurrences of the
    # 4-byte prefix (HC4's role, LzFind.c:322-351 as behavioral target)
    h4 = ((w0 * FIB) >> (32 - hash_bits)).astype(jnp.int32)
    lens4, dists4 = pass_candidates(h4, 4, n_cand)
    lens, dists = list(lens4), list(dists4)
    if n_cand8:
        # pass 2: 8-byte-prefix buckets — long matches whose bucket
        # neighbors in pass 1 were crowded out by closer short matches
        h8 = (((w0 * FIB) ^ (w4 * FIB2)) >> (32 - hash_bits)).astype(
            jnp.int32)
        lens8, dists8 = pass_candidates(h8, 8, n_cand8)
        lens += list(lens8)
        dists += list(dists8)

    best_len = lens[0]
    best_dist = dists[0]
    for ln, dd in zip(lens[1:], dists[1:]):
        better = ln > best_len     # nearest-first tie-break (k=1 is nearest)
        best_len = jnp.where(better, ln, best_len)
        best_dist = jnp.where(better, dd, best_dist)
    return best_len, best_dist, tuple(dists)


def find_matches(data: np.ndarray, valid: np.ndarray, *, n_cand: int = 3,
                 n_cand8: int = 2, hash_bits: int | None = None):
    """Per-position match candidates for S independent chunks.

    data: [S, L] uint8 (L power of two), valid: [S] int32 lengths.
    Returns (best_len [S,L], best_dist [S,L], cand_dists tuple of [S,L]):
    n_cand nearest 4-byte-bucket distances then n_cand8 8-byte-bucket
    distances (0 = no candidate); lengths capped at 16.
    """
    S, L = data.shape
    if L & (L - 1):
        raise ValueError("chunk length must be a power of two")
    if hash_bits is None:
        hash_bits = max(12, min(17, (L - 1).bit_length()))
    bl, bd, cds = _find(jnp.asarray(data.astype(np.int32)),
                        jnp.asarray(np.asarray(valid, np.int32)),
                        n_cand=n_cand, n_cand8=n_cand8,
                        hash_bits=hash_bits)
    return (np.asarray(bl), np.asarray(bd),
            tuple(np.asarray(c) for c in cds))
