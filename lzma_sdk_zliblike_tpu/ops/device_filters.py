"""Batched branch/delta filters as device (XLA) ops.

The reference applies its branch converters one buffer at a time on the
CPU (``Bra.c``, ``Delta.c``); in the TPU pipeline whole *batches* of
folder outputs leave the decode kernel device-resident, so the
fixed-alignment converters run as vectorized lane ops before the D2H
fetch instead of as a host pass after it.

Implemented on device (bit-exact vs ``ops/filters.py``):

* ``arm``    — word-aligned BL rewrite (``Bra.c:6-31``)
* ``armt``   — Thumb BL pairs (``Bra.c:33-67``); the pair masks make
  consecutive candidates mutually exclusive, so it is exactly parallel
* ``ppc``    — BE bl rewrite (``Bra.c:69-97``)
* ``sparc``  — call rewrite (``Bra.c:99-133``)
* ``ia64``   — brl slot rewrite (``BraIA64.c:14-67``); slots are bitwise
  disjoint, u64 windows emulated with u32 pairs
* ``delta``  — distance-D byte delta (``Delta.c:20-62``): decode is a
  per-residue-class prefix sum (mod 256), encode a shifted subtract

* ``x86``    — BCJ E8/E9 rewrite (``Bra86.c:11-85``) as a two-pass
  *mask-then-patch* formulation: the 3-bit prev-mask heuristic only
  steps at E8/E9 *candidate* bytes, and every byte the scan reads lies
  at or beyond the current candidate while patches land strictly behind
  the resumption point (a conversion at ``q`` rewrites ``q+1..q+4`` and
  resumes at ``q+5``) — so the byte-FSM collapses to a lockstep
  candidate-to-candidate scan over a precomputed next-candidate table
  (reads from the ORIGINAL buffer) followed by one vectorized patch
  scatter.  Iterations = max candidates per lane, not bytes.

Host-side only: BCJ2 *encode* (site-choice heuristics live with the
encoder).  ``bcj2_decode_batch`` below runs BCJ2 decode on device with
the same candidate-scan structure plus a lockstep range decoder.

All entry points take ``[S, L]`` uint8 batches with per-lane ``valid``
lengths and stream offsets ``ip``; lanes are independent streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _words_be(b):
    """[S, W, 4] uint8 -> [S, W] uint32 big-endian words."""
    b = b.astype(_U32)
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def _unwords_be(w):
    return jnp.stack([(w >> 24) & 0xFF, (w >> 16) & 0xFF,
                      (w >> 8) & 0xFF, w & 0xFF], axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("encoding",))
def arm_convert_batch(data, valid, ip, *, encoding: bool):
    """ARM BL over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    w = data.reshape(S, L // 4, 4).astype(_U32)
    hit = w[..., 3] == 0xEB
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    inword = (pos_in[None, :] + 4 <= valid[:, None].astype(_U32))
    hit = hit & inword
    dest = ((w[..., 2] << 16) | (w[..., 1] << 8) | w[..., 0]) << 2
    pos = pos_in[None, :] + ip[:, None].astype(_U32) + 8
    conv = jnp.where(encoding, dest + pos, dest - pos) >> 2
    out = jnp.where(hit[..., None],
                    jnp.stack([conv & 0xFF, (conv >> 8) & 0xFF,
                               (conv >> 16) & 0xFF, w[..., 3]], axis=-1),
                    w)
    return out.astype(jnp.uint8).reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def ppc_convert_batch(data, valid, ip, *, encoding: bool):
    """PPC bl over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    b = data.reshape(S, L // 4, 4)
    w = _words_be(b)
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    hit = (((b[..., 0] & 0xFC) == 0x48) & ((b[..., 3] & 0x3) == 1)
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    dest = w & jnp.uint32(0x03FFFFFC)
    pos = pos_in[None, :] + ip[:, None].astype(_U32)
    conv = jnp.where(encoding, dest + pos, dest - pos)
    neww = (jnp.uint32(0x48000000) | (conv & 0x03FFFFFC)
            | (w & jnp.uint32(0x00000003)))
    out = _unwords_be(jnp.where(hit, neww, w))
    return out.reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def sparc_convert_batch(data, valid, ip, *, encoding: bool):
    """SPARC call over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    b = data.reshape(S, L // 4, 4)
    w = _words_be(b)
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    hit = ((((b[..., 0] == 0x40) & ((b[..., 1] & 0xC0) == 0))
            | ((b[..., 0] == 0x7F) & ((b[..., 1] & 0xC0) == 0xC0)))
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    dest = w << 2
    pos = pos_in[None, :] + ip[:, None].astype(_U32)
    conv = jnp.where(encoding, dest + pos, dest - pos) >> 2
    # Bra.c:124 sign-replicates bit 22 over bits 22-29; only bits 0-21 survive
    conv = ((conv & jnp.uint32(0x003FFFFF)) | jnp.uint32(0x40000000)
            | jnp.where((conv & jnp.uint32(0x400000)) != 0,
                        jnp.uint32(0x3FC00000), jnp.uint32(0)))
    out = _unwords_be(jnp.where(hit, conv, w))
    return out.reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def armt_convert_batch(data, valid, ip, *, encoding: bool):
    """ARM Thumb BL pairs over [S, L] lanes (Bra.c:33-67).

    Exactly parallel: a candidate halfword pair needs
    ``(b[2h+1] & 0xF8) == 0xF0`` and ``(b[2h+3] & 0xF8) == 0xF8`` — the
    same byte cannot satisfy both masks, so consecutive candidates are
    mutually exclusive and the reference's ``i += 2`` skip never fires;
    every candidate converts independently (and the rewritten bytes
    preserve the 0xF0/0xF8 marker bits, so the candidate set is
    write-stable).
    """
    S, L = data.shape
    H = L // 2
    hw = data[:, :H * 2].reshape(S, H, 2).astype(_U32)
    a0 = hw[:, :, 0]                # halfword low bytes
    a1 = hw[:, :, 1]                # halfword high bytes
    b0, b1 = a0[:, :-1], a1[:, :-1]     # hw h
    b2, b3 = a0[:, 1:], a1[:, 1:]       # hw h+1
    pos_in = jnp.arange(H - 1, dtype=_U32) << 1
    hit = (((b1 & 0xF8) == 0xF0) & ((b3 & 0xF8) == 0xF8)
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    src = (((b1 & 0x7) << 19) | (b0 << 11) | ((b3 & 0x7) << 8) | b2) << 1
    pos = pos_in[None, :] + ip[:, None].astype(_U32) + 4
    dest = jnp.where(encoding, pos + src, src - pos) >> 1
    # hit[h] and hit[h+1] are disjoint, so the two write planes never
    # touch the same halfword column
    out0, out1 = a0, a1
    out0 = out0.at[:, :-1].set(jnp.where(hit, (dest >> 11) & 0xFF,
                                         out0[:, :-1]))
    out1 = out1.at[:, :-1].set(jnp.where(hit, 0xF0 | ((dest >> 19) & 0x7),
                                         out1[:, :-1]))
    out0 = out0.at[:, 1:].set(jnp.where(hit, dest & 0xFF, out0[:, 1:]))
    out1 = out1.at[:, 1:].set(jnp.where(hit, 0xF8 | ((dest >> 8) & 0x7),
                                        out1[:, 1:]))
    out = jnp.stack([out0, out1], axis=-1).astype(jnp.uint8)
    return out.reshape(S, H * 2)


# IA64 brl slot table: template -> 3-bit slot mask (BraIA64.c:5-12)
_IA64_BR_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     4, 4, 6, 6, 0, 0, 7, 7, 4, 4, 0, 0, 4, 4, 0, 0], np.int32)


@functools.partial(jax.jit, static_argnames=("encoding",))
def ia64_convert_batch(data, valid, ip, *, encoding: bool):
    """IA64 brl rewrite over [S, L] lanes (BraIA64.c:14-67).

    Stateless per 16-byte bundle; the three 41-bit slots are bitwise
    disjoint (the slot rewrite preserves bits outside its field), so
    bundles AND slots are fully parallel.  64-bit instruction windows are
    emulated with u32 pairs (lo32 of bytes 0-3, hi16 of bytes 4-5) since
    the device path runs without x64.
    """
    S, L = data.shape
    NB = L // 16
    b = data[:, :NB * 16].reshape(S, NB, 16).astype(_U32)
    tmpl_mask = jnp.take(jnp.asarray(_IA64_BR_TABLE), b[..., 0] & 0x1F)
    bundle_ok = ((jnp.arange(NB, dtype=_U32)[None, :] * 16 + 16)
                 <= valid[:, None].astype(_U32))
    pos = (jnp.arange(NB, dtype=_U32)[None, :] * 16
           + ip[:, None].astype(_U32))
    out = b
    for slot in range(3):
        bit_pos = 5 + slot * 41
        bp = bit_pos >> 3
        br = bit_pos & 7
        lo32 = (out[..., bp] | (out[..., bp + 1] << 8)
                | (out[..., bp + 2] << 16) | (out[..., bp + 3] << 24))
        hi16 = out[..., bp + 4] | (out[..., bp + 5] << 8)
        norm_lo = (lo32 >> br) | (hi16 << (32 - br))
        norm_hi = hi16 >> br
        is_brl = ((((norm_hi >> 5) & 0xF) == 0x5)
                  & (((norm_lo >> 9) & 0x7) == 0))
        hit = (((tmpl_mask >> slot) & 1) == 1) & is_brl & bundle_ok
        src = (((norm_lo >> 13) | (norm_hi << 19)) & 0xFFFFF) \
            | (((norm_hi >> 4) & 1) << 20)
        src = src << 4
        dest = jnp.where(encoding, pos + src, src - pos) >> 4
        nlo = (norm_lo & jnp.uint32(~np.uint32(0x7FFFF << 13))) \
            | ((dest & 0x7FFFF) << 13)
        nhi = (norm_hi & jnp.uint32(~np.uint32(0x11))) \
            | ((dest >> 19) & 1) | (((dest >> 20) & 1) << 4)
        new_lo32 = (lo32 & ((1 << br) - 1)) | (nlo << br)
        new_hi16 = ((nlo >> (32 - br)) | (nhi << br)) & 0xFFFF
        for j, val in ((0, new_lo32 & 0xFF), (1, (new_lo32 >> 8) & 0xFF),
                       (2, (new_lo32 >> 16) & 0xFF),
                       (3, (new_lo32 >> 24) & 0xFF),
                       (4, new_hi16 & 0xFF), (5, (new_hi16 >> 8) & 0xFF)):
            out = out.at[..., bp + j].set(
                jnp.where(hit, val, out[..., bp + j]))
    out = out.astype(jnp.uint8).reshape(S, NB * 16)
    if NB * 16 < L:
        out = jnp.concatenate([out, data[:, NB * 16:]], axis=1)
    return out


# x86 BCJ tables (Bra86.c:13-16)
_M2ALLOW = np.array([1, 1, 1, 0, 1, 0, 0, 0], np.int32)
_M2BIT = np.array([0, 1, 2, 2, 3, 3, 3, 3], np.int32)


@functools.partial(jax.jit, static_argnames=("encoding",))
def x86_convert_batch(data, valid, ip, *, encoding: bool):
    """x86 BCJ E8/E9 rewrite over [S, L] lanes (``Bra86.c:11-85``).

    Two-pass mask-then-patch: the reference's byte FSM only *steps* at
    E8/E9 candidate bytes, all its reads target bytes at or beyond the
    current candidate, and a conversion at ``q`` patches ``q+1..q+4``
    then resumes at ``q+5`` — so reads always see pre-patch (original)
    bytes.  The scan therefore runs candidate-to-candidate over a
    precomputed next-candidate table (iterations = max candidates in any
    lane, lanes lockstep), reading the immutable original buffer, and
    conversions scatter into a separate output copy.  The dest-mangling
    retry of ``Bra86.c:58-67`` runs as a bounded masked loop (the XOR
    flips the tested byte entirely, so it settles in <= 2 trips; 8 is a
    safety margin).  Bit-exact vs ``ops/filters.py:x86_convert`` with
    ``state=0`` over whole buffers.
    """
    S, L = data.shape
    d8 = data.astype(jnp.int32)
    rows = jnp.arange(S)
    limit = valid.astype(jnp.int32) - 4          # candidates: p < limit
    posL = jnp.arange(L, dtype=jnp.int32)
    cand = (d8 == 0xE8) | (d8 == 0xE9)
    # next-candidate table: nxt[p] = min candidate position >= p (else L)
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(cand, posL, L), reverse=True, axis=1)

    def take1(tbl, idx):
        return jnp.take_along_axis(
            tbl, jnp.clip(idx, 0, L - 1)[:, None], axis=1)[:, 0]

    def test86(b):
        return (b == 0) | (b == 0xFF)

    allow_t = jnp.asarray(_M2ALLOW)
    m2b_t = jnp.asarray(_M2BIT)

    def cond(c):
        it, ptr, _pp, _mk, _out = c
        return (it < L) & jnp.any(ptr < limit)

    def body(c):
        it, ptr, prev_pos, mask, out = c
        act = ptr < limit
        p = jnp.where(act, ptr, 0)
        d = p - prev_pos
        mask = jnp.where(d > 3, 0,
                         (mask << jnp.clip(d - 1, 0, 3)) & 7)
        prev_pos = jnp.where(act, p, prev_pos)
        allowed = jnp.take(allow_t, mask) != 0
        m2b = jnp.take(m2b_t, mask)
        bb1 = take1(d8, p + 4 - m2b)
        skip1 = (mask != 0) & (~allowed | test86(bb1))
        b4 = take1(d8, p + 4)
        convm = act & ~skip1 & test86(b4)
        skipm = act & ~convm
        mask = jnp.where(skipm, ((mask << 1) & 7) | 1, mask)
        # rel32 at p+1..p+4 (LE), from the ORIGINAL bytes
        src = take1(d8, p + 1).astype(_U32)
        src = src | (take1(d8, p + 2).astype(_U32) << 8)
        src = src | (take1(d8, p + 3).astype(_U32) << 16)
        src = src | (take1(d8, p + 4).astype(_U32) << 24)
        pos = (ip.astype(_U32) + p.astype(_U32) + 5)
        going = convm
        dest = jnp.zeros_like(src)
        idx8 = (m2b << 3).astype(_U32)
        xm = jnp.uint32(1) << jnp.clip(32 - idx8, 0, 31)
        xm = xm - 1
        for _t in range(8):
            d_t = jnp.where(encoding, src + pos, src - pos)
            dest = jnp.where(going, d_t, dest)
            bb = (d_t >> jnp.clip(24 - idx8, 0, 31)) & 0xFF
            cont = going & (mask != 0) & test86(bb)
            src = jnp.where(cont, d_t ^ xm, src)
            going = cont
        dest = dest & jnp.uint32(0x01FFFFFF)
        dest = jnp.where((dest & jnp.uint32(0x01000000)) != 0,
                         dest | jnp.uint32(0xFE000000), dest)
        for j in range(4):
            col = jnp.clip(p + 1 + j, 0, L - 1)
            old = out[rows, col]
            nb = ((dest >> (8 * j)) & 0xFF).astype(jnp.uint8)
            out = out.at[rows, col].set(jnp.where(convm, nb, old))
        ptr = jnp.where(convm, take1(nxt, p + 5),
                        jnp.where(act, take1(nxt, p + 1), ptr))
        return (it + 1, ptr, prev_pos, mask, out)

    init = (jnp.int32(0), nxt[:, 0], jnp.full((S,), -1, jnp.int32),
            jnp.zeros((S,), jnp.int32), data)
    _it, _ptr, _pp, _mk, out = jax.lax.while_loop(cond, body, init)
    return out


@functools.partial(jax.jit, static_argnames=("dist", "encoding"))
def delta_batch(data, valid, *, dist: int, encoding: bool):
    """Distance-``dist`` byte delta over [S, L] lanes.

    Decode (the hot direction): ``out[i] = data[i] + out[i - dist]`` is a
    prefix sum per residue class mod ``dist`` — reshape to
    ``[S, ceil(L/dist), dist]`` and cumsum along the middle axis (mod 256
    via uint8 wraparound).  Encode is the shifted subtract.
    """
    S, L = data.shape
    pad = (-L) % dist
    d = jnp.pad(data, ((0, 0), (0, pad)))
    cols = d.reshape(S, (L + pad) // dist, dist)
    if encoding:
        prev = jnp.pad(cols, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        out = (cols - prev).astype(jnp.uint8)
    else:
        out = jnp.cumsum(cols, axis=1, dtype=jnp.uint32).astype(jnp.uint8)
    out = out.reshape(S, L + pad)[:, :L]
    # bytes at/after each lane's valid length are left untouched
    idx = jnp.arange(L)
    return jnp.where(idx[None, :] < valid[:, None], out, data)


@jax.jit
def bcj2_decode_batch(main, main_len, call, call_len, jump, jump_len,
                      rc, rc_len, out_size):
    """BCJ2 4-stream decode over lanes (``Bcj2.c:28-127``).

    Each lane merges its own (main, call, jump, rc) streams: a
    range-coded adaptive flag per E8/E9/0F-8x site selects whether the
    next 4 output bytes come from the BE target streams.  Lockstep scan
    over a precomputed candidate superset (E8/E9/8x bytes of main — the
    ``prev == 0x0F`` half of the Jcc test is dynamic, checked in-loop),
    with a masked per-lane range decoder; output assembly (main-byte
    placement + rel32 insertions) is two vectorized scatters afterwards.
    Iterations = max candidate count in any lane, not bytes.

    Shapes: main/call/jump/rc are [S, *]; lengths and out_size are [S].
    Returns (out [S, out_cap] uint8, ok [S] bool) with
    out_cap = main.shape[1] + call.shape[1] + jump.shape[1] (a safe cap
    >= any decodable out_size).
    """
    S, Lm = main.shape
    rows = jnp.arange(S)
    m8 = main.astype(jnp.int32)
    posL = jnp.arange(Lm, dtype=jnp.int32)
    is_t = ((m8 & 0xFE) == 0xE8) | ((m8 & 0xF0) == 0x80)
    cand = is_t & (posL[None, :] < main_len[:, None])
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(cand, posL, Lm), reverse=True, axis=1)
    C = Lm  # conversions <= candidates <= Lm (record arrays sized [S, C]
    #         would be Lm-wide; instead scatter markers/rels into [S, Lm]
    #         keyed by main position — unique per conversion)

    def take1(tbl, idx):
        return jnp.take_along_axis(
            tbl, jnp.clip(idx, 0, tbl.shape[1] - 1)[:, None], axis=1)[:, 0]

    def be32(src, pos):
        v = take1(src, pos).astype(_U32) << 24
        v = v | (take1(src, pos + 1).astype(_U32) << 16)
        v = v | (take1(src, pos + 2).astype(_U32) << 8)
        return v | take1(src, pos + 3).astype(_U32)

    rc8 = rc.astype(jnp.int32)
    code0 = be32(rc8, jnp.zeros((S,), jnp.int32) + 1)
    top = jnp.uint32(1 << 24)

    def cond(c):
        return jnp.any(c[0] < Lm)

    def body(c):
        (ptr, nconv, cpos, jpos, lastc_m, last_top, rngv, code, rcpos,
         probs, marker, rels, err) = c
        act = ptr < Lm
        p = jnp.where(act, ptr, 0)
        b = take1(m8, p)
        prevb = jnp.where(p > 0, take1(m8, p - 1), 0)
        prev = jnp.where(lastc_m == p - 1, last_top, prevb)
        out_after = p + 4 * nconv + 1
        room = out_after < out_size
        isE8 = b == 0xE8
        isE9 = b == 0xE9
        candq = act & room & (isE8 | isE9
                              | (((b & 0xF0) == 0x80) & (prev == 0x0F)))
        pidx = jnp.where(isE8, 2 + prev, jnp.where(isE9, 0, 1))
        # masked range-decode of one adaptive bit per candidate lane
        need = candq & (rngv < top)
        byt = jnp.where(rcpos < rc_len, take1(rc8, rcpos), 0).astype(_U32)
        code = jnp.where(need, (code << 8) | byt, code)
        rngv = jnp.where(need, rngv << 8, rngv)
        rcpos = rcpos + jnp.where(need, 1, 0)
        pp = probs[rows, jnp.clip(pidx, 0, 257)]
        bound = (rngv >> 11) * pp.astype(_U32)
        bit1 = code >= bound
        newp = jnp.where(bit1, pp - (pp >> 5), pp + ((2048 - pp) >> 5))
        probs = probs.at[rows, jnp.clip(pidx, 0, 257)].set(
            jnp.where(candq, newp, pp))
        rngv = jnp.where(candq, jnp.where(bit1, rngv - bound, bound), rngv)
        code = jnp.where(candq & bit1, code - bound, code)
        convq = candq & bit1
        # 4 BE target bytes from call (E8) or jump (E9/Jcc)
        spos = jnp.where(isE8, cpos, jpos)
        dest = jnp.where(isE8, be32(call.astype(jnp.int32), spos),
                         be32(jump.astype(jnp.int32), spos))
        srclen = jnp.where(isE8, call_len, jump_len)
        err = err | (convq & (spos + 4 > srclen))
        rel = (dest - (out_after.astype(_U32) + 4)) & jnp.uint32(0xFFFFFFFF)
        cpos = cpos + jnp.where(convq & isE8, 4, 0)
        jpos = jpos + jnp.where(convq & ~isE8, 4, 0)
        marker = marker.at[rows, p].set(
            jnp.where(convq, 1, marker[rows, p]))
        rels = rels.at[rows, p].set(
            jnp.where(convq, rel, rels[rows, p]))
        lastc_m = jnp.where(convq, p, lastc_m)
        last_top = jnp.where(convq, (rel >> 24).astype(jnp.int32), last_top)
        nconv = nconv + jnp.where(convq, 1, 0)
        ptr = jnp.where(act, take1(nxt, p + 1), ptr)
        return (ptr, nconv, cpos, jpos, lastc_m, last_top, rngv, code,
                rcpos, probs, marker, rels, err)

    z = jnp.zeros((S,), jnp.int32)
    init = (nxt[:, 0], z, z, z, z - 2, z, jnp.full((S,), 0xFFFFFFFF, _U32),
            code0, z + 5, jnp.full((S, 258), 1024, jnp.int32),
            jnp.zeros((S, Lm), jnp.int32), jnp.zeros((S, Lm), _U32),
            jnp.zeros((S,), bool))
    (ptr, nconv, cpos, jpos, _lc, _lt, _r, _c, _rp, _pr, marker, rels,
     err) = jax.lax.while_loop(cond, body, init)

    # ---- vectorized output assembly ------------------------------------
    out_cap = Lm + call.shape[1] + jump.shape[1]
    excl = jnp.cumsum(marker, axis=1) - marker        # conversions before i
    out_idx = posL[None, :] + 4 * excl
    main_used = out_size - 4 * nconv
    keep = posL[None, :] < main_used[:, None]
    out = jnp.zeros((S, out_cap + 4), jnp.uint8)
    out = out.at[rows[:, None], jnp.where(keep, out_idx, out_cap)].set(
        jnp.where(keep, main, 0))
    for j in range(4):
        v = ((rels >> (8 * j)) & 0xFF).astype(jnp.uint8)
        idx = jnp.where(marker != 0, out_idx + 1 + j, out_cap)
        out = out.at[rows[:, None], idx].set(
            jnp.where(marker != 0, v, 0))
    ok = (~err) & (main_used >= 0) & (main_used <= main_len)
    return out[:, :out_cap], ok

_BATCHED = {"arm": arm_convert_batch, "armt": armt_convert_batch,
            "ppc": ppc_convert_batch, "sparc": sparc_convert_batch,
            "ia64": ia64_convert_batch, "x86": x86_convert_batch}


def convert_batch(name: str, data: np.ndarray, valid: np.ndarray,
                  ip: np.ndarray, *, encoding: bool) -> np.ndarray:
    """Dispatch a named branch filter over an [S, L] batch (L padded %4)."""
    fn = _BATCHED[name]
    return np.asarray(fn(jnp.asarray(data), jnp.asarray(valid),
                         jnp.asarray(ip), encoding=encoding))
