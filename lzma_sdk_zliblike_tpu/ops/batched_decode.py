"""Lane-parallel batched LZMA decoder (the TPU compute path).

The reference decodes one stream with one branchy scalar state machine
(``LzmaDec.c:131-426``).  The TPU form: N *independent* streams decode in
lockstep, one packet (literal/match/short-rep) per lane per
``lax.while_loop`` iteration, with every range-coder bit decision executed
as masked vector ops across lanes.

TPU-first design decisions (v2 — no per-lane gather/scatter on the model):

* **Probability model = per-family, per-tree-level arrays.**  A flat
  ``probs[lane, idx]`` table needs per-lane dynamic gather/scatter, which
  TPU vector units do not do well.  Instead each context family (is_match,
  rep flags, pos-slot tree, length coders, literal tree…) is its own
  ``[N, W]`` array, and bit-tree walks are decomposed by level so each
  step touches only the ``W = contexts × 2^level`` slice it can actually
  address.  Reads are one-hot select-reduces; adaptive updates are
  elementwise ``where`` — pure VPU work that XLA keeps in place in the
  loop carry.
* **Register-resident input lookahead.**  Renormalization consumes ≤ 1
  byte per bit; a carried 4-byte ``uint32`` lookahead register makes the
  renorm itself memory-free, refilled by one ``[N, 4]`` gather at a few
  fixed points per packet.
* **LZ77 copies as K-wide modulo-gather steps** — ``src[i] = pos - dist +
  (i mod dist)`` never reads a byte written in the same step, so
  overlapping matches need no serial loop.
* lane = one LZMA2 dict-reset group (``Lzma2Dec.c:14-26`` reset
  semantics); multi-chunk groups carry model state across jitted chunk
  steps, with per-chunk state-reset masks.

All shapes static; all lanes of a batch share (lc, lp, pb).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lzma import spec as S

_U32 = jnp.uint32
_I32 = jnp.int32
_TOP = np.uint32(S.RC_TOP)
_MASK32 = np.uint32(0xFFFFFFFF)

COPY_WIDTH = 32  # bytes moved per vectorized copy step


# ---------------------------------------------------------------------------
# probability-model family layout
# ---------------------------------------------------------------------------

def _family_shapes(lc: int, lp: int) -> dict[str, int]:
    """Widths of every model family array (second dim of [N, W])."""
    nls = 1 << (lc + lp)
    shapes = {
        "is_match": S.NUM_STATES << S.NUM_POS_BITS_MAX,      # state<<4 | ps
        "is_rep": S.NUM_STATES,
        "is_rep_g0": S.NUM_STATES,
        "is_rep_g1": S.NUM_STATES,
        "is_rep_g2": S.NUM_STATES,
        "is_rep0_long": S.NUM_STATES << S.NUM_POS_BITS_MAX,
        # spec-pos reverse trees (computed flat idx) with the align tree
        # appended at offset NUM_SPEC_POS — they serve disjoint lane sets in
        # the same decode phase, so one family loop handles both
        "spec_align": S.NUM_SPEC_POS + S.ALIGN_TABLE_SIZE,
        "len_choice": 2 * 2,                                 # coder*2+which
    }
    # pos-slot tree levels: idx = lt_ps * 2^k + (m - 2^k)
    for k in range(S.NUM_POS_SLOT_BITS):
        shapes[f"slot_{k}"] = S.NUM_LEN_TO_POS_STATES << k
    # len low/mid levels: idx = ((coder*2+ismid)*16 + ps) * 2^k + (m - 2^k)
    for k in range(S.LEN_LOW_BITS):
        shapes[f"lowmid_{k}"] = (2 * 2 * S.POS_STATES_MAX) << k
    # len high levels: idx = coder * 2^k + (m - 2^k)
    for k in range(S.LEN_HIGH_BITS):
        shapes[f"high_{k}"] = 2 << k
    # literal levels: idx = (lit_state*3 + plane) * 2^k + (m - 2^k)
    for k in range(8):
        shapes[f"lit_{k}"] = (nls * 3) << k
    return shapes


class LaneState(NamedTuple):
    """Per-lane decoder state carried across chunk steps."""

    fams: dict[str, jax.Array]  # family name -> [N, W] int32
    dic: jax.Array              # [N, dic_cap + COPY_WIDTH] int32 bytes
    outpos: jax.Array           # [N] int32
    state: jax.Array            # [N] int32
    rep0: jax.Array             # [N] uint32 (distance - 1)
    rep1: jax.Array
    rep2: jax.Array
    rep3: jax.Array
    last_byte: jax.Array        # [N] int32 — dic[outpos-1] mirror


def init_lane_state(n_lanes: int, lc: int, lp: int, dic_cap: int) -> LaneState:
    """Allocate carried lane state.

    The dic row is padded by COPY_WIDTH scratch bytes: masked-off lanes'
    scatter writes are directed there (TPU clamps out-of-bounds scatter
    indices rather than dropping them).
    """
    z32 = jnp.zeros((n_lanes,), _I32)
    zu = jnp.zeros((n_lanes,), _U32)
    fams = {name: jnp.full((n_lanes, w), S.PROB_INIT, _I32)
            for name, w in _family_shapes(lc, lp).items()}
    return LaneState(
        fams=fams,
        dic=jnp.zeros((n_lanes, dic_cap + COPY_WIDTH), _I32),
        outpos=z32, state=z32, rep0=zu, rep1=zu, rep2=zu, rep3=zu,
        last_byte=z32,
    )


# ---------------------------------------------------------------------------
# step-local state
# ---------------------------------------------------------------------------

class StepState(NamedTuple):
    lane: LaneState
    rng: jax.Array        # [N] uint32
    code: jax.Array       # [N] uint32
    la: jax.Array         # [N] uint32 — lookahead, next byte in top 8 bits
    la_cnt: jax.Array     # [N] int32 — valid lookahead bytes (0..4)
    inpos: jax.Array      # [N] int32 — next *prefetch* position in src
    consumed: jax.Array   # [N] int32 — bytes actually consumed by the coder
    err: jax.Array        # [N] bool
    pend_len: jax.Array   # [N] int32
    pend_dist: jax.Array  # [N] int32


def _fetch_be32(src32, pos):
    """Read 4 bytes at byte offset `pos` as a BE u32, from LE-word-packed
    input (one [N,2] int32 gather + register shifts — u8 gathers lower to a
    very slow TPU path, word gathers do not)."""
    nwords = src32.shape[1]
    word = pos >> 2
    r = (pos & 3).astype(_U32) << 3
    idx = jnp.stack([jnp.clip(word, 0, nwords - 1),
                     jnp.clip(word + 1, 0, nwords - 1)], axis=1)
    w = jnp.take_along_axis(src32, idx, axis=1).astype(_U32)

    def bswap(x):
        return (((x & 0xFF) << 24) | ((x & 0xFF00) << 8)
                | ((x >> 8) & 0xFF00) | (x >> 24))

    hi = bswap(w[:, 0])
    lo = bswap(w[:, 1])
    # r == 0 → hi only (shift-by-32 is undefined; mask it)
    out = (hi << r) | jnp.where(r == 0, 0, lo >> (32 - r))
    return out


def _refill(st: StepState, src32, do):
    """Top the lookahead register up to 4 bytes."""
    need = do & (st.la_cnt < 4)
    fetched = _fetch_be32(src32, st.inpos)
    sh = (st.la_cnt << 3).astype(_U32)
    la = jnp.where(need, st.la | (fetched >> sh), st.la)
    inpos = jnp.where(need, st.inpos + (4 - st.la_cnt), st.inpos)
    la_cnt = jnp.where(need, 4, st.la_cnt)
    return st._replace(la=la, la_cnt=la_cnt, inpos=inpos)


def _renorm(st: StepState, pack_len, do):
    """Masked single renormalization step (register-only)."""
    need = (st.rng < _TOP) & do
    over = need & (st.consumed >= pack_len)
    byte = st.la >> 24
    return st._replace(
        rng=jnp.where(need, st.rng << 8, st.rng),
        code=jnp.where(need, (st.code << 8) | byte, st.code),
        la=jnp.where(need, st.la << 8, st.la),
        la_cnt=jnp.where(need, st.la_cnt - 1, st.la_cnt),
        consumed=jnp.where(need, st.consumed + 1, st.consumed),
        err=st.err | over,
    ), need


def _bit(st: StepState, pack_len, fam: str, idx, do):
    """Masked adaptive-bit decode against family array `fam`.

    The family array is threaded through ``st.lane.fams`` so its lineage is
    a clean chain — XLA then updates the loop-carry buffer in place instead
    of copying it every bit-step.

    Returns (st, bit[N] int32: 1 = the '1' branch, 0 otherwise and for
    inactive lanes).
    """
    st, _ = _renorm(st, pack_len, do)
    fams = dict(st.lane.fams)
    F = fams[fam]
    w = F.shape[1]
    oh = (jnp.arange(w, dtype=_I32)[None, :] == idx[:, None]) & do[:, None]
    p = jnp.sum(jnp.where(oh, F, 0), axis=1)
    bound = (st.rng >> S.RC_BIT_MODEL_TOTAL_BITS) * p.astype(_U32)
    bit0 = st.code < bound
    newp = jnp.where(bit0, p + ((S.RC_BIT_MODEL_TOTAL - p) >> S.RC_MOVE_BITS),
                     p - (p >> S.RC_MOVE_BITS))
    fams[fam] = jnp.where(oh, newp[:, None], F)
    rng = jnp.where(do, jnp.where(bit0, bound, st.rng - bound), st.rng)
    code = jnp.where(do, jnp.where(bit0, st.code, st.code - bound), st.code)
    bit = jnp.where(do & ~bit0, 1, 0).astype(_I32)
    return st._replace(rng=rng, code=code,
                       lane=st.lane._replace(fams=fams)), bit


def _gather_dic(dic, pos):
    safe = jnp.clip(pos, 0, dic.shape[1] - 1)
    return jnp.take_along_axis(dic, safe[:, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# the chunk step
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("lc", "lp", "pb"))
def lzma_chunk_step(lane: LaneState, src, pack_len, unpack_len,
                    reset_state_mask, active, *, lc: int = 3, lp: int = 0,
                    pb: int = 2):
    """Decode one LZMA chunk on every active lane.

    Returns ``(lane', ok[N] bool, consumed[N] int32, n_iters int32)``.
    """
    n = src.shape[0]
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1
    nls3 = (1 << (lc + lp)) * 3

    # --- per-chunk resets -------------------------------------------------
    rs = reset_state_mask & active
    fams = {k: jnp.where(rs[:, None], S.PROB_INIT, v)
            for k, v in lane.fams.items()}
    zu = jnp.zeros((n,), _U32)
    lane = lane._replace(
        fams=fams,
        state=jnp.where(rs, 0, lane.state),
        rep0=jnp.where(rs, zu, lane.rep0),
        rep1=jnp.where(rs, zu, lane.rep1),
        rep2=jnp.where(rs, zu, lane.rep2),
        rep3=jnp.where(rs, zu, lane.rep3),
    )

    # LE-word-packed input: u8 gathers lower to a slow TPU path, i32 ones
    # do not.  Pad to a word multiple (+1 spare word for the 2-word fetch).
    pad = (-src.shape[1]) % 4 + 4
    srcp = jnp.pad(src, ((0, 0), (0, pad))).reshape(n, -1, 4).astype(_U32)
    src32 = (srcp[:, :, 0] | (srcp[:, :, 1] << 8) | (srcp[:, :, 2] << 16)
             | (srcp[:, :, 3] << 24)).astype(jnp.int32)

    # --- range coder init: byte0 == 0, code = BE32(bytes 1..4) ------------
    b = [src[:, i].astype(_U32) for i in range(5)]
    code0 = (b[1] << 24) | (b[2] << 16) | (b[3] << 8) | b[4]
    init_err = active & ((b[0] != 0) | (pack_len < 5))
    out_limit = lane.outpos + unpack_len

    st = StepState(
        lane=lane,
        rng=jnp.full((n,), _MASK32, _U32),
        code=code0,
        la=jnp.zeros((n,), _U32),
        la_cnt=jnp.zeros((n,), _I32),
        inpos=jnp.full((n,), 5, _I32),
        consumed=jnp.full((n,), 5, _I32),
        err=init_err,
        pend_len=jnp.zeros((n,), _I32),
        pend_dist=jnp.ones((n,), _I32),
    )

    def cond(c):
        st, _it = c
        busy = active & ~st.err & (
            (st.lane.outpos < out_limit) | (st.pend_len > 0))
        return jnp.any(busy)

    def body_wrap(c):
        st, it = c
        return (body(st), it + 1)

    def body(st: StepState):
        # small [N] vectors are safe to hold as locals (copies are trivial);
        # the big arrays (fams, dic) are threaded through `st` immediately so
        # XLA keeps their loop-carry buffers updated in place.
        outpos = st.lane.outpos
        state = st.lane.state
        rep0, rep1, rep2, rep3 = (st.lane.rep0, st.lane.rep1, st.lane.rep2,
                                  st.lane.rep3)
        # lanes still draining a match copy (pend_len > 0) skip packet decode
        do = active & ~st.err & (outpos < out_limit) & (st.pend_len == 0)
        pos_state = outpos & pb_mask
        rows = jnp.arange(n)
        scratch = st.lane.dic.shape[1] - COPY_WIDTH

        st = _refill(st, src32, do)
        st, bm = _bit(st, pack_len, "is_match",
                            (state << S.NUM_POS_BITS_MAX) + pos_state, do)
        is_lit = do & (bm == 0)
        is_mat = do & (bm == 1)

        # ---- literal -----------------------------------------------------
        prev = jnp.where(outpos > 0, st.lane.last_byte, 0)
        lit_state = ((outpos & lp_mask) << lc) + (prev >> (8 - lc))
        mb = _gather_dic(st.lane.dic, outpos - rep0.astype(_I32) - 1)
        in_ms = state >= 7
        matched = is_lit & in_ms
        mb = jnp.where(in_ms, mb, 0)
        plane_hot = jnp.where(matched, 1, 0)   # 0 normal; 1/2 matched planes
        sym = jnp.ones((n,), _I32)
        for k in range(8):
            # lookahead budget: entry guarantees ≥3 bytes (refill before
            # is_match gave 4, is_match took ≤1) → refill at k=3 and k=7
            if k in (3, 7):
                st = _refill(st, src32, is_lit)
            mb = mb << 1
            mbit = (mb >> 8) & 1
            # plane: 0 = normal; matched: 1 when context bit (offs) set path…
            plane = jnp.where(matched, 1 + mbit, 0)
            idx = (lit_state * 3 + plane) * (1 << k) + (sym - (1 << k))
            st, bl = _bit(st, pack_len, f"lit_{k}", idx, is_lit)
            sym = jnp.where(is_lit, (sym << 1) | bl, sym)
            # once decoded bit != match bit, fall out of matched mode
            matched = matched & (bl == mbit)
        lit_byte = (sym & 0xFF)
        wpos = jnp.where(is_lit, outpos, scratch)
        st = st._replace(lane=st.lane._replace(
            dic=st.lane.dic.at[rows, wpos].set(lit_byte)))
        outpos = jnp.where(is_lit, outpos + 1, outpos)
        last_byte = jnp.where(is_lit, lit_byte, st.lane.last_byte)
        lit_next = jnp.where(state < 4, 0,
                             jnp.where(state < 10, state - 3, state - 6))
        state = jnp.where(is_lit, lit_next, state)

        # ---- match family ------------------------------------------------
        st, br = _bit(st, pack_len, "is_rep", state, is_mat)
        simple = is_mat & (br == 0)
        rep = is_mat & (br == 1)

        st = _refill(st, src32, rep)  # g0 + (r0long | g1+g2) ≤ 3 renorms
        st, bg0 = _bit(st, pack_len, "is_rep_g0", state, rep)
        rep_g0 = rep & (bg0 == 0)
        st, b0l = _bit(st, pack_len, "is_rep0_long",
                             (state << S.NUM_POS_BITS_MAX) + pos_state, rep_g0)
        shortrep = rep_g0 & (b0l == 0)
        longrep0 = rep_g0 & (b0l == 1)
        repg = rep & (bg0 == 1)
        st, bg1 = _bit(st, pack_len, "is_rep_g1", state, repg)
        use_r1 = repg & (bg1 == 0)
        repg2 = repg & (bg1 == 1)
        st, bg2 = _bit(st, pack_len, "is_rep_g2", state, repg2)
        use_r2 = repg2 & (bg2 == 0)
        use_r3 = repg2 & (bg2 == 1)

        rot = use_r1 | use_r2 | use_r3
        dist_rep = jnp.where(use_r1, rep1, jnp.where(use_r2, rep2, rep3))
        rep3 = jnp.where(use_r3, rep2, rep3)
        rep2 = jnp.where(use_r2 | use_r3, rep1, rep2)
        rep1 = jnp.where(rot, rep0, rep1)
        rep0 = jnp.where(rot, dist_rep, rep0)

        sr_byte = _gather_dic(st.lane.dic, outpos - rep0.astype(_I32) - 1)
        wpos = jnp.where(shortrep, outpos, scratch)
        st = st._replace(lane=st.lane._replace(
            dic=st.lane.dic.at[rows, wpos].set(sr_byte)))
        outpos = jnp.where(shortrep, outpos + 1, outpos)
        last_byte = jnp.where(shortrep, sr_byte, last_byte)
        state = jnp.where(shortrep, jnp.where(state < 7, 9, 11), state)

        # ---- length ------------------------------------------------------
        len_lanes = simple | longrep0 | rot
        coder = jnp.where(simple, 0, 1)
        st = _refill(st, src32, len_lanes)
        st, c1 = _bit(st, pack_len, "len_choice", coder * 2,
                            len_lanes)
        st, c2 = _bit(st, pack_len, "len_choice", coder * 2 + 1,
                            len_lanes & (c1 == 1))
        low = len_lanes & (c1 == 0)
        mid = len_lanes & (c1 == 1) & (c2 == 0)
        high = len_lanes & (c1 == 1) & (c2 == 1)
        lowmid = low | mid
        ismid = jnp.where(mid, 1, 0)
        m = jnp.ones((n,), _I32)
        for k in range(S.LEN_LOW_BITS):
            if k == 0:
                st = _refill(st, src32, lowmid)
            idx = (((coder * 2 + ismid) * S.POS_STATES_MAX + pos_state)
                   * (1 << k)) + (m - (1 << k))
            st, blm = _bit(st, pack_len, f"lowmid_{k}", idx, lowmid)
            m = jnp.where(lowmid, (m << 1) | blm, m)
        lm_sym = jnp.where(lowmid, m - S.LEN_LOW_SYMBOLS, 0)
        m = jnp.ones((n,), _I32)
        for k in range(S.LEN_HIGH_BITS):
            if k in (0, 4):
                st = _refill(st, src32, high)
            idx = coder * (1 << k) + (m - (1 << k))
            st, bh = _bit(st, pack_len, f"high_{k}", idx, high)
            m = jnp.where(high, (m << 1) | bh, m)
        hi_sym = jnp.where(high, m - S.LEN_HIGH_SYMBOLS, 0)
        length = jnp.where(
            low, S.MATCH_MIN_LEN + lm_sym,
            jnp.where(mid, S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS + lm_sym,
                      S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS + S.LEN_MID_SYMBOLS
                      + hi_sym))
        state = jnp.where(simple, jnp.where(state < 7, 7, 10),
                          jnp.where(longrep0 | rot,
                                    jnp.where(state < 7, 8, 11), state))

        # ---- distance (simple matches) ----------------------------------
        lt_ps = jnp.minimum(length - S.MATCH_MIN_LEN,
                            S.NUM_LEN_TO_POS_STATES - 1)
        st = _refill(st, src32, simple)
        m = jnp.ones((n,), _I32)
        for k in range(S.NUM_POS_SLOT_BITS):
            if k == 4:
                st = _refill(st, src32, simple)
            idx = lt_ps * (1 << k) + (m - (1 << k))
            st, bs = _bit(st, pack_len, f"slot_{k}", idx, simple)
            m = jnp.where(simple, (m << 1) | bs, m)
        slot = jnp.where(simple, m - (1 << S.NUM_POS_SLOT_BITS), 0)

        big = simple & (slot >= 4)
        nd = jnp.maximum((slot >> 1) - 1, 0)
        dist = jnp.where(big,
                         (2 | (slot & 1)).astype(_U32) << nd.astype(_U32),
                         slot.astype(_U32))
        specs = big & (slot < S.END_POS_MODEL_INDEX)
        spec_base = dist.astype(_I32) - slot - 1

        # direct bits (register renorm, ≤ 26 via dynamic while)
        directs = big & (slot >= S.END_POS_MODEL_INDEX)
        ndirect = jnp.where(directs, nd - S.NUM_ALIGN_BITS, 0)

        # the nested loop carries ONLY the small coder registers — carrying
        # the full StepState (fams/dic) would make XLA materialize megabytes
        # of loop-carry around the nested while every outer iteration
        def dcond(c):
            return jnp.any(c[-1] > 0)

        def dbody(c):
            rng, code, la, la_cnt, inpos, consumed, derr, dval, left = c
            act = left > 0
            # inline refill (≤1 byte per bit consumed; refill when empty)
            need_re = act & (la_cnt < 1)
            fetched = _fetch_be32(src32, inpos)
            sh = (la_cnt << 3).astype(_U32)
            la = jnp.where(need_re, la | (fetched >> sh), la)
            inpos = jnp.where(need_re, inpos + (4 - la_cnt), inpos)
            la_cnt = jnp.where(need_re, 4, la_cnt)
            # renorm
            need = (rng < _TOP) & act
            derr = derr | (need & (consumed >= pack_len))
            code = jnp.where(need, (code << 8) | (la >> 24), code)
            rng = jnp.where(need, rng << 8, rng)
            la = jnp.where(need, la << 8, la)
            la_cnt = jnp.where(need, la_cnt - 1, la_cnt)
            consumed = jnp.where(need, consumed + 1, consumed)
            # direct bit
            rng = jnp.where(act, rng >> 1, rng)
            code2 = code - rng
            t = jnp.zeros_like(code2) - (code2 >> 31)
            code = jnp.where(act, code2 + (rng & t), code)
            dval = jnp.where(act, (dval << 1) + (t + 1).astype(_U32), dval)
            return (rng, code, la, la_cnt, inpos, consumed, derr, dval,
                    jnp.where(act, left - 1, left))

        (rng_, code_, la_, lac_, inp_, cons_, derr_, dval, _left) = \
            jax.lax.while_loop(dcond, dbody,
                               (st.rng, st.code, st.la, st.la_cnt, st.inpos,
                                st.consumed, st.err,
                                jnp.zeros_like(dist), ndirect))
        st = st._replace(rng=rng_, code=code_, la=la_, la_cnt=lac_,
                         inpos=inp_, consumed=cons_, err=derr_)

        # merged reverse trees: spec-pos (slots 4..13, ≤ 5 bits) and align
        # (4 bits, after the direct bits) — disjoint lane sets, one loop
        st = _refill(st, src32, specs | directs)
        m = jnp.ones((n,), _I32)
        sym_r = jnp.zeros((n,), _I32)
        for i in range(5):
            act_s = specs & (i < nd)
            act_a = directs & (i < S.NUM_ALIGN_BITS)
            act = act_s | act_a
            if i == 4:
                st = _refill(st, src32, act)
            idx = jnp.where(act_a, S.NUM_SPEC_POS + m, spec_base + m)
            st, bsp = _bit(st, pack_len, "spec_align", idx, act)
            m = jnp.where(act, (m << 1) | bsp, m)
            sym_r = jnp.where(act, sym_r | (bsp << i), sym_r)
        dist = jnp.where(specs, dist + sym_r.astype(_U32), dist)
        dist = jnp.where(directs,
                         dist + (dval << S.NUM_ALIGN_BITS)
                         + sym_r.astype(_U32), dist)

        marker = simple & (dist == _MASK32)
        rep3 = jnp.where(simple, rep2, rep3)
        rep2 = jnp.where(simple, rep1, rep2)
        rep1 = jnp.where(simple, rep0, rep1)
        rep0 = jnp.where(simple, dist, rep0)

        # ---- validity + schedule copy -----------------------------------
        match_lanes = len_lanes
        bad = match_lanes & (rep0 + 1 > outpos.astype(_U32))
        overrun = match_lanes & (outpos + length > out_limit)
        err = st.err | marker | bad | overrun
        # preserve in-flight copies of lanes that skipped packet decode
        pend_len = jnp.where(match_lanes, jnp.where(err, 0, length),
                             st.pend_len)
        pend_dist = jnp.where(match_lanes, rep0.astype(_I32) + 1,
                              st.pend_dist)

        lane = st.lane._replace(outpos=outpos, state=state, rep0=rep0,
                                rep1=rep1, rep2=rep2, rep3=rep3,
                                last_byte=last_byte)
        st = st._replace(lane=lane, err=err, pend_len=pend_len,
                         pend_dist=pend_dist)

        # ---- one inline copy step (COPY_WIDTH bytes per iteration) -------
        # lanes with pend_len > 0 skip packet decode (the `do` mask) and
        # advance their match copy here; a nested while_loop would force XLA
        # to materialize the dic carry around it every iteration
        dic_ = st.lane.dic
        op = st.lane.outpos
        pl = st.pend_len
        pd = jnp.maximum(st.pend_dist, 1)
        k = jnp.arange(COPY_WIDTH, dtype=_I32)[None, :]
        srcpos = op[:, None] - pd[:, None] + (k % pd[:, None])
        vals = jnp.take_along_axis(
            dic_, jnp.clip(srcpos, 0, dic_.shape[1] - 1), axis=1)
        wmask = k < pl[:, None]
        widx = jnp.where(wmask, op[:, None] + k,
                         dic_.shape[1] - COPY_WIDTH + k)
        dic_ = dic_.at[jnp.arange(n)[:, None], widx].set(vals)
        step = jnp.minimum(pl, COPY_WIDTH)
        nlast = _gather_dic(dic_, op + step - 1)
        st = st._replace(
            lane=st.lane._replace(
                dic=dic_, outpos=op + step,
                last_byte=jnp.where(pl > 0, nlast, st.lane.last_byte)),
            pend_len=pl - step)
        return st

    st, n_iters = jax.lax.while_loop(cond, body_wrap, (st, jnp.int32(0)))

    # trailing renormalize (reference LzmaDec.c:412): exact consumption
    tail = active & ~st.err & (st.rng < _TOP) & (st.consumed < pack_len)
    st = st._replace(consumed=jnp.where(tail, st.consumed + 1, st.consumed))

    ok = (~st.err) & (st.lane.outpos == out_limit) & (st.consumed == pack_len)
    ok = jnp.where(active, ok, True)
    return st.lane, ok, st.consumed, n_iters
