"""Lane-parallel batched LZMA decoder (the TPU compute path).

The reference decodes one stream with one branchy scalar state machine
(``LzmaDec.c:131-426``).  A TPU cannot run that; what it can run is N
*independent* streams in lockstep, with every range-coder bit decision
executed as a masked vector operation across lanes:

* lane  = one LZMA2 dict-reset group (the data-parallel unit the format
  gives us: ``Lzma2Dec.c:14-26`` reset semantics);
* one outer ``lax.while_loop`` iteration decodes ONE packet (literal /
  match / short-rep) per active lane — probability reads are per-lane
  gathers, renormalization is a masked byte shift-in, model updates are
  per-lane scatters;
* LZ77 match copies run as K-byte vectorized steps using the modulo trick
  (``src[i] = pos - dist + i % dist``), which never reads a byte written in
  the same step, so overlapping matches need no serial inner loop;
* multi-chunk groups are handled by calling the jitted chunk-step once per
  chunk index with carried per-lane model state (probs/state/reps/dic),
  matching LZMA2 state-reset flags.

All shapes are static (pad to ``pack_cap`` / ``dic_cap``); all lanes of a
batch share (lc, lp, pb) — the host partitions work accordingly.
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


class LaneState(NamedTuple):
    """Per-lane decoder state carried across chunk steps."""

    probs: jax.Array     # [N, NPROBS] int32
    dic: jax.Array       # [N, dic_cap] uint8 — group output == dictionary
    outpos: jax.Array    # [N] int32, position within the group
    state: jax.Array     # [N] int32, LZ state 0..11
    rep0: jax.Array      # [N] uint32 (stored as distance-1)
    rep1: jax.Array
    rep2: jax.Array
    rep3: jax.Array


class StepState(NamedTuple):
    """Full loop state inside one chunk step."""

    lane: LaneState
    rng: jax.Array       # [N] uint32
    code: jax.Array      # [N] uint32
    inpos: jax.Array     # [N] int32 (index into src row)
    err: jax.Array       # [N] bool
    pend_len: jax.Array  # [N] int32 — bytes of match left to copy
    pend_dist: jax.Array  # [N] int32


def init_lane_state(n_lanes: int, num_probs: int, dic_cap: int) -> LaneState:
    """Allocate carried lane state.

    The dic row is padded by COPY_WIDTH scratch bytes: masked-off lanes'
    scatter writes are directed there (TPU clamps out-of-bounds scatter
    indices rather than dropping them, so a -1 sentinel would corrupt the
    last real byte).
    """
    z32 = jnp.zeros((n_lanes,), _I32)
    zu = jnp.zeros((n_lanes,), _U32)
    return LaneState(
        probs=jnp.full((n_lanes, num_probs), S.PROB_INIT, _I32),
        dic=jnp.zeros((n_lanes, dic_cap + COPY_WIDTH), jnp.uint8),
        outpos=z32, state=z32, rep0=zu, rep1=zu, rep2=zu, rep3=zu,
    )


def _decode_bit(st: StepState, src, in_limit, idx, do):
    """One masked adaptive-bit decode across all lanes.

    ``idx``: [N] int32 prob index. ``do``: [N] bool — lanes taking this
    decision. Returns (new_st, bit[N] int32 with bit==1 meaning the '1'
    branch; bit forced 0 on inactive lanes).
    """
    lane = st.lane
    rng, code, inpos = st.rng, st.code, st.inpos
    # renormalize (before the decision, reference macro order)
    need = (rng < _TOP) & do
    over = need & (inpos >= in_limit)
    byte_idx = jnp.clip(inpos, 0, src.shape[1] - 1)
    byte = jnp.take_along_axis(src, byte_idx[:, None], axis=1)[:, 0].astype(_U32)
    rng = jnp.where(need, rng << 8, rng)
    code = jnp.where(need, (code << 8) | byte, code)
    inpos = jnp.where(need, inpos + 1, inpos)
    err = st.err | over

    rows = jnp.arange(idx.shape[0])
    safe_idx = jnp.clip(idx, 0, lane.probs.shape[1] - 1)
    p = lane.probs[rows, safe_idx]
    bound = (rng >> S.RC_BIT_MODEL_TOTAL_BITS) * p.astype(_U32)
    bit0 = code < bound
    new_rng = jnp.where(bit0, bound, rng - bound)
    new_code = jnp.where(bit0, code, code - bound)
    new_p = jnp.where(bit0,
                      p + ((S.RC_BIT_MODEL_TOTAL - p) >> S.RC_MOVE_BITS),
                      p - (p >> S.RC_MOVE_BITS))
    # lanes outside `do` keep their original state entirely
    rng = jnp.where(do, new_rng, st.rng)
    code = jnp.where(do, new_code, st.code)
    inpos = jnp.where(do, inpos, st.inpos)
    probs = lane.probs.at[rows, safe_idx].set(jnp.where(do, new_p, p))
    bit = jnp.where(do & ~bit0, 1, 0).astype(_I32)
    return st._replace(lane=lane._replace(probs=probs), rng=rng, code=code,
                       inpos=inpos, err=err), bit


def _decode_tree(st, src, in_limit, base, num_bits, do):
    """Masked bit-tree decode: returns symbol in [0, 2^num_bits)."""
    m = jnp.ones_like(base)
    for _ in range(num_bits):
        st, b = _decode_bit(st, src, in_limit, base + m, do)
        m = jnp.where(do, (m << 1) | b, m)
    return st, jnp.where(do, m - (1 << num_bits), 0)


def _decode_tree_reverse_dyn(st, src, in_limit, base, num_bits, max_bits, do):
    """Masked reverse bit-tree with per-lane bit count ≤ max_bits."""
    m = jnp.ones_like(base)
    sym = jnp.zeros_like(base)
    for i in range(max_bits):
        act = do & (i < num_bits)
        st, b = _decode_bit(st, src, in_limit, base + m, act)
        m = jnp.where(act, (m << 1) | b, m)
        sym = jnp.where(act, sym | (b << i), sym)
    return st, sym


def _gather_dic(dic, pos):
    """dic[lane, pos] with clamped indices → [N] int32."""
    safe = jnp.clip(pos, 0, dic.shape[1] - 1)
    return jnp.take_along_axis(dic, safe[:, None], axis=1)[:, 0].astype(_I32)


@functools.partial(jax.jit, static_argnames=("lc", "lp", "pb"))
def lzma_chunk_step(lane: LaneState, src, pack_len, unpack_len,
                    reset_state_mask, active, *, lc: int = 3, lp: int = 0,
                    pb: int = 2):
    """Decode one LZMA chunk on every active lane.

    Args:
      lane: carried per-lane state (probs/dic/outpos/state/reps).
      src: [N, pack_cap] uint8 packed chunk payloads (range-coded data).
      pack_len / unpack_len: [N] int32 sizes; lanes with active=False ignored.
      reset_state_mask: [N] bool — LZMA2 mode ≥ 1 for this chunk.
      active: [N] bool.

    Returns (lane', ok[N] bool, consumed[N] int32).
    """
    n = src.shape[0]
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1

    # --- per-chunk resets -------------------------------------------------
    rs = reset_state_mask & active
    probs = jnp.where(rs[:, None], jnp.full_like(lane.probs, S.PROB_INIT),
                      lane.probs)
    state = jnp.where(rs, 0, lane.state)
    zu = jnp.zeros((n,), _U32)
    rep0 = jnp.where(rs, zu, lane.rep0)
    rep1 = jnp.where(rs, zu, lane.rep1)
    rep2 = jnp.where(rs, zu, lane.rep2)
    rep3 = jnp.where(rs, zu, lane.rep3)
    lane = lane._replace(probs=probs, state=state, rep0=rep0, rep1=rep1,
                         rep2=rep2, rep3=rep3)

    # --- range coder init: byte0 must be 0, code = BE32(bytes 1..4) -------
    b = [src[:, i].astype(_U32) for i in range(5)]
    code0 = (b[1] << 24) | (b[2] << 16) | (b[3] << 8) | b[4]
    init_err = active & ((b[0] != 0) | (pack_len < 5))
    in_limit = pack_len
    out_limit = lane.outpos + unpack_len

    st = StepState(
        lane=lane,
        rng=jnp.full((n,), _MASK32, _U32),
        code=code0,
        inpos=jnp.full((n,), 5, _I32),
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
        lane = st.lane
        dic = lane.dic
        outpos = lane.outpos
        state = lane.state
        rep0, rep1, rep2, rep3 = lane.rep0, lane.rep1, lane.rep2, lane.rep3
        do = active & ~st.err & (outpos < out_limit) & (st.pend_len == 0)
        pos_state = outpos & pb_mask

        # ---- is-match ----------------------------------------------------
        st, bm = _decode_bit(st, src, in_limit,
                             S.IS_MATCH + (state << S.NUM_POS_BITS_MAX) + pos_state,
                             do)
        is_lit = do & (bm == 0)
        is_mat = do & (bm == 1)

        # ---- literal -----------------------------------------------------
        prev = jnp.where(outpos > 0, _gather_dic(dic, outpos - 1), 0)
        lit_state = ((outpos & lp_mask) << lc) + (prev >> (8 - lc))
        lit_base = S.LITERAL + 0x300 * lit_state
        mb = _gather_dic(dic, outpos - rep0.astype(_I32) - 1)
        in_match_state = state >= 7
        offs = jnp.where(in_match_state, 0x100, 0)
        mb = jnp.where(in_match_state, mb, 0)
        sym = jnp.ones((src.shape[0],), _I32)
        for _ in range(8):
            mb = mb << 1
            bit_ctx = mb & offs
            st, bl = _decode_bit(st, src, in_limit,
                                 lit_base + offs + bit_ctx + sym, is_lit)
            sym = jnp.where(is_lit, (sym << 1) | bl, sym)
            offs = jnp.where(bl == 1, offs & bit_ctx, offs & ~bit_ctx)
        lit_byte = (sym & 0xFF).astype(jnp.uint8)
        rows = jnp.arange(src.shape[0])
        scratch = dic.shape[1] - COPY_WIDTH  # masked writes land here
        wpos = jnp.where(is_lit, outpos, scratch)
        dic = dic.at[rows, wpos].set(lit_byte)
        outpos = jnp.where(is_lit, outpos + 1, outpos)
        lit_next = jnp.where(state < 4, 0,
                             jnp.where(state < 10, state - 3, state - 6))
        state = jnp.where(is_lit, lit_next, state)

        # ---- match family ------------------------------------------------
        st, br = _decode_bit(st, src, in_limit, S.IS_REP + state, is_mat)
        simple = is_mat & (br == 0)
        rep = is_mat & (br == 1)

        st, bg0 = _decode_bit(st, src, in_limit, S.IS_REP_G0 + state, rep)
        rep_g0 = rep & (bg0 == 0)
        st, b0l = _decode_bit(
            st, src, in_limit,
            S.IS_REP0_LONG + (state << S.NUM_POS_BITS_MAX) + pos_state, rep_g0)
        shortrep = rep_g0 & (b0l == 0)
        longrep0 = rep_g0 & (b0l == 1)
        repg = rep & (bg0 == 1)
        st, bg1 = _decode_bit(st, src, in_limit, S.IS_REP_G1 + state, repg)
        use_r1 = repg & (bg1 == 0)
        repg2 = repg & (bg1 == 1)
        st, bg2 = _decode_bit(st, src, in_limit, S.IS_REP_G2 + state, repg2)
        use_r2 = repg2 & (bg2 == 0)
        use_r3 = repg2 & (bg2 == 1)

        # rep distance move-to-front
        rot = use_r1 | use_r2 | use_r3
        dist_rep = jnp.where(use_r1, rep1, jnp.where(use_r2, rep2, rep3))
        rep3 = jnp.where(use_r3, rep2, rep3)
        rep2 = jnp.where(use_r2 | use_r3, rep1, rep2)
        rep1 = jnp.where(rot, rep0, rep1)
        rep0 = jnp.where(rot, dist_rep, rep0)

        # short rep: copy 1 byte from rep0 distance
        sr_byte = _gather_dic(dic, outpos - rep0.astype(_I32) - 1).astype(jnp.uint8)
        wpos = jnp.where(shortrep, outpos, scratch)
        dic = dic.at[rows, wpos].set(sr_byte)
        outpos = jnp.where(shortrep, outpos + 1, outpos)
        state = jnp.where(shortrep, jnp.where(state < 7, 9, 11), state)

        # ---- length ------------------------------------------------------
        len_lanes = simple | longrep0 | rot
        len_base = jnp.where(simple, S.LEN_CODER, S.REP_LEN_CODER)
        st, c1 = _decode_bit(st, src, in_limit, len_base + S.LEN_CHOICE, len_lanes)
        st, c2 = _decode_bit(st, src, in_limit, len_base + S.LEN_CHOICE2,
                             len_lanes & (c1 == 1))
        low = len_lanes & (c1 == 0)
        mid = len_lanes & (c1 == 1) & (c2 == 0)
        high = len_lanes & (c1 == 1) & (c2 == 1)
        lowmid = low | mid
        lm_base = len_base + jnp.where(
            low, S.LEN_LOW + (pos_state << S.LEN_LOW_BITS),
            S.LEN_MID + (pos_state << S.LEN_MID_BITS))
        st, lm_sym = _decode_tree(st, src, in_limit, lm_base, S.LEN_LOW_BITS,
                                  lowmid)
        st, hi_sym = _decode_tree(st, src, in_limit, len_base + S.LEN_HIGH,
                                  S.LEN_HIGH_BITS, high)
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
        st, slot = _decode_tree(st, src, in_limit,
                                S.POS_SLOT + (lt_ps << S.NUM_POS_SLOT_BITS),
                                S.NUM_POS_SLOT_BITS, simple)
        big = simple & (slot >= 4)
        nd = jnp.maximum((slot >> 1) - 1, 0)
        dist = jnp.where(big,
                         (2 | (slot & 1)).astype(_U32) << nd.astype(_U32),
                         slot.astype(_U32))
        specs = big & (slot < S.END_POS_MODEL_INDEX)
        st, spec_add = _decode_tree_reverse_dyn(
            st, src, in_limit,
            S.SPEC_POS + dist.astype(_I32) - slot - 1, nd, 5, specs)
        dist = jnp.where(specs, dist + spec_add.astype(_U32), dist)

        # direct bits: dynamic while over the max remaining count
        directs = big & (slot >= S.END_POS_MODEL_INDEX)
        ndirect = jnp.where(directs, nd - S.NUM_ALIGN_BITS, 0)

        def dcond(c):
            st_, dval_, left = c
            return jnp.any(left > 0)

        def dbody(c):
            st_, dist_, left = c  # dist_ here is the direct-bits accumulator
            act = left > 0
            rng, code, inpos = st_.rng, st_.code, st_.inpos
            need = (rng < _TOP) & act
            over = need & (inpos >= in_limit)
            bidx = jnp.clip(inpos, 0, src.shape[1] - 1)
            byte = jnp.take_along_axis(src, bidx[:, None], axis=1)[:, 0].astype(_U32)
            rng = jnp.where(need, rng << 8, rng)
            code = jnp.where(need, (code << 8) | byte, code)
            inpos = jnp.where(need, inpos + 1, inpos)
            rng = jnp.where(act, rng >> 1, rng)
            code2 = code - rng
            t = (jnp.zeros_like(code2) - (code2 >> 31))  # 0 or 0xFFFFFFFF
            code = jnp.where(act, code2 + (rng & t), code)
            bitv = (t + 1).astype(_U32)  # 0 if code went negative… (1 + -1)
            dist_ = jnp.where(act, (dist_ << 1) + bitv, dist_)
            st_ = st_._replace(rng=jnp.where(act, rng, st_.rng),
                               code=jnp.where(act, code, st_.code),
                               inpos=jnp.where(act, inpos, st_.inpos),
                               err=st_.err | over)
            return (st_, dist_, jnp.where(act, left - 1, left))

        st, dval, _ = jax.lax.while_loop(
            dcond, dbody, (st, jnp.zeros_like(dist), ndirect))
        st, align_add = _decode_tree_reverse_dyn(
            st, src, in_limit, jnp.full_like(slot, S.ALIGN),
            jnp.full_like(slot, S.NUM_ALIGN_BITS), S.NUM_ALIGN_BITS, directs)
        dist = jnp.where(directs,
                         dist + (dval << S.NUM_ALIGN_BITS)
                         + align_add.astype(_U32), dist)

        # end marker is invalid inside LZMA2 chunks
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
        pend_len = jnp.where(match_lanes & ~err, length, 0)
        pend_dist = jnp.where(match_lanes, rep0.astype(_I32) + 1, st.pend_dist)

        # st.lane carries the adapted probability model from the bit decodes;
        # merge the locally-updated LZ fields into it (NOT the stale `lane`)
        lane = st.lane._replace(dic=dic, outpos=outpos, state=state, rep0=rep0,
                                rep1=rep1, rep2=rep2, rep3=rep3)
        st = st._replace(lane=lane, err=err, pend_len=pend_len,
                         pend_dist=pend_dist)

        # ---- copy loop: K bytes per step, modulo trick for overlap -------
        def ccond(st_):
            return jnp.any(st_.pend_len > 0)

        def cbody(st_):
            lane_ = st_.lane
            dic_ = lane_.dic
            op = lane_.outpos
            pl = st_.pend_len
            pd = jnp.maximum(st_.pend_dist, 1)
            k = jnp.arange(COPY_WIDTH, dtype=_I32)[None, :]
            srcpos = op[:, None] - pd[:, None] + (k % pd[:, None])
            vals = jnp.take_along_axis(
                dic_, jnp.clip(srcpos, 0, dic_.shape[1] - 1), axis=1)
            wmask = k < pl[:, None]
            # masked writes target the distinct scratch slots beyond the data
            widx = jnp.where(wmask, op[:, None] + k,
                             dic_.shape[1] - COPY_WIDTH + k)
            dic_ = dic_.at[jnp.arange(dic_.shape[0])[:, None], widx].set(vals)
            step = jnp.minimum(pl, COPY_WIDTH)
            return st_._replace(
                lane=lane_._replace(dic=dic_, outpos=op + step),
                pend_len=pl - step)

        st = jax.lax.while_loop(ccond, cbody, st)
        return st

    st, n_iters = jax.lax.while_loop(cond, body_wrap, (st, jnp.int32(0)))

    # trailing renormalize (reference LzmaDec.c:412): exact consumption
    tail = active & ~st.err & (st.rng < _TOP) & (st.inpos < in_limit)
    st = st._replace(inpos=jnp.where(tail, st.inpos + 1, st.inpos))

    # a chunk is OK iff it produced exactly unpack_len bytes, consumed
    # exactly pack_len bytes, and raised no error
    ok = (~st.err) & (st.lane.outpos == out_limit) & (st.inpos == pack_len)
    ok = jnp.where(active, ok, True)
    return st.lane, ok, st.inpos, n_iters
