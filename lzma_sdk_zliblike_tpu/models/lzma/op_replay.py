"""Replay a parsed op stream through the adaptive model + range coder.

This is the executable spec of the device range-coding stage: the native
fast parse exports op records (``lzt_lzma2_group_ops``); replaying them
here — or on the TPU (``ops/pallas_encode.py``) — must reproduce
``encode_segment``'s chunk bodies byte for byte.  The emission schedule
mirrors the reference encoder's symbol coding (``LzmaEnc_CodeOneBlock``,
``LzmaEnc.c:1733-1893``; range coder ``LzmaEnc.c:456-573``).

Op record (2 uint32 words, from native/lzt_codec.cc encode_segment):
  a = kind | (rep_index << 2) | (length << 4)
      kind: 0 literal, 1 match, 2 rep, 3 shortrep
  b = wire distance (match only)
"""

from __future__ import annotations

from . import spec as S
from .encoder_ref import RangeEncoder, _encode_len, _encode_dist

OP_LIT = 0
OP_MATCH = 1
OP_REP = 2
OP_SHORTREP = 3


class OpReplayCoder:
    """Adaptive model + range coder consuming op records for one group.

    Model state (probs, state, reps) persists across chunks; each chunk
    gets a fresh range coder, exactly like the native group loop.
    """

    def __init__(self, props: S.LzmaProps):
        self.props = props
        self.reset_state()

    def reset_state(self) -> None:
        self.probs = [S.PROB_INIT] * self.props.num_probs
        self.state = 0
        self.reps = [0, 0, 0, 0]

    def encode_chunk(self, data, start: int, end: int, ops) -> bytes:
        """Replay ops for data[start:end]; returns the chunk body."""
        p = self.props
        pb_mask = (1 << p.pb) - 1
        lp_mask = (1 << p.lp) - 1
        probs = self.probs
        state = self.state
        rep0, rep1, rep2, rep3 = self.reps
        rc = RangeEncoder()
        i = start
        for k in range(0, len(ops), 2):
            a = int(ops[k])
            kind = a & 3
            length = a >> 4
            pos_state = i & pb_mask
            if kind == OP_LIT:
                rc.encode_bit(probs,
                              S.IS_MATCH + (state << S.NUM_POS_BITS_MAX)
                              + pos_state, 0)
                prev = data[i - 1] if i > 0 else 0
                lit_state = ((i & lp_mask) << p.lc) + (prev >> (8 - p.lc))
                base = S.LITERAL + 0x300 * lit_state
                sym = data[i]
                if state < 7:
                    m = 1
                    for bi in range(7, -1, -1):
                        b = (sym >> bi) & 1
                        rc.encode_bit(probs, base + m, b)
                        m = (m << 1) | b
                else:
                    mb = data[i - rep0 - 1]
                    offs = 0x100
                    m = 1
                    for bi in range(7, -1, -1):
                        b = (sym >> bi) & 1
                        mb <<= 1
                        bc = mb & offs
                        rc.encode_bit(probs, base + offs + bc + m, b)
                        m = (m << 1) | b
                        offs &= bc if b else ~bc
                state = S.state_after_literal(state)
                i += 1
                continue
            rc.encode_bit(probs,
                          S.IS_MATCH + (state << S.NUM_POS_BITS_MAX)
                          + pos_state, 1)
            if kind == OP_SHORTREP:
                rc.encode_bit(probs, S.IS_REP + state, 1)
                rc.encode_bit(probs, S.IS_REP_G0 + state, 0)
                rc.encode_bit(probs,
                              S.IS_REP0_LONG + (state << S.NUM_POS_BITS_MAX)
                              + pos_state, 0)
                state = S.state_after_short_rep(state)
                i += 1
                continue
            if kind == OP_REP:
                ri = (a >> 2) & 3
                rc.encode_bit(probs, S.IS_REP + state, 1)
                if ri == 0:
                    rc.encode_bit(probs, S.IS_REP_G0 + state, 0)
                    rc.encode_bit(
                        probs, S.IS_REP0_LONG
                        + (state << S.NUM_POS_BITS_MAX) + pos_state, 1)
                else:
                    rc.encode_bit(probs, S.IS_REP_G0 + state, 1)
                    if ri == 1:
                        rc.encode_bit(probs, S.IS_REP_G1 + state, 0)
                        dist = rep1
                        rep1 = rep0
                    else:
                        rc.encode_bit(probs, S.IS_REP_G1 + state, 1)
                        rc.encode_bit(probs, S.IS_REP_G2 + state,
                                      1 if ri == 3 else 0)
                        if ri == 2:
                            dist = rep2
                        else:
                            dist = rep3
                            rep3 = rep2
                        rep2 = rep1
                        rep1 = rep0
                    rep0 = dist
                _encode_len(rc, probs, S.REP_LEN_CODER, pos_state, length)
                state = S.state_after_rep(state)
                i += length
                continue
            # simple match
            dist = int(ops[k + 1])
            rc.encode_bit(probs, S.IS_REP + state, 0)
            rep3, rep2, rep1, rep0 = rep2, rep1, rep0, dist
            _encode_len(rc, probs, S.LEN_CODER, pos_state, length)
            _encode_dist(rc, probs, length, dist)
            state = S.state_after_match(state)
            i += length
        if i != end:
            raise ValueError(f"op stream covers {i}, chunk ends {end}")
        self.state = state
        self.reps = [rep0, rep1, rep2, rep3]
        return rc.flush()


def replay_group(data, ops, chunk_tab, props: S.LzmaProps) -> list[bytes]:
    """Replay a whole group's op stream; returns per-chunk bodies."""
    coder = OpReplayCoder(props)
    bodies = []
    op_start = 0
    pos = 0
    for op_end, unpack_end, _body_end in chunk_tab:
        bodies.append(coder.encode_chunk(data, pos, int(unpack_end),
                                         ops[op_start:int(op_end)]))
        op_start = int(op_end)
        pos = int(unpack_end)
    return bodies
