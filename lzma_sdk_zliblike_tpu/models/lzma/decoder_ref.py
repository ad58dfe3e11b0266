"""Scalar reference LZMA decoder (pure Python).

This is the framework's bit-exactness anchor: a from-scratch, clarity-first
implementation of the LZMA decode semantics (the same state machine the
reference implements in ``LzmaDec.c:131-426``) used to validate the batched
TPU decoder and the native engine against reference-produced streams.  It is
not a speed path.

Decodes into a plain ``bytearray`` that doubles as the dictionary (full
history in memory).  LZMA2 chunk semantics (state/props/dict reset) are
driven by the LZMA2 framing layer via the ``reset_*`` methods.
"""

from __future__ import annotations

from ...utils.errors import DataError, InputEofError
from . import spec as S

_TOP = S.RC_TOP
_MASK32 = 0xFFFFFFFF


class RangeDecoder:
    """Adaptive binary range decoder over one input buffer."""

    __slots__ = ("src", "pos", "limit", "range", "code")

    def __init__(self, src, pos: int = 0, limit: int | None = None):
        self.src = src
        self.pos = pos
        self.limit = len(src) if limit is None else limit
        self.range = 0
        self.code = 0

    def init(self) -> None:
        if self.limit - self.pos < 5:
            raise InputEofError("range coder init needs 5 bytes")
        if self.src[self.pos] != 0:
            raise DataError("first range-coded byte must be 0")
        self.pos += 1
        code = 0
        for _ in range(4):
            code = (code << 8) | self.src[self.pos]
            self.pos += 1
        self.code = code
        self.range = _MASK32

    # NOTE: normalization happens *before* each bit decision, matching the
    # reference macro order so input-consumption accounting is identical.
    def decode_bit(self, probs, i: int) -> int:
        rng = self.range
        code = self.code
        if rng < _TOP:
            if self.pos >= self.limit:
                raise InputEofError()
            rng = (rng << 8) & _MASK32
            code = ((code << 8) | self.src[self.pos]) & _MASK32
            self.pos += 1
        p = probs[i]
        bound = (rng >> S.RC_BIT_MODEL_TOTAL_BITS) * p
        if code < bound:
            rng = bound
            probs[i] = p + ((S.RC_BIT_MODEL_TOTAL - p) >> S.RC_MOVE_BITS)
            bit = 0
        else:
            rng -= bound
            code -= bound
            probs[i] = p - (p >> S.RC_MOVE_BITS)
            bit = 1
        self.range = rng
        self.code = code
        return bit

    def decode_direct_bits(self, n: int) -> int:
        res = 0
        rng = self.range
        code = self.code
        src = self.src
        for _ in range(n):
            if rng < _TOP:
                if self.pos >= self.limit:
                    raise InputEofError()
                rng = (rng << 8) & _MASK32
                code = ((code << 8) | src[self.pos]) & _MASK32
                self.pos += 1
            rng >>= 1
            code = (code - rng) & _MASK32
            t = 0 - (code >> 31)
            code = (code + (rng & t)) & _MASK32
            res = (res << 1) + t + 1
        self.range = rng
        self.code = code
        return res

    def decode_tree(self, probs, offset: int, num_bits: int) -> int:
        m = 1
        for _ in range(num_bits):
            m = (m << 1) | self.decode_bit(probs, offset + m)
        return m - (1 << num_bits)

    def decode_tree_reverse(self, probs, offset: int, num_bits: int) -> int:
        m = 1
        sym = 0
        for i in range(num_bits):
            b = self.decode_bit(probs, offset + m)
            m = (m << 1) | b
            sym |= b << i
        return sym

    @property
    def finished_cleanly(self) -> bool:
        """True when code==0 — required at a well-formed stream end."""
        return self.code == 0


def _decode_len(rc: RangeDecoder, probs, base: int, pos_state: int) -> int:
    """Match-length decode: 2..273 (reference length-coder grammar)."""
    if not rc.decode_bit(probs, base + S.LEN_CHOICE):
        return S.MATCH_MIN_LEN + rc.decode_tree(
            probs, base + S.LEN_LOW + (pos_state << S.LEN_LOW_BITS), S.LEN_LOW_BITS)
    if not rc.decode_bit(probs, base + S.LEN_CHOICE2):
        return S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS + rc.decode_tree(
            probs, base + S.LEN_MID + (pos_state << S.LEN_MID_BITS), S.LEN_MID_BITS)
    return (S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS + S.LEN_MID_SYMBOLS
            + rc.decode_tree(probs, base + S.LEN_HIGH, S.LEN_HIGH_BITS))


class LzmaDecoder:
    """Stateful scalar LZMA decoder (carries probs/state/reps across chunks)."""

    def __init__(self, props: S.LzmaProps):
        self.props = props
        self.probs: list[int] = []
        self.state = 0
        self.reps = [0, 0, 0, 0]
        self.reset_state()

    def reset_props(self, props: S.LzmaProps) -> None:
        self.props = props
        self.reset_state()

    def reset_state(self) -> None:
        self.probs = [S.PROB_INIT] * self.props.num_probs
        self.state = 0
        self.reps = [0, 0, 0, 0]

    def decode(self, src, out: bytearray, *,
               unpack_limit: int | None = None,
               expect_end_mark: bool = False,
               src_pos: int = 0, src_limit: int | None = None,
               dic_start: int = 0,
               rc: "RangeDecoder | None" = None,
               input_margin: int | None = None) -> tuple[int, bool]:
        """Decode one raw-LZMA segment.

        ``out`` holds the full history; bytes before ``len(out)`` act as the
        dictionary.  ``dic_start`` marks the dictionary-reset point (match
        distances may not reach before it).  Returns ``(src_consumed_abs_pos,
        saw_end_marker)``.  Stops when ``len(out) - start`` reaches
        ``unpack_limit`` or on the end marker.

        Streaming (``LzmaDec_DecodeToBuf`` semantics, ``LzmaDec.c:840-878``):
        pass a persistent ``rc`` to resume mid-segment, and ``input_margin``
        to pause cleanly at a symbol boundary when fewer than that many
        input bytes remain (instead of raising ``InputEofError`` mid-symbol;
        the reference bounds one symbol's consumption by
        ``LZMA_REQUIRED_INPUT_MAX`` = 20 bytes).  A paused call performs no
        trailing renormalize; resume by calling again with the same ``rc``.
        """
        props = self.props
        probs = self.probs
        if rc is None:
            rc = RangeDecoder(src, src_pos, src_limit)
            rc.init()
        state = self.state
        rep0, rep1, rep2, rep3 = self.reps
        pb_mask = (1 << props.pb) - 1
        lp_mask = (1 << props.lp) - 1
        lc = props.lc
        target = None if unpack_limit is None else len(out) + unpack_limit
        end_mark = False

        decode_bit = rc.decode_bit
        paused = False
        while True:
            if target is not None and len(out) >= target:
                break
            if input_margin is not None and rc.limit - rc.pos < input_margin:
                paused = True
                break
            pos = len(out)
            # context positions are relative to the last dict reset
            # (processedPos semantics: reset by initDic only)
            ctx_pos = pos - dic_start
            pos_state = ctx_pos & pb_mask
            if not decode_bit(probs, S.IS_MATCH + (state << S.NUM_POS_BITS_MAX) + pos_state):
                # literal
                prev = out[pos - 1] if pos > dic_start else 0
                lit_state = ((ctx_pos & lp_mask) << lc) + (prev >> (8 - lc))
                base = S.LITERAL + 0x300 * lit_state
                if state < 7:
                    sym = 1
                    while sym < 0x100:
                        sym = (sym << 1) | decode_bit(probs, base + sym)
                else:
                    # matched literal: fold bits of the byte at distance rep0+1
                    # into the context until the decoded prefix diverges
                    match_byte = out[pos - rep0 - 1]
                    offs = 0x100
                    sym = 1
                    while sym < 0x100:
                        match_byte <<= 1
                        bit_ctx = match_byte & offs
                        b = decode_bit(probs, base + offs + bit_ctx + sym)
                        sym = (sym << 1) | b
                        if b:
                            offs &= bit_ctx
                        else:
                            offs &= ~bit_ctx
                out.append(sym & 0xFF)
                state = S.state_after_literal(state)
                continue

            # match branch
            if decode_bit(probs, S.IS_REP + state):
                # rep match
                if pos == dic_start:
                    raise DataError("rep match with empty dictionary")
                if not decode_bit(probs, S.IS_REP_G0 + state):
                    if not decode_bit(
                        probs, S.IS_REP0_LONG + (state << S.NUM_POS_BITS_MAX) + pos_state):
                        # short rep: single byte at rep0
                        out.append(out[pos - rep0 - 1])
                        state = S.state_after_short_rep(state)
                        continue
                else:
                    if not decode_bit(probs, S.IS_REP_G1 + state):
                        dist = rep1
                        rep1 = rep0
                    else:
                        if not decode_bit(probs, S.IS_REP_G2 + state):
                            dist = rep2
                        else:
                            dist = rep3
                            rep3 = rep2
                        rep2 = rep1
                        rep1 = rep0
                    rep0 = dist
                length = _decode_len(rc, probs, S.REP_LEN_CODER, pos_state)
                state = S.state_after_rep(state)
            else:
                # simple match
                rep3, rep2, rep1 = rep2, rep1, rep0
                length = _decode_len(rc, probs, S.LEN_CODER, pos_state)
                state = S.state_after_match(state)
                slot = rc.decode_tree(
                    probs, S.POS_SLOT + (S.len_to_pos_state(length) << S.NUM_POS_SLOT_BITS),
                    S.NUM_POS_SLOT_BITS)
                if slot < 4:
                    dist = slot
                else:
                    num_direct = (slot >> 1) - 1
                    dist = (2 | (slot & 1)) << num_direct
                    if slot < S.END_POS_MODEL_INDEX:
                        dist += rc.decode_tree_reverse(
                            probs, S.SPEC_POS + dist - slot - 1, num_direct)
                    else:
                        dist += rc.decode_direct_bits(num_direct - S.NUM_ALIGN_BITS) << S.NUM_ALIGN_BITS
                        dist += rc.decode_tree_reverse(probs, S.ALIGN, S.NUM_ALIGN_BITS)
                if dist == _MASK32:
                    end_mark = True
                    break
                rep0 = dist

            if rep0 + 1 > pos - dic_start or rep0 + 1 > props.dict_size:
                raise DataError(f"match distance {rep0 + 1} out of window at pos {pos}")
            if target is not None and pos + length > target:
                raise DataError("match overruns declared unpack size")
            src_i = pos - rep0 - 1
            if rep0 == 0:
                out.extend(out[src_i:src_i + 1] * length)
            else:
                for _ in range(length):
                    out.append(out[src_i])
                    src_i += 1

        self.state = state
        self.reps = [rep0, rep1, rep2, rep3]
        if end_mark and not rc.finished_cleanly:
            raise DataError("range coder not zero at end marker")
        # trailing renormalize (reference LzmaDec.c:412): consumes the byte
        # mirroring the encoder's post-final-symbol shift, so chunk input
        # consumption is exact (skipped on a streaming pause — the segment
        # has not ended yet)
        if not paused and rc.range < _TOP and rc.pos < rc.limit:
            rc.range = (rc.range << 8) & _MASK32
            rc.code = ((rc.code << 8) | rc.src[rc.pos]) & _MASK32
            rc.pos += 1
        return rc.pos, end_mark


def lzma_decode(src: bytes, props: S.LzmaProps,
                unpack_size: int | None = None) -> bytes:
    """One-call raw-LZMA decode (body after the 13-byte .lzma header).

    ``unpack_size=None`` decodes until the end marker.
    """
    dec = LzmaDecoder(props)
    out = bytearray()
    dec.decode(src, out, unpack_limit=unpack_size,
               expect_end_mark=unpack_size is None)
    return bytes(out)
