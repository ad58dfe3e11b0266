"""LZMA format constants and probability-model layout.

This pins the *format semantics* (what the public LZMA specification defines
and what the reference implements in its decoder hot loop,
``LzmaDec.c:131-426``): the 12-state LZ state machine, the adaptive binary
range coder, and the context-model inventory of
``1846 + 768·2^(lc+lp)`` probabilities (``LzmaDec.c:107-110``).

The flat layout of the probability array below is our own (it only has to be
internally consistent); every context starts at ``PROB_INIT = 1024`` and
adapts with 5-bit shift moves, which is what makes streams bit-exact.
"""

from __future__ import annotations

from dataclasses import dataclass

# ---- range coder ----------------------------------------------------------
RC_TOP = 1 << 24           # renormalization threshold
RC_BIT_MODEL_TOTAL_BITS = 11
RC_BIT_MODEL_TOTAL = 1 << RC_BIT_MODEL_TOTAL_BITS   # 2048
RC_MOVE_BITS = 5
PROB_INIT = RC_BIT_MODEL_TOTAL // 2  # 1024

# ---- LZ state machine -----------------------------------------------------
NUM_STATES = 12
NUM_POS_BITS_MAX = 4
POS_STATES_MAX = 1 << NUM_POS_BITS_MAX

MATCH_MIN_LEN = 2
MATCH_MAX_LEN = MATCH_MIN_LEN + 16 + 256 - 1  # 273

# length coder: choice + choice2 + 16×8 low + 16×8 mid + 256 high
LEN_LOW_BITS = 3
LEN_MID_BITS = 3
LEN_HIGH_BITS = 8
LEN_LOW_SYMBOLS = 1 << LEN_LOW_BITS
LEN_MID_SYMBOLS = 1 << LEN_MID_BITS
LEN_HIGH_SYMBOLS = 1 << LEN_HIGH_BITS
NUM_LEN_PROBS = 2 + POS_STATES_MAX * LEN_LOW_SYMBOLS + POS_STATES_MAX * LEN_MID_SYMBOLS + LEN_HIGH_SYMBOLS  # 514

# distance coder
NUM_LEN_TO_POS_STATES = 4
NUM_POS_SLOT_BITS = 6
NUM_ALIGN_BITS = 4
ALIGN_TABLE_SIZE = 1 << NUM_ALIGN_BITS
END_POS_MODEL_INDEX = 14
NUM_FULL_DISTANCES = 1 << (END_POS_MODEL_INDEX >> 1)  # 128
NUM_SPEC_POS = NUM_FULL_DISTANCES - END_POS_MODEL_INDEX  # 114

# ---- probability-array layout (ours) --------------------------------------
IS_MATCH = 0                                               # [state<<4 | posState]
IS_REP = IS_MATCH + (NUM_STATES << NUM_POS_BITS_MAX)       # [state]
IS_REP_G0 = IS_REP + NUM_STATES
IS_REP_G1 = IS_REP_G0 + NUM_STATES
IS_REP_G2 = IS_REP_G1 + NUM_STATES
IS_REP0_LONG = IS_REP_G2 + NUM_STATES                      # [state<<4 | posState]
POS_SLOT = IS_REP0_LONG + (NUM_STATES << NUM_POS_BITS_MAX) # [lenToPosState*64 + treeIdx]
SPEC_POS = POS_SLOT + NUM_LEN_TO_POS_STATES * (1 << NUM_POS_SLOT_BITS)
ALIGN = SPEC_POS + NUM_SPEC_POS
LEN_CODER = ALIGN + ALIGN_TABLE_SIZE
REP_LEN_CODER = LEN_CODER + NUM_LEN_PROBS
LITERAL = REP_LEN_CODER + NUM_LEN_PROBS                    # 1846
NUM_BASE_PROBS = LITERAL
assert NUM_BASE_PROBS == 1846  # parity with LzmaDec.c:107-110

# offsets inside one length coder
LEN_CHOICE = 0
LEN_CHOICE2 = 1
LEN_LOW = 2
LEN_MID = LEN_LOW + POS_STATES_MAX * LEN_LOW_SYMBOLS
LEN_HIGH = LEN_MID + POS_STATES_MAX * LEN_MID_SYMBOLS


def num_probs(lc: int, lp: int) -> int:
    """Total probability count for given literal-context params."""
    return NUM_BASE_PROBS + (0x300 << (lc + lp))


# state-transition tables (semantics of LzmaDec.c:131-426 / LzmaEnc.c:445-448)
def state_after_literal(s: int) -> int:
    return 0 if s < 4 else (s - 3 if s < 10 else s - 6)


def state_after_match(s: int) -> int:
    return 7 if s < 7 else 10


def state_after_rep(s: int) -> int:
    return 8 if s < 7 else 11


def state_after_short_rep(s: int) -> int:
    return 9 if s < 7 else 11


def len_to_pos_state(length: int) -> int:
    """Distance-slot context from match length (len counted from MATCH_MIN_LEN)."""
    sym = length - MATCH_MIN_LEN
    return sym if sym < NUM_LEN_TO_POS_STATES else NUM_LEN_TO_POS_STATES - 1


# ---- props ---------------------------------------------------------------
LZMA_PROPS_SIZE = 5
DIC_MIN = 1 << 12


@dataclass(frozen=True)
class LzmaProps:
    """Decoded 5-byte .lzma properties (lc/lp/pb byte + LE32 dictSize)."""

    lc: int = 3
    lp: int = 0
    pb: int = 2
    dict_size: int = 1 << 24

    def __post_init__(self):
        if not (0 <= self.lc <= 8 and 0 <= self.lp <= 4 and 0 <= self.pb <= 4):
            from ...utils.errors import ParamError
            raise ParamError(f"bad lc/lp/pb {self.lc}/{self.lp}/{self.pb}")

    @classmethod
    def from_bytes(cls, b: bytes) -> "LzmaProps":
        from ...utils.errors import UnsupportedError, ParamError
        if len(b) < LZMA_PROPS_SIZE:
            raise ParamError("props too short")
        d = b[0]
        if d >= 9 * 5 * 5:
            raise UnsupportedError(f"bad props byte {d}")
        lc = d % 9
        d //= 9
        lp = d % 5
        pb = d // 5
        dict_size = int.from_bytes(b[1:5], "little")
        return cls(lc=lc, lp=lp, pb=pb, dict_size=max(dict_size, DIC_MIN))

    def to_bytes(self) -> bytes:
        return bytes([(self.pb * 5 + self.lp) * 9 + self.lc]) + self.dict_size.to_bytes(4, "little")

    @property
    def num_probs(self) -> int:
        return num_probs(self.lc, self.lp)
