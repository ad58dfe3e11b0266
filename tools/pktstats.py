"""Packet-kind statistics for the bench stream + v14 multilit advance model.

Decodes N sample groups of the bench LZMA2 stream with the scalar range
decoder and tallies the packet-kind sequence (L=literal, M=simple match,
R=rep match, S=shortrep), then simulates the phase-split iteration advance:
one iteration = up to LCAP leading literals + one packet of any kind, with
a consumed is-match bit carried as `pim` across iterations.

Usage: python tools/pktstats.py [n_groups] [lcap]
"""
import os
import sys
import collections

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lzma_sdk_zliblike_tpu.models.lzma import spec as S
from lzma_sdk_zliblike_tpu.models.lzma.decoder_ref import (
    RangeDecoder, _decode_len)
from lzma_sdk_zliblike_tpu.models.lzma2 import framing

_MASK32 = 0xFFFFFFFF


def tally_group(stream, group, props):
    """Packet-kind string for every chunk of one group (shared dict)."""
    kinds = []
    out = bytearray()
    probs = [S.PROB_INIT] * props.num_probs
    state = 0
    rep0 = rep1 = rep2 = rep3 = 0
    pb_mask = (1 << props.pb) - 1
    lp_mask = (1 << props.lp) - 1
    lc = props.lc
    for c in group:
        if not c.is_lzma:
            out.extend(stream[c.data_off:c.data_off + c.unpack_size])
            continue
        if c.mode >= framing.MODE_STATE:
            probs = [S.PROB_INIT] * props.num_probs
            state = 0
            rep0 = rep1 = rep2 = rep3 = 0
        rc = RangeDecoder(stream, c.data_off + 5, c.data_off + c.pack_size)
        rc.range = _MASK32
        rc.code = int.from_bytes(stream[c.data_off + 1:c.data_off + 5], "big")
        target = len(out) + c.unpack_size
        while len(out) < target:
            pos = len(out)
            pos_state = pos & pb_mask
            if not rc.decode_bit(probs, S.IS_MATCH
                                 + (state << S.NUM_POS_BITS_MAX) + pos_state):
                prev = out[pos - 1] if pos > 0 else 0
                lit_state = ((pos & lp_mask) << lc) + (prev >> (8 - lc))
                base = S.LITERAL + 0x300 * lit_state
                if state < 7:
                    sym = 1
                    while sym < 0x100:
                        sym = (sym << 1) | rc.decode_bit(probs, base + sym)
                else:
                    match_byte = out[pos - rep0 - 1]
                    offs = 0x100
                    sym = 1
                    while sym < 0x100:
                        match_byte <<= 1
                        bit_ctx = match_byte & offs
                        b = rc.decode_bit(probs, base + offs + bit_ctx + sym)
                        sym = (sym << 1) | b
                        offs = (offs & bit_ctx) if b else (offs & ~bit_ctx)
                out.append(sym & 0xFF)
                state = S.state_after_literal(state)
                kinds.append("l" if state >= 4 else "L")  # l = was matched-lit
                continue
            if rc.decode_bit(probs, S.IS_REP + state):
                if not rc.decode_bit(probs, S.IS_REP_G0 + state):
                    if not rc.decode_bit(probs, S.IS_REP0_LONG
                                         + (state << S.NUM_POS_BITS_MAX)
                                         + pos_state):
                        out.append(out[pos - rep0 - 1])
                        state = S.state_after_short_rep(state)
                        kinds.append("S")
                        continue
                else:
                    if not rc.decode_bit(probs, S.IS_REP_G1 + state):
                        dist = rep1
                        rep1 = rep0
                    else:
                        if not rc.decode_bit(probs, S.IS_REP_G2 + state):
                            dist = rep2
                        else:
                            dist = rep3
                            rep3 = rep2
                        rep2 = rep1
                        rep1 = rep0
                    rep0 = dist
                length = _decode_len(rc, probs, S.REP_LEN_CODER, pos_state)
                state = S.state_after_rep(state)
                kinds.append("R")
            else:
                rep3, rep2, rep1 = rep2, rep1, rep0
                length = _decode_len(rc, probs, S.LEN_CODER, pos_state)
                state = S.state_after_match(state)
                slot = rc.decode_tree(
                    probs, S.POS_SLOT
                    + (S.len_to_pos_state(length) << S.NUM_POS_SLOT_BITS),
                    S.NUM_POS_SLOT_BITS)
                if slot < 4:
                    dist = slot
                else:
                    nd = (slot >> 1) - 1
                    dist = (2 | (slot & 1)) << nd
                    if slot < S.END_POS_MODEL_INDEX:
                        dist += rc.decode_tree_reverse(
                            probs, S.SPEC_POS + dist - slot - 1, nd)
                    else:
                        dist += rc.decode_direct_bits(
                            nd - S.NUM_ALIGN_BITS) << S.NUM_ALIGN_BITS
                        dist += rc.decode_tree_reverse(
                            probs, S.ALIGN, S.NUM_ALIGN_BITS)
                rep0 = dist
                kinds.append("M")
            src_i = pos - rep0 - 1
            for _ in range(length):
                out.append(out[src_i])
                src_i += 1
    return "".join(kinds)


def sim_iters(kinds, lcap):
    """Iterations to decode `kinds` under the multilit scheme (one lane).

    Iteration = up to lcap literal slots then one any-kind slot; a consumed
    is-match bit that says "match" carries over (pim) at no extra cost.
    Returns iteration count.  Baseline = len(kinds) (1 packet/iter).
    """
    i = 0
    n = len(kinds)
    iters = 0
    pim = False
    while i < n:
        iters += 1
        if pim or kinds[i] not in "Ll":
            # match via the general path (calls 2-28); no literals after
            pim = False
            i += 1
            continue
        # leading literal run: lit slots; slot j+1 consumes is_match and,
        # on a match verdict, carries it to the next iteration as pim
        adv = 1
        while adv < lcap and i + adv < n and kinds[i + adv] in "Ll":
            adv += 1
        if adv < lcap and i + adv < n:
            pim = True   # consumed is_match said "match": decodes next iter
        i += adv
    return iters


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    lcaps = [int(x) for x in (sys.argv[2].split(",")
                              if len(sys.argv) > 2 else ["2", "3", "4", "5"])]
    stream = open(os.path.join(REPO, "build", "bench_128m_1024k.l2"),
                  "rb").read()
    chunks, _end = framing.scan(stream)
    groups = framing.split_groups(chunks)
    props = S.LzmaProps(lc=3, lp=0, pb=2, dict_size=16 << 20)
    # sample groups spread across the corpus (content varies by region)
    step = max(1, len(groups) // n_groups)
    sample = [groups[i] for i in range(0, len(groups), step)][:n_groups]
    allk = collections.Counter()
    tot_pk = tot_base = 0
    tot_it = {lc_: 0 for lc_ in lcaps}
    for g in sample:
        kinds = tally_group(stream, g, props)
        allk.update(kinds)
        tot_pk += len(kinds)
        tot_base += len(kinds)
        for lc_ in lcaps:
            tot_it[lc_] += sim_iters(kinds, lc_)
    n = sum(allk.values())
    print(f"packets {n}: " + ", ".join(
        f"{k}={v} ({100*v/n:.1f}%)" for k, v in sorted(allk.items())))
    lits = allk["L"] + allk["l"]
    print(f"P(lit)={lits/n:.3f}  matched-lit share={allk['l']/n:.3f}")
    for lc_ in lcaps:
        it = tot_it[lc_]
        print(f"LCAP={lc_}: iters {it} vs {tot_base} -> "
              f"mean advance {tot_base/it:.3f} packets/iter")


if __name__ == "__main__":
    main()
