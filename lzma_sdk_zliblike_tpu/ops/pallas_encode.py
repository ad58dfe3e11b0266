"""Lane-parallel LZMA range ENCODER — the device half of the encode
pipeline (find → parse → code).

The host fast parse exports op streams (``lzt_lzma2_group_ops``); each
kernel lane replays one dict-reset group's ops through the adaptive
probability model and the carry/cache range coder, producing chunk bodies
byte-identical to the native host encoder at the same parse (reference
emission: ``LzmaEnc_CodeOneBlock`` symbol coding ``LzmaEnc.c:1733-1893``,
range coder ``RangeEnc_EncodeBit``/``ShiftLow`` ``LzmaEnc.c:456-573``).

Design notes (vs the decode kernel, ``pallas_decode.py``):

* the per-lane BIT ORDER equals the decoder's consumption order, so the
  slot schedule transcribes the decode kernel's fused schedule with
  encode-side calls — but every bit value and probability index is known
  at op start from the op record, so there are no decoded-bit select
  chains, no renorm input bytes, and no TryDummy analog;
* one iteration processes one whole op (a match op covers up to 273
  output bytes), and the encoder never rereads its own output — no
  dictionary, no copy phase, no random-access staging: input is a
  sequentially-consumed op page pair, output a parity pair of write
  windows flushed page-by-page;
* the range coder's ``low`` is 33 bits: a u32 plus an accumulated carry
  flag (at most one wrap between renormalizations, because inter-shift
  additions sum below the last shifted range);
* ShiftLow's deferred-0xFF runs use a reserve-the-gap scheme: the
  immediate byte is written, the cursor jumps the run, and one pending
  run per iteration is filled in a rarely-taken cond at iteration end.
  Runs longer than 3 (probability ~256^-3 per flush) or a second run in
  one iteration flag the lane for host retry — the scheduler-style
  per-lane fallback keeps the path exact end-to-end.

Op record (2 u32 words, ``native/lzt_codec.cc`` encode_segment):
  a = kind | (rep_index << 2) | (length << 4); kind 0=lit 1=match 2=rep
      3=shortrep
  b = match: wire distance; literal: sym | (prev << 8) | (match_byte << 16)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.lzma import spec as S
from . import pallas_decode as D

PAGE = D.PAGE
_I32 = jnp.int32
_U32 = jnp.uint32
_TOP = np.uint32(S.RC_TOP)
_FF000000 = np.uint32(0xFF000000)

# ST lanes (packed per-stream scalars, one [n, PAGE] row)
ST_ERR = 0
ST_CIDX = 1      # current chunk index
ST_CEND = 2      # op-word end of current chunk
ST_RUNPOS = 3    # pending 0xFF-run start byte position
ST_RUNLEN = 4    # pending run length (0 = none)
ST_RUNBYTE = 5   # pending run byte value
ST_PIPG = 6      # staged op-page mirror
ST_PCW = 7       # tracked output-page mirror
ST_DONE = 8      # lane finished all chunks
ST_STATE2 = 9    # LZMA state machine state
ST_R0 = 10       # wire rep distances
ST_R1 = 11
ST_R2 = 12
ST_R3 = 13
ST_RUNPOS2 = 14  # second pending run (two flush-runs in one iteration)
ST_RUNLEN2 = 15
ST_RUNBYTE2 = 16


def _make_kernel(n_streams: int, op_pages: int, out_pages: int,
                 lc: int, lp: int, pb: int, max_iters: int):
    layout, tot_pages = D._family_layout(lc, lp)
    pg_init = [int(S.PROB_INIT)] * tot_pages
    for _nm, (_b, _w, _npg, _pk) in layout.items():
        if _pk:
            for _i in range(_npg):
                pg_init[_b + _i] = int(D._PROB_INIT2)
    n = n_streams
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1
    out_pages4 = out_pages // 4
    nmax = min(26, max(0, (out_pages * PAGE - 1).bit_length() - 1
                       - S.NUM_ALIGN_BITS))

    def kernel(meta_ref, ops_ref, out_ref, status_ref, tab_ref,
               fam_ref, i0_ref, i1_ref, w0_ref, w1_ref, x_ref,
               prev_ipg, tracked, pend_dma, needf,
               dsem, isem, fsem):
        lane_i = jax.lax.broadcasted_iota(_I32, (n, PAGE), 1)
        zero = jnp.zeros((n, PAGE), _I32)
        zerou = jnp.zeros((n, PAGE), _U32)

        nch_l = meta_ref[0]          # per-lane chunk count (broadcast row)
        active_i = meta_ref[1]
        active0 = active_i != 0
        opend_tab = meta_ref[2]      # cumulative op-word end per chunk lane

        for _p in range(tot_pages):
            fam_ref[_p] = jnp.full((n, PAGE), pg_init[_p], _I32)
        w0_ref[:] = zero
        w1_ref[:] = zero
        tab_ref[:] = zero
        cp0 = pltpu.make_async_copy(ops_ref.at[0], i0_ref, isem)
        cp0.start()
        cp1 = pltpu.make_async_copy(ops_ref.at[min(1, op_pages - 1)],
                                    i1_ref, isem)
        cp1.start()
        cp0.wait()
        cp1.wait()
        for s in range(n):
            prev_ipg[s] = jnp.int32(0)
            tracked[s] = jnp.int32(0)
        for g in range(-(-n // 32)):
            pend_dma[g] = jnp.int32(0)
            needf[g] = jnp.int32(0)

        def gat(tbl, idx):
            return jnp.take_along_axis(tbl, jnp.clip(idx, 0, PAGE - 1),
                                       axis=1)

        def getv(st, k):
            return gat(st, zero + k)

        def setv(st, k, v):
            return jnp.where(lane_i == k, v, st)

        sid = jax.lax.broadcasted_iota(_I32, (n, PAGE), 0)
        ngr = -(-n // 32)
        EVL = PAGE - 32

        def _pack_events(evt):
            shifted = evt << (sid & 31)
            rows = jnp.zeros((n, PAGE), _I32)
            for g in range(ngr):
                gw = jnp.sum(jnp.where((sid >> 5) == g, shifted, 0), axis=0)
                rows = jnp.where((sid == 0) & (lane_i == EVL + g),
                                 gw[None, :][:, EVL + g:EVL + g + 1], rows)
            return rows

        def _stage_one(s):
            v = x_ref[s, 0]
            pg_i = v & 0xFFFFF
            cu = x_ref[s, 2]
            @pl.when(cu != tracked[s])
            def _(cu=cu, s=s):
                # flush the COMPLETED page (parity of tracked); its window
                # is zeroed after the DMA drains (see _zero_window)
                t = tracked[s]
                @pl.when((t & 1) == 0)
                def _(t=t, s=s):
                    pltpu.make_async_copy(w0_ref.at[s],
                                          out_ref.at[t, s], fsem).start()
                @pl.when((t & 1) == 1)
                def _(t=t, s=s):
                    pltpu.make_async_copy(w1_ref.at[s],
                                          out_ref.at[t, s], fsem).start()
                needf[s // 32] = needf[s // 32] | D._bitc(s)
                tracked[s] = cu
            @pl.when(pg_i != prev_ipg[s])
            def _(pg_i=pg_i, s=s):
                i0_ref[s, :] = i1_ref[s, :]
                i1p = jnp.minimum(pg_i + 1, op_pages - 1)
                cb = pltpu.make_async_copy(ops_ref.at[i1p, s],
                                           i1_ref.at[s], dsem.at[s])
                cb.start()
                pend_dma[s // 32] = pend_dma[s // 32] | D._bitc(s)
                prev_ipg[s] = pg_i

        def _zero_window(s):
            # the page at (tracked-1) parity was flushed; clear its window
            # for reuse two pages later
            t = tracked[s] - 1
            @pl.when((t & 1) == 0)
            def _(s=s):
                w0_ref[s, :] = jnp.zeros((PAGE,), _I32)
            @pl.when((t & 1) == 1)
            def _(s=s):
                w1_ref[s, :] = jnp.zeros((PAGE,), _I32)

        def _word_waits(flags, wait_one, also=None):
            for g in range(-(-n // 32)):
                wd = flags[g]
                @pl.when(wd != 0)
                def _(wd=wd, g=g):
                    for s in range(g * 32, min(n, g * 32 + 32)):
                        @pl.when(((wd >> (s - g * 32)) & 1) != 0)
                        def _(s=s):
                            wait_one(s)
                            if also is not None:
                                also(s)
                    flags[g] = jnp.int32(0)

        def scalar_stage():
            for g in range(ngr):
                ew = x_ref[0, EVL + g]
                @pl.when(ew != 0)
                def _(ew=ew, g=g):
                    for s in range(g * 32, min(n, g * 32 + 32)):
                        @pl.when(((ew >> (s - g * 32)) & 1) != 0)
                        def _(s=s):
                            _stage_one(s)
            _word_waits(pend_dma, lambda s: pltpu.make_async_copy(
                ops_ref.at[0, s], i1_ref.at[s], dsem.at[s]).wait())
            _word_waits(needf, lambda s: pltpu.make_async_copy(
                w0_ref.at[s], out_ref.at[0, s], fsem).wait(),
                also=_zero_window)

        CHECK_EVERY = 64

        def emit_stage(st, opc, opos):
            ipg = opc >> 7
            cur_w = opos >> 9
            evt = jnp.where((ipg != getv(st, ST_PIPG))
                            | (cur_w != getv(st, ST_PCW)), 1, 0)
            st = setv(st, ST_PIPG, ipg)
            st = setv(st, ST_PCW, cur_w)
            erows = _pack_events(evt)
            packed = jnp.clip(ipg, 0, op_pages - 1)
            # clamp the flush target: an overflowing lane errors out, but
            # its staging word must never address past the output pages
            x_ref[:] = jnp.where(lane_i == 0, packed,
                                 jnp.where(lane_i == 2,
                                           jnp.clip(cur_w, 0,
                                                    out_pages4 - 1),
                                           erows))
            return st

        # ---- emission machinery (shared by all gated/ungated blocks) ---
        # em-state tuple: (rng u32, low u32, cw i32, opos i32, st i32)
        # cw packs cache (bits 0-7) | csize (8-23) | lowc (bit 24)

        def append_byte(p, byte, mask):
            sh = ((p >> 7) & 3) << 3
            wl = p & (PAGE - 1)
            par = (p >> 9) & 1
            m0 = mask & (par == 0) & (lane_i == wl)
            m1 = mask & (par == 1) & (lane_i == wl)
            w0_ref[:] = jnp.where(
                m0, (w0_ref[:] & (((zero + 0xFF) << sh) ^ -1))
                | (byte << sh), w0_ref[:])
            w1_ref[:] = jnp.where(
                m1, (w1_ref[:] & (((zero + 0xFF) << sh) ^ -1))
                | (byte << sh), w1_ref[:])

        def shift_low(e, mask):
            """One ShiftLow on masked lanes (LzmaEnc.c:509-531)."""
            rng, low, cw, opos, st = e
            cache = cw & 0xFF
            csize = (cw >> 8) & 0xFFFF
            lowc = (cw >> 24) & 1
            fc = mask & ((lowc == 1) | (low < _FF000000))
            carry = jnp.where(fc, lowc, 0)
            run = jnp.where(fc, csize - 1, 0)
            append_byte(opos, (cache + carry) & 0xFF, fc)
            rb = (0xFF + carry) & 0xFF
            new_run = fc & (run > 0)
            pend1 = getv(st, ST_RUNLEN) > 0
            pend2 = getv(st, ST_RUNLEN2) > 0
            # two pending-run slots per iteration; a third collision (or a
            # run beyond 3 bytes, ~256^-3 per flush) flags host retry
            bad = (new_run & pend1 & pend2) | (fc & (run > 3))
            st = setv(st, ST_ERR, jnp.where(bad, 2, getv(st, ST_ERR)))
            to1 = new_run & ~pend1
            to2 = new_run & pend1 & ~pend2
            st = setv(st, ST_RUNPOS,
                      jnp.where(to1, opos + 1, getv(st, ST_RUNPOS)))
            st = setv(st, ST_RUNLEN,
                      jnp.where(to1, jnp.minimum(run, 3),
                                getv(st, ST_RUNLEN)))
            st = setv(st, ST_RUNBYTE,
                      jnp.where(to1, rb, getv(st, ST_RUNBYTE)))
            st = setv(st, ST_RUNPOS2,
                      jnp.where(to2, opos + 1, getv(st, ST_RUNPOS2)))
            st = setv(st, ST_RUNLEN2,
                      jnp.where(to2, jnp.minimum(run, 3),
                                getv(st, ST_RUNLEN2)))
            st = setv(st, ST_RUNBYTE2,
                      jnp.where(to2, rb, getv(st, ST_RUNBYTE2)))
            opos = jnp.where(fc, opos + 1 + jnp.minimum(run, 3), opos)
            cache = jnp.where(fc, (low >> 24).astype(_I32) & 0xFF, cache)
            csize = jnp.where(fc, 0, csize)
            csize = jnp.where(mask, csize + 1, csize)
            low = jnp.where(mask, (low & 0xFFFFFF) << 8, low)
            lowc = jnp.where(mask, 0, lowc)
            return (rng, low, cache | (csize << 8) | (lowc << 24), opos, st)

        def renorm(e, mask):
            need = mask & (e[0] < _TOP)
            e = shift_low(e, need)
            return (jnp.where(need, e[0] << 8, e[0]),) + e[1:]

        def add_low(e, bound, mask):
            rng, low, cw, opos, st = e
            nl = low + jnp.where(mask, bound, zerou)
            wrapped = mask & (nl < low)
            cw = jnp.where(wrapped, cw | (1 << 24), cw)
            return (rng, nl, cw, opos, st)

        def ebit_multi(e, parts):
            """One adaptive bit ENCODE for lane-disjoint parts
            (fam, idx, bitval, mask) — bit_multi's encode twin."""
            do = parts[0][3]
            bv = jnp.where(parts[0][3], parts[0][2], 0)
            for _, _, b_, mk in parts[1:]:
                do = do | mk
                bv = jnp.where(mk, b_, bv)
            p = zero
            lns = []
            for fam, idx, _b, mask in parts:
                base, width, npg, packed = layout[fam]
                idx = jnp.clip(idx, 0, width - 1)
                if packed:
                    widx = idx >> 1
                    ln = widx & (PAGE - 1)
                    pg = widx >> 7
                    sh = (idx & 1) << 4
                    if npg == 1:
                        wv = gat(fam_ref[base], ln)
                    else:
                        wv = zero
                        for i in range(npg):
                            g = gat(fam_ref[base + i], ln)
                            wv = jnp.where(pg == i, g, wv)
                    pp = (wv >> sh) & 0xFFFF
                else:
                    ln = idx
                    pg = None
                    sh = wv = None
                    pp = gat(fam_ref[base], ln)
                lns.append((base, npg, ln, pg, sh, wv, mask, packed))
                p = pp if len(parts) == 1 else jnp.where(mask, pp, p)
            rng = e[0]
            bound = (rng >> S.RC_BIT_MODEL_TOTAL_BITS) * p.astype(_U32)
            bit0 = bv == 0
            newp = jnp.where(
                bit0,
                p + ((S.RC_BIT_MODEL_TOTAL - p) >> S.RC_MOVE_BITS),
                p - (p >> S.RC_MOVE_BITS))
            for base, npg, ln, pg, sh, wv, mask, packed in lns:
                oh = (lane_i == ln) & mask
                if not packed:
                    fam_ref[base] = jnp.where(oh, newp, fam_ref[base])
                    continue
                merged = ((wv & (((zero + 0xFFFF) << sh) ^ -1))
                          | (newp << sh))
                if npg == 1:
                    fam_ref[base] = jnp.where(oh, merged, fam_ref[base])
                else:
                    for i in range(npg):
                        fam_ref[base + i] = jnp.where(
                            oh & (pg == i), merged, fam_ref[base + i])
            e = add_low(e, bound, do & ~bit0)
            e = (jnp.where(do, jnp.where(bit0, bound, rng - bound), rng),
                 ) + e[1:]
            return renorm(e, do)

        def ebit(e, fam, idx, b, mask):
            return ebit_multi(e, [(fam, idx, b, mask)])

        def body(carry):
            (it, busy_s, rng, low, cw, opos, opc, dpos, st) = carry

            def _check():
                busy_in = (active_i != 0) & (getv(st, ST_ERR) == 0) & \
                    (getv(st, ST_DONE) == 0)
                return jnp.where(jnp.any(busy_in), 1, 0).astype(_I32)

            busy_s = jax.lax.cond((it & (CHECK_EVERY - 1)) == 0,
                                  _check, lambda: jnp.int32(1))

            scalar_stage()

            err0 = getv(st, ST_ERR) != 0
            done0 = getv(st, ST_DONE) != 0
            alive = active0 & ~err0 & ~done0

            e = (rng, low, cw, opos, st)

            # ---- chunk boundary: flush the range coder (gated, rare) ---
            cend = getv(st, ST_CEND)
            at_end = alive & (opc >= cend)

            def _chunk_flush(e):
                for _ in range(5):
                    e = shift_low(e, at_end)
                rng, low, cw, opos, st = e
                cidx = getv(st, ST_CIDX)
                tab_ref[:] = jnp.where(
                    at_end & (lane_i == jnp.clip(cidx, 0, PAGE - 1)),
                    opos, tab_ref[:])
                ncidx = cidx + 1
                ndone = ncidx >= nch_l
                st = setv(st, ST_CIDX, jnp.where(at_end, ncidx, cidx))
                st = setv(st, ST_DONE,
                          jnp.where(at_end & ndone, 1, getv(st, ST_DONE)))
                st = setv(st, ST_CEND,
                          jnp.where(at_end,
                                    gat(opend_tab,
                                        jnp.clip(ncidx, 0, PAGE - 1)),
                                    getv(st, ST_CEND)))
                rng = jnp.where(at_end, zerou + np.uint32(0xFFFFFFFF),
                                rng)
                low = jnp.where(at_end, zerou, low)
                cw = jnp.where(at_end, 1 << 8, cw)
                return (rng, low, cw, opos, st)

            e = jax.lax.cond(jnp.any(at_end), _chunk_flush, lambda e: e, e)
            st = e[4]
            err0 = getv(st, ST_ERR) != 0
            done0 = getv(st, ST_DONE) != 0
            do = active0 & ~err0 & ~done0 & ~at_end

            # ---- fetch + crack the op ----------------------------------
            opw = opc & (PAGE - 1)
            a = gat(i0_ref[:], opw)
            b = gat(i0_ref[:], opw | 1)
            kind = a & 3
            ri = (a >> 2) & 3
            length = a >> 4
            is_lit = do & (kind == 0)
            simple = do & (kind == 1)
            rep = do & (kind == 2)
            shortrep = do & (kind == 3)
            is_mat = do & (kind != 0)
            pos_state = dpos & pb_mask
            state = getv(st, ST_STATE2)

            # literal fields
            sym = b & 0xFF
            prev = (b >> 8) & 0xFF
            mby = (b >> 16) & 0xFF
            lit_state = ((dpos & lp_mask) << lc) + (prev >> (8 - lc))
            matched = is_lit & (state >= 7)

            # length coder fields (match + rep lanes)
            len_lanes = simple | rep
            lsym = length - S.MATCH_MIN_LEN
            low_l = len_lanes & (lsym < S.LEN_LOW_SYMBOLS)
            mid_l = len_lanes & (lsym >= S.LEN_LOW_SYMBOLS) & \
                (lsym < S.LEN_LOW_SYMBOLS + S.LEN_MID_SYMBOLS)
            high_l = len_lanes & (lsym >= S.LEN_LOW_SYMBOLS
                                  + S.LEN_MID_SYMBOLS)
            lowmid = low_l | mid_l
            coder = jnp.where(simple, 0, 1)
            ismid = jnp.where(mid_l, 1, 0)
            lm_sym = jnp.where(low_l, lsym, lsym - S.LEN_LOW_SYMBOLS)
            hi_sym = jnp.maximum(
                lsym - S.LEN_LOW_SYMBOLS - S.LEN_MID_SYMBOLS, 0)

            # distance fields (simple matches): pos slot via bit hacks
            distl = b
            dv = distl | (distl >> 1)
            dv = dv | (dv >> 2)
            dv = dv | (dv >> 4)
            dv = dv | (dv >> 8)
            dv = dv | (dv >> 16)
            pc = dv - ((dv >> 1) & 0x55555555)
            pc = (pc & 0x33333333) + ((pc >> 2) & 0x33333333)
            nbl = (((pc + (pc >> 4)) & 0x0F0F0F0F) * 0x01010101) >> 24
            slot = jnp.where(distl < 4, distl,
                             ((nbl - 1) << 1)
                             | ((distl >> jnp.maximum(nbl - 2, 0)) & 1))
            big = simple & (slot >= 4)
            nd = jnp.maximum((slot >> 1) - 1, 0)
            dbase = jnp.where(big, (2 | (slot & 1)) << nd, 0)
            rem = distl - dbase
            specs = big & (slot < S.END_POS_MODEL_INDEX)
            directs = big & (slot >= S.END_POS_MODEL_INDEX)
            spec_base = dbase - slot - 1
            ndirect = jnp.where(directs, nd - S.NUM_ALIGN_BITS, 0)
            dval = jnp.where(directs, rem >> S.NUM_ALIGN_BITS, 0)
            align_sym = rem & (S.ALIGN_TABLE_SIZE - 1)

            # ---- slot schedule (transcribes the decode kernel's) -------
            e = ebit(e, "is_match",
                     (state << S.NUM_POS_BITS_MAX) + pos_state,
                     jnp.where(is_mat, 1, 0), do)

            lit_m = {"sym": zero + 1, "mb": mby, "matched": matched}

            def lit_part(k, bi):
                m = lit_m
                mb = m["mb"] << 1
                mbit = (mb >> 8) & 1
                plane = jnp.where(m["matched"], 1 + mbit, 0)
                lb = (sym >> bi) & 1
                idx = (lit_state * 3 + plane) * (1 << k) \
                    + (m["sym"] - (1 << k))
                m["mb"] = mb
                m["matched"] = m["matched"] & (lb == mbit)
                m["sym"] = jnp.where(is_lit, (m["sym"] << 1) | lb,
                                     m["sym"])
                return (f"lit_{k}", idx, lb, is_lit)

            def lowmid_idx(k, m):
                return (((coder * 2 + ismid) * S.POS_STATES_MAX + pos_state)
                        * (1 << k)) + (m - (1 << k))

            mlm = zero + 1
            blm0 = (lm_sym >> 2) & 1
            fused_pairs = [
                ("is_rep", state, jnp.where(rep | shortrep, 1, 0), is_mat),
                ("is_rep_g0", state, jnp.where(ri != 0, 1, 0),
                 rep | shortrep),
                ("is_rep0_long",
                 (state << S.NUM_POS_BITS_MAX) + pos_state,
                 jnp.where(rep, 1, 0), (rep & (ri == 0)) | shortrep),
                ("is_rep_g1", state, jnp.where(ri >= 2, 1, 0),
                 rep & (ri >= 1)),
                ("is_rep_g2", state, jnp.where(ri == 3, 1, 0),
                 rep & (ri >= 2)),
                ("len_choice", coder * 2, jnp.where(low_l, 0, 1),
                 len_lanes),
                ("len_choice", coder * 2 + 1, jnp.where(mid_l, 0, 1),
                 len_lanes & ~low_l),
                ("lowmid_0", lowmid_idx(0, mlm), blm0, lowmid),
            ]
            for k, part in enumerate(fused_pairs):
                e = ebit_multi(e, [lit_part(k, 7 - k), part])
            mlm = jnp.where(lowmid, (mlm << 1) | blm0, mlm)

            # lowmid_{1,2} fused with high_{0,1}
            mhi = zero + 1
            for k in range(2):
                blm = (lm_sym >> (1 - k)) & 1
                bhi = (hi_sym >> (7 - k)) & 1
                e = ebit_multi(e, [
                    (f"lowmid_{k + 1}", lowmid_idx(k + 1, mlm), blm,
                     lowmid),
                    (f"high_{k}", coder * (1 << k) + (mhi - (1 << k)),
                     bhi, high_l)])
                mlm = jnp.where(lowmid, (mlm << 1) | blm, mlm)
                mhi = jnp.where(high_l, (mhi << 1) | bhi, mhi)

            for k in range(2, S.LEN_HIGH_BITS):
                bh = (hi_sym >> (7 - k)) & 1
                e = ebit(e, f"high_{k}",
                         coder * (1 << k) + (mhi - (1 << k)), bh, high_l)
                mhi = jnp.where(high_l, (mhi << 1) | bh, mhi)

            # slot tree (6 bits, MSB first)
            lt_ps = jnp.minimum(length - S.MATCH_MIN_LEN,
                                S.NUM_LEN_TO_POS_STATES - 1)
            msl = zero + 1
            for k in range(S.NUM_POS_SLOT_BITS):
                bs = (slot >> (S.NUM_POS_SLOT_BITS - 1 - k)) & 1
                e = ebit(e, f"slot_{k}",
                         lt_ps * (1 << k) + (msl - (1 << k)), bs, simple)
                msl = jnp.where(simple, (msl << 1) | bs, msl)

            # direct bits (gated, MSB-first halvings with emission)
            if nmax > 0:
                def _direct_block(e):
                    for i in range(nmax):
                        act = (zero + i) < ndirect
                        sh_i = jnp.maximum(ndirect - 1 - i, 0)
                        bitv = jnp.where(act, (dval >> sh_i) & 1, 0)
                        rng = jnp.where(act, e[0] >> 1, e[0])
                        e = (rng,) + e[1:]
                        e = add_low(e, rng, act & (bitv == 1))
                        e = renorm(e, act)
                    return e
                e = jax.lax.cond(jnp.any(directs), _direct_block,
                                 lambda e: e, e)

            # spec/align reverse trees (fused, like decode's spec_align)
            mrev = zero + 1
            for i in range(5):
                act_s = specs & (i < nd)
                act_a = directs & (i < S.NUM_ALIGN_BITS)
                act = act_s | act_a
                brv = jnp.where(act_a, (align_sym >> i) & 1,
                                (rem >> i) & 1)
                idx = jnp.where(act_a, S.NUM_SPEC_POS + mrev,
                                spec_base + mrev)
                e = ebit(e, "spec_align", idx, brv, act)
                mrev = jnp.where(act, (mrev << 1) | brv, mrev)

            # ---- state / reps update -----------------------------------
            (rng, low, cw, opos, st) = e
            r0 = getv(st, ST_R0)
            r1 = getv(st, ST_R1)
            r2 = getv(st, ST_R2)
            r3 = getv(st, ST_R3)
            use1 = rep & (ri == 1)
            use2 = rep & (ri == 2)
            use3 = rep & (ri == 3)
            dist_rep = jnp.where(use1, r1, jnp.where(use2, r2, r3))
            rot = use1 | use2 | use3
            nr3 = jnp.where(use3, r2, r3)
            nr2 = jnp.where(use2 | use3, r1, r2)
            nr1 = jnp.where(rot, r0, r1)
            nr0 = jnp.where(rot, dist_rep, r0)
            nr3 = jnp.where(simple, nr2, nr3)
            nr2 = jnp.where(simple, nr1, nr2)
            nr1 = jnp.where(simple, nr0, nr1)
            nr0 = jnp.where(simple, distl, nr0)
            st = setv(st, ST_R0, nr0)
            st = setv(st, ST_R1, nr1)
            st = setv(st, ST_R2, nr2)
            st = setv(st, ST_R3, nr3)
            lit_next = jnp.where(state < 4, 0,
                                 jnp.where(state < 10, state - 3,
                                           state - 6))
            nstate = jnp.where(is_lit, lit_next, state)
            nstate = jnp.where(simple, jnp.where(state < 7, 7, 10), nstate)
            nstate = jnp.where(rep, jnp.where(state < 7, 8, 11), nstate)
            nstate = jnp.where(shortrep, jnp.where(state < 7, 9, 11),
                               nstate)
            st = setv(st, ST_STATE2, nstate)

            # ---- pending-run fill (rare) -------------------------------
            rl = getv(st, ST_RUNLEN)
            rl2 = getv(st, ST_RUNLEN2)

            def _fill_runs(_):
                rp = getv(st, ST_RUNPOS)
                rb = getv(st, ST_RUNBYTE)
                rp2 = getv(st, ST_RUNPOS2)
                rb2 = getv(st, ST_RUNBYTE2)
                for j in range(3):
                    append_byte(rp + j, rb, rl > j)
                    append_byte(rp2 + j, rb2, rl2 > j)
                return 0
            jax.lax.cond(jnp.any((rl > 0) | (rl2 > 0)), _fill_runs,
                         lambda _: 0, 0)
            st = setv(st, ST_RUNLEN, zero)
            st = setv(st, ST_RUNLEN2, zero)

            # ---- advance -----------------------------------------------
            opc = jnp.where(do, opc + 2, opc)
            dpos = jnp.where(do, dpos + length, dpos)
            over = alive & ((opos >> 9) >= out_pages4)
            st = setv(st, ST_ERR, jnp.where(over, 3, getv(st, ST_ERR)))
            st = emit_stage(st, opc, opos)

            return (it + 1, busy_s, rng, low, cw, opos, opc, dpos, st)

        def cond(carry):
            it, busy_s = carry[0], carry[1]
            return (busy_s != 0) & (it < max_iters)

        st0 = jnp.zeros((n, PAGE), _I32)
        st0 = jnp.where(lane_i == ST_CEND, gat(opend_tab, zero), st0)
        st0 = emit_stage(st0, zero, zero)
        rng0 = jnp.full((n, PAGE), np.uint32(0xFFFFFFFF), _U32)
        init = (jnp.int32(0), jnp.int32(1), rng0,
                jnp.zeros((n, PAGE), _U32),
                jnp.full((n, PAGE), 1 << 8, _I32),  # cache 0, csize 1
                zero, zero, zero, st0)
        final = jax.lax.while_loop(cond, body, init)
        (_it, _busy, _rng, _low, _cw, opos, _opc, _dpos, st) = final

        # final drain: flush BOTH windows to their pages (tracked holds
        # the parity of the older in-flight page)
        for s in range(n):
            t = tracked[s]
            p0 = jnp.clip(jnp.where((t & 1) == 0, t, t + 1), 0,
                          out_pages4 - 1)
            p1 = jnp.clip(jnp.where((t & 1) == 1, t, t + 1), 0,
                          out_pages4 - 1)
            pltpu.make_async_copy(w0_ref.at[s], out_ref.at[p0, s],
                                  fsem).start()
            pltpu.make_async_copy(w1_ref.at[s], out_ref.at[p1, s],
                                  fsem).start()
        for s in range(n):
            pltpu.make_async_copy(w0_ref.at[s], out_ref.at[0, s],
                                  fsem).wait()
            pltpu.make_async_copy(w1_ref.at[s], out_ref.at[0, s],
                                  fsem).wait()

        ok = active0 & (getv(st, ST_ERR) == 0) & (getv(st, ST_DONE) != 0)
        status_ref[0] = jnp.where(ok, 1, 0)
        status_ref[1] = opos
        status_ref[2] = zero + _it
        status_ref[3] = getv(st, ST_ERR)

    return kernel, tot_pages


@functools.lru_cache(maxsize=16)
def _encode_call_cached(n_streams, op_pages, out_pages, lc, lp, pb,
                        interpret):
    max_iters = op_pages * (PAGE // 2) + PAGE * 2 + 4096
    kernel, tot_pages = _make_kernel(n_streams, op_pages, out_pages,
                                     lc, lp, pb, max_iters)
    n = n_streams
    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_pages // 4, n, PAGE), _I32),
            jax.ShapeDtypeStruct((4, n, PAGE), _I32),
            jax.ShapeDtypeStruct((n, PAGE), _I32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],  # ops in HBM
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),  # bodies in HBM
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((tot_pages, n, PAGE), _I32),   # fam
            pltpu.VMEM((n, PAGE), _I32),              # I0 op page
            pltpu.VMEM((n, PAGE), _I32),              # I1 op page+1
            pltpu.VMEM((n, PAGE), _I32),              # W0 window parity 0
            pltpu.VMEM((n, PAGE), _I32),              # W1 window parity 1
            pltpu.VMEM((n, PAGE), _I32),              # X scalar xfer
            pltpu.SMEM((n,), _I32),                   # prev op page
            pltpu.SMEM((n,), _I32),                   # tracked out page
            pltpu.SMEM((-(-n // 32),), _I32),         # prefetch bitmask
            pltpu.SMEM((-(-n // 32),), _I32),         # flush bitmask
            pltpu.SemaphoreType.DMA((n,)),            # per-stream op DMA
            pltpu.SemaphoreType.DMA,                  # init DMA
            pltpu.SemaphoreType.DMA,                  # flush DMA
        ],
        interpret=interpret,
    )
    return fn


def submit_encode_groups(ops_words, meta, *, out_pages: int,
                         lc: int = 3, lp: int = 0, pb: int = 2,
                         interpret: bool | None = None):
    """Launch the encode kernel (async dispatch).

    ops_words: [op_pages, S, PAGE] int32 op words (2 words per op,
    sequential per lane, 128 words per page; records never straddle
    pages).  meta: [3, S, PAGE] int32 — row 0: per-lane chunk count
    (broadcast); row 1: active; row 2: cumulative op-word end per chunk
    at lane c.  Returns (out, status, tab) device arrays.
    """
    op_pages, n, _ = ops_words.shape
    fn = _encode_call_cached(n, op_pages, out_pages, lc, lp, pb,
                             D._resolve_interpret(interpret))
    return fn(jnp.asarray(meta), jnp.asarray(ops_words))


def finalize_encode(handle, lane_nchunks):
    """Materialize kernel output into per-lane chunk bodies.

    Returns ``(bodies_per_lane, ok)``: bodies_per_lane[s] is a list of
    chunk body bytes (None for failed lanes — the caller re-encodes those
    groups on the host, the scheduler's per-lane fallback pattern).
    """
    out, status, tab = handle
    out = np.asarray(out)
    status = np.asarray(status)
    tab = np.asarray(tab)
    q, n, _ = out.shape
    flat = (np.ascontiguousarray(out).view(np.uint8)
            .reshape(q, n, PAGE, 4).transpose(1, 0, 3, 2).reshape(n, -1))
    ok = status[0, :, 0] != 0
    bodies = []
    for s, nch in enumerate(lane_nchunks):
        if not ok[s]:
            bodies.append(None)
            continue
        lane_bodies = []
        prev = 0
        for c in range(nch):
            end = int(tab[s, c])
            lane_bodies.append(flat[s, prev:end].tobytes())
            prev = end
        bodies.append(lane_bodies)
    return bodies, ok


def pack_ops_batch(lane_ops, lane_tabs, n_lanes: int | None = None,
                   op_pages_min: int = 0, out_pages4_min: int = 0):
    """Pack per-lane op streams + chunk tables into kernel inputs.

    lane_ops: list of uint32 arrays (2 words/op); lane_tabs: list of
    [n_chunks, 3] tables from ``native.lzma2_group_ops``.  Lanes whose op
    stream exceeds a nonzero ``op_pages_min`` cap are marked INACTIVE
    (ok=False at finalize → caller host-fallback) so a fixed cap yields a
    single compiled shape across batches.
    Returns (ops_words [op_pages, S, PAGE] int32, meta [3, S, PAGE] int32,
    out_pages, lane_nchunks).
    """
    S_ = n_lanes or len(lane_ops)
    S_ = -(-S_ // 8) * 8          # Mosaic sublane tiling: pad to 8
    if op_pages_min:
        op_pages = op_pages_min
        lane_ops = [o if len(o) <= op_pages * PAGE else o[:0]
                    for o in lane_ops]
    else:
        max_words = max((len(o) for o in lane_ops), default=2)
        op_pages = max(2, -(-max_words // PAGE))
        # round shapes up to powers of two: batches share compiled
        # kernels (the decode scheduler's n_chunks-bucketing lesson)
        op_pages = 1 << (op_pages - 1).bit_length()
    ops = np.zeros((S_, op_pages * PAGE), np.uint32)
    meta = np.zeros((3, S_, PAGE), np.int32)
    max_unpack = 0
    lane_nchunks = []
    for s, (o, tab) in enumerate(zip(lane_ops, lane_tabs)):
        if len(o) == 0:          # capped-out lane: inactive, host encodes
            lane_nchunks.append(len(tab))
            continue
        ops[s, :len(o)] = o
        nch = len(tab)
        lane_nchunks.append(nch)
        meta[0, s, :] = nch
        meta[1, s, :] = 1
        ends = tab[:, 0]
        meta[2, s, :nch] = ends
        meta[2, s, nch:] = ends[-1] if nch else 0
        max_unpack = max(max_unpack, int(tab[-1, 1]) if nch else 0)
    # body cap: unpacked size + slack (non-compressing groups are the
    # host's copy-chunk fallback, not the device path)
    out_bytes = max_unpack + (max_unpack >> 3) + 4096
    out_pages4 = max(8, -(-out_bytes // 512), out_pages4_min)
    out_pages4 = 1 << (out_pages4 - 1).bit_length()
    out_pages = out_pages4 * 4
    ops_words = ops.view(np.int32).reshape(S_, op_pages, PAGE).transpose(
        1, 0, 2)
    return np.ascontiguousarray(ops_words), meta, out_pages, lane_nchunks
