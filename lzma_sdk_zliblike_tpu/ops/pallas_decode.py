"""Pallas TPU kernel: lane-parallel batched LZMA chunk decoder.

This is the compute-path successor to ``ops/batched_decode.py`` (the pure-XLA
lockstep decoder).  Same semantics — N independent LZMA2 chunks decode in
lockstep, one packet per stream per iteration, every range-coder bit decision
a masked vector op (reference hot loop: ``LzmaDec.c:131-426``) — but the
memory layout is designed around what the TPU vector core can actually do:

* **Streams on sublanes, table entries on lanes.**  Mosaic supports a
  per-sublane dynamic gather along the 128-lane axis
  (``take_along_axis(x, idx, axis=-1)``) but no sublane-indexed gather.  So
  every probability family lives in VMEM as ``[pages, S, 128]`` — stream s is
  sublane s, a family is split into 128-entry lane pages — and one adaptive
  bit decode is: one lane-gather for the probability, a few vector ops for
  the bound/update, and a one-hot masked store per touched page.
* **Live-state diet (v4).**  The v2/v3 kernels carried ~17 broadcast
  ``[S,128]`` values through the decode while-loop; with the staging rows the
  body ran far beyond the vector register file and every iteration paid VMEM
  spill bandwidth (measured: ablating any phase moved the time <±20% — the
  cost was monolithic).  v4 carries only ``rng``, ``code``, ``inpos`` plus
  ONE packed ``st[S,128]`` register whose *lane k* holds per-stream scalar
  k (outpos, state, rep0..3, last_byte, pend_len, pend_dist, err).  Every
  other use re-extracts with a 1-op register lane-gather (explicit
  rematerialization: a gather from a live register costs ~1 VPU op; a spill
  costs a VMEM round-trip).
* **Byte-per-renorm input.**  Instead of a carried 4-byte lookahead
  (la/la_cnt and a separate consumed counter), each renormalization fetches
  one byte from the two staged 512-byte input pages.  ``consumed == inpos``
  identically, and over-reads past pack_len land in the zero padding (the
  host wrapper zero-pads), caught by the final exact-consumption check —
  same verdict as the old per-bit overrun flag, with three fewer carries.
* **Dictionary = the packed int32 output buffer, resident in HBM** (v8):
  byte ``p`` of stream ``s`` lives at ``out[p>>9, s, p&127]`` bits
  ``8*((p>>7)&3)`` — a 512-byte *word page* per row.  Sequential writes
  (literals, match copies) go through a per-stream word-page write window
  ``w`` that is flushed (VMEM ring + async HBM DMA) only when the stream
  crosses a 512-byte boundary; any read that lands on the current word
  page is served from the window register.  Random reads (matched
  literals, match-copy sources) stage 1-2 word rows per stream: the last
  ``RING`` flushed pages (32 KB of recent history — the vast majority of
  match distances) are served from a VMEM ring cache with scalar-indexed
  row copies, older pages by per-stream HBM DMAs issued for all streams
  before any wait so the latencies overlap.  The scalar core resolves the
  per-stream addresses (ONE packed staging word per stream: scalar VMEM
  reads dominate the staging loop, so all indices travel in one lane)
  while the vector core does the bit arithmetic.  Keeping the dictionary
  in HBM lifts the per-group output cap from 512 KB to 16 MB — the
  reference encoder's default dictionary (``LzmaEnc.c:58``) — so archives
  the reference or stock xz produce decode on-device.
* **Match copies move up to 512 bytes per iteration**: each of the 4 byte
  slots of the word window gets a masked lane-gather — destination byte
  ``outpos + j`` takes source byte ``base + (j mod dist)`` — the modulo
  makes overlapping (periodic) matches correct without a serial byte loop.
* **Input stays in HBM** and is DMA'd per stream into two staged 512-byte
  pages on demand (~1 DMA wait per 512 consumed bytes).
* **Direct distance bits bounded by the dictionary.**  A match distance
  ≥ dic_cap is invalid regardless of its bits, so the direct-bits loop runs
  ``ceil(log2(dic_cap)) - 5`` iterations instead of the format maximum 26;
  lanes whose slot implies more bits keep the guaranteed-too-large slot
  base, fail the distance check, and report error exactly like the scalar
  decoder would.

Bit-exactness contract is identical to the scalar reference decoder
(``models/lzma/decoder_ref.py``) and the XLA lockstep kernel: exact input
consumption accounting including the trailing-renormalize step of
``LzmaDec.c:412``, chunk-boundary ``SZ_ERROR_DATA`` semantics, end-marker
rejection inside sized LZMA2 chunks.

Scope: each stream decodes one whole *group* — a dict-reset chunk followed
by up to 127 continuation chunks (the data-parallel unit ``Lzma2Dec.c:14-26``
defines).  An outer in-kernel loop runs one decode round per chunk: chunk
boundaries re-init the range coder from the next 5 header bytes, and
state-reset chunks additionally re-init the probability model/state/reps
while the dictionary position continues.  Uncompressed copy chunks run
in-kernel too (the phase 0.5 mover, traced only when the batch contains
one), so reference-default 64 MB blocks (``Lzma2Enc.c:223-233``) and
level-9 dictionaries decode 100% on the pallas path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.lzma import spec as S

_I32 = jnp.int32
_U32 = jnp.uint32
_TOP = np.uint32(S.RC_TOP)
_MASK32 = np.uint32(0xFFFFFFFF)

PAGE = 128               # lanes per table/dict page
IN_PAGE_BYTES = 512      # staged input page: 128 LE words
RING = 64                # VMEM ring cache: last 64 flushed word pages
                         # (32 KB of recent dictionary) per stream; older
                         # pages are DMA'd back from the HBM output buffer


def _ring(n_streams: int) -> int:
    """Ring pages per stream: 64 up to 64 lanes; 32 above 64 lanes (the
    fam tables + ring must fit the 16 MB VMEM together)."""
    return RING if n_streams <= 64 else 32

def _bitc(s: int):
    """int32 constant with bit (s % 32) set (bit 31 wraps to the sign bit)."""
    return np.int32(np.uint32(1 << (s % 32)))


# packed per-stream state: lane index in the st register
ST_OUTPOS = 0
ST_STATE = 1
ST_REP0 = 2
ST_REP1 = 3
ST_REP2 = 4
ST_REP3 = 5
ST_LAST = 6
ST_PLEN = 7
ST_PDIST = 8
ST_ERR = 9
ST_PIPG = 10      # staged input page at last staging (event detection)
ST_PCW = 11       # write word-page at last staging (event detection)
ST_CHUNK = 12     # per-lane chunk index (chunkflow; n_chunks = done)
ST_DBASE = 13     # dictionary base: outpos at the lane's last dict-reset
                  # chunk (multi-group lanes decode several dict-reset
                  # groups back to back; flags bit3 rebases here)
ST_PIM = 14       # mlit: the lane consumed next packet's is-match bit at
                  # a literal slot and it said "match" — the next
                  # iteration skips the is_match call and takes bm = 1
# (measured dead end: moving limit/cmode out of the while carry into st
# lanes to cut spill pressure REGRESSED S=64/128 by ~6-8 us/iter — the
# per-use register gathers cost more than the spilled carries)


# ---------------------------------------------------------------------------
# family page layout
# ---------------------------------------------------------------------------

def _family_layout(lc: int, lp: int, litrow: bool = False):
    """Assign each probability family a page range in the fams scratch.

    Families wider than one 128-lane page pack TWO 11-bit probabilities
    per int32 lane word (16 bits each, 256 entries/page): half the
    page-select gathers/stores per bit decode where the page loops are
    the cost (the high literal-tree levels).  Single-page families stay
    one-entry-per-word — measured (v10 ablation, S=128): packing them
    too added ~8 us/iter of extract/merge overhead for zero loop savings.

    ``litrow``: the literal coder becomes ONE family laid out so each
    (plane, context) owns a CONTIGUOUS 256-node slot = exactly one packed
    page (node n of context c, plane p lives at entry
    ``(p*nls + c)*256 + n``).  The page index is then constant across all
    8 tree levels, so the kernel pre-selects the context's page row once
    and every level is a register gather instead of a multi-page VMEM
    gather loop (the measured literal-tree cost).

    Returns (layout dict name -> (first_page, width, n_pages, packed),
    total_pages).
    """
    nls = 1 << (lc + lp)
    fams = [
        ("is_match", S.NUM_STATES << S.NUM_POS_BITS_MAX),
        ("is_rep", S.NUM_STATES),
        ("is_rep_g0", S.NUM_STATES),
        ("is_rep_g1", S.NUM_STATES),
        ("is_rep_g2", S.NUM_STATES),
        ("is_rep0_long", S.NUM_STATES << S.NUM_POS_BITS_MAX),
        ("spec_align", S.NUM_SPEC_POS + S.ALIGN_TABLE_SIZE),
        ("len_choice", 2 * 2),
    ]
    for k in range(S.NUM_POS_SLOT_BITS):
        fams.append((f"slot_{k}", S.NUM_LEN_TO_POS_STATES << k))
    for k in range(S.LEN_LOW_BITS):
        fams.append((f"lowmid_{k}", (2 * 2 * S.POS_STATES_MAX) << k))
    for k in range(S.LEN_HIGH_BITS):
        fams.append((f"high_{k}", 2 << k))
    if litrow:
        fams.append(("lit", nls * 3 * 256))
    else:
        for k in range(8):
            fams.append((f"lit_{k}", (nls * 3) << k))
    layout = {}
    page = 0
    for name, width in fams:
        packed = width > PAGE
        npg = -(-width // (2 * PAGE)) if packed else 1
        layout[name] = (page, width, npg, packed)
        page += npg
    return layout, page


# packed pages initialize both 16-bit halves to PROB_INIT (= 1024);
# unpacked pages read only the low half, where the two layouts agree
_PROB_INIT2 = np.int32((S.PROB_INIT << 16) | S.PROB_INIT)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

    # dev-only ablation knobs (timing probes; results are wrong when set):
    # LZT_ABLATE=phase,phase,...  with phases in {lit, copy, stage, bits,
    # events}; LZT_ABLATE_ITERS=N forces exactly N iterations per chunk
    # round regardless of decode state (uniform work for A/B timing)


def _ablate_env() -> str:
    """Ablation spec (jit-static): "phase,phase,...[@iters]" from env.

    Ablated kernels return GARBAGE with the error flags suppressed, so a
    leaked dev env var must never silently reach a production decode:
    the spec is honored only with the explicit second opt-in below, and
    its use is announced loudly on stderr.
    """
    spec = os.environ.get("LZT_ABLATE", "")
    it = os.environ.get("LZT_ABLATE_ITERS", "")
    if not spec and not it:
        return ""
    if os.environ.get("LZT_ABLATE_I_KNOW_RESULTS_ARE_WRONG") != "1":
        raise RuntimeError(
            "LZT_ABLATE/LZT_ABLATE_ITERS are timing-probe knobs whose "
            "results are wrong by design; set "
            "LZT_ABLATE_I_KNOW_RESULTS_ARE_WRONG=1 to confirm (dev "
            "tools do this for you)")
    import sys
    print(f"lzt: ABLATION ACTIVE ({spec!r}@{it!r}) — decode results are "
          "garbage by design", file=sys.stderr, flush=True)
    return f"{spec}@{it}" if it else spec


def _make_kernel(n_streams: int, in_pages: int, out_pages: int,
                 lc: int, lp: int, pb: int, max_iters: int, n_chunks: int,
                 ablate_spec: str = "", has_copy: bool = False,
                 tune: str = ""):
    tune_set = set(filter(None, tune.split(",")))
    labyte = "labyte" in tune_set     # byte-lane lookahead register
    noclip = "noclip" in tune_set     # drop redundant family idx clips
    pprev = "pprev" in tune_set       # previous-page register: serve
    # cur_w-1 dictionary reads vector-side, halving the need_m/copy
    # scalar-staging event rate (the measured phase-0/2 staging cost)
    stage2 = "stage2" in tune_set     # 2-bit event words (page|match):
    # the hot match-row staging path does ONE scalar VMEM read (the
    # ring-vs-HBM decision is precomputed vector-side into bit 30 of the
    # m-field), and phase-2 b-rows stage only when the copy span actually
    # crosses a source page (was: every far copy)
    p2one = "p2one" in tune_set       # phase-2 copies one dynamic byte
    # slot (<= 128 B/iter instead of 512): 2 gathers + ~20 ops instead of
    # 8 + ~50; matches > 128 B (0.3% extra iterations on the measured
    # length distribution) pay the difference
    chunkflow = "chunkflow" in tune_set   # per-lane chunk progression:
    # ONE while loop; each lane advances through its own chunk sequence
    # via a rare gated in-body transition, instead of the global
    # round-per-chunk lockstep whose per-round max-lane tails idled
    # ~half of all iterations at the bench shape (measured round 4)
    mlit = "mlit" in tune_set   # multi-literal iterations (v14): calls
    # 10-27 (the match length/distance path) leave literal lanes idle, so
    # TWO more literal decodes fuse into them exactly like lit1 fuses
    # into calls 2-9 — is_match2 at call 10, lit2 tree at 11-18,
    # is_match3 at 19, lit3 tree at 20-27.  A lane in a literal run
    # advances up to 3 packets/iteration at ~the same call count; a
    # consumed is-match bit that says "match" carries over as ST_PIM.
    # Measured packet mix on the bench corpus (tools/pktstats.py):
    # P(lit) = 0.83 -> mean advance 2.04 packets/iter.  The literal
    # family layout switches to plane-high order so the (always
    # unmatched) lit2/lit3 tree parts touch only the plane-0 pages.
    litrow = "litrow" in tune_set   # one-page-per-context literal layout:
    # the context's 256-node tree row is selected ONCE per literal and
    # every level becomes a register gather + masked register update
    # (written back to VMEM at the literal's commit point), replacing the
    # per-level multi-page VMEM gather/store loops
    layout, tot_pages = _family_layout(lc, lp, litrow)
    pg_init = [int(S.PROB_INIT)] * tot_pages
    for _nm, (_b, _w, _npg, _pk) in layout.items():
        if _pk:
            for _i in range(_npg):
                pg_init[_b + _i] = int(_PROB_INIT2)
    spec, _, it_s = ablate_spec.partition("@")
    ablate = set(filter(None, spec.split(",")))
    fixed_iters = int(it_s or "0")
    ring = _ring(n_streams)
    n = n_streams
    # staging fields: input 512B pages get 20 bits (512 MB packed per
    # group), output word pages ride in their own x_ref lane (full int32)
    # — big enough for the reference's default MT block of 4x dict = 64 MB
    # (Lzma2Enc.c:223-233) and level-9 dictionaries (LzmaEnc.c:58)
    assert in_pages <= (1 << 20) and out_pages // 4 <= (1 << 26), \
        (in_pages, out_pages)
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1
    dic_cap = out_pages * PAGE
    # direct-bits trip count: a valid distance needs
    # 2^(nd+1) <= dist+1 <= dic_cap, nd = ndirect + NUM_ALIGN_BITS
    nmax = min(26, max(0, (dic_cap - 1).bit_length() - 1 - S.NUM_ALIGN_BITS))

    out_pages4 = out_pages // 4   # packed dict/output: 4 dict pages per
                                  # word page of 128 lanes x 4 byte slots;
                                  # byte p lives at [p>>9, s, p&127],
                                  # bits 8*((p>>7)&3)

    def kernel(meta_ref, src_ref, out_ref, status_ref,
               fam_ref, ring_ref, w_ref, m_ref, a_ref, b_ref, i0_ref, i1_ref,
               x_ref, p_ref, prev_ipg, tracked, pend_dma, needf, needm,
               needa, needb, dsem, isem, fsem, msem, asem, bsem):
        lane_i = jax.lax.broadcasted_iota(_I32, (n, PAGE), 1)
        zero = jnp.zeros((n, PAGE), _I32)
        zerou = jnp.zeros((n, PAGE), _U32)

        pack_len = meta_ref[0]
        limit = meta_ref[1]          # = unpack_len (fresh group: outpos 0)
        active_i = meta_ref[2]       # i32: bool loop-invariants would
        active0 = active_i != 0      # materialize as i8 (Mosaic can't
                                     # truncate those back to i1 masks)

        # ---- init ---------------------------------------------------------
        for _p in range(tot_pages):
            fam_ref[_p] = jnp.full((n, PAGE), pg_init[_p], _I32)
        w_ref[:] = zero
        p_ref[:] = zero
        cp0 = pltpu.make_async_copy(src_ref.at[0], i0_ref, isem)
        cp0.start()
        cp1 = pltpu.make_async_copy(src_ref.at[min(1, in_pages - 1)],
                                    i1_ref, isem)
        cp1.start()
        cp0.wait()
        cp1.wait()
        for s in range(n):
            prev_ipg[s] = jnp.int32(0)
            tracked[s] = jnp.int32(0)
        for g in range(-(-n // 32)):
            # pending-DMA flags: ONE bitmask word per 32 streams, so the
            # every-iteration wait scans read ngr words instead of n flags
            # (scalar SMEM reads per iteration are the staging floor)
            pend_dma[g] = jnp.int32(0)
            needf[g] = jnp.int32(0)
            needm[g] = jnp.int32(0)
            needa[g] = jnp.int32(0)
            needb[g] = jnp.int32(0)

        def gat(tbl, idx):
            return jnp.take_along_axis(tbl, jnp.clip(idx, 0, PAGE - 1),
                                       axis=1)

        def getv(st, k):
            """Broadcast packed per-stream scalar k to all lanes.

            ``k`` is a Python int, so the slice is static; the getvslice
            variant trades the dynamic register gather for a static
            1-lane slice + lane broadcast."""
            if "getvslice" in tune_set:
                return jnp.broadcast_to(st[:, k:k + 1], (n, PAGE))
            return gat(st, zero + k)

        def setv(st, k, v):
            return jnp.where(lane_i == k, v, st)

        sid = jax.lax.broadcasted_iota(_I32, (n, PAGE), 0)

        ngr = -(-n // 32)  # stream groups of 32 for packed event words
        EVL = PAGE - 32    # event words: row 0, lanes EVL..EVL+ngr-1

        def _pack_events(evt):
            """[n,PAGE] 0/1 (lane-uniform) -> ONE [n,PAGE] array whose row 0
            holds group g's packed 32-bit event word at lane EVL+g.

            Per-group masked sublane sums (each stream owns a distinct bit,
            so sum == OR; bit 31's int32 wrap is benign).  Two fancier
            forms were measured SLOWER on-chip (round 3): a single fused
            sublane sum over all groups, and an MXU bf16 dot with byte
            columns — both ~+3-4 us/iter vs this at S=32 and no better at
            S=128.  The reduction itself is the cost, not its count.
            """
            shifted = evt << (sid & 31)
            rows = jnp.zeros((n, PAGE), _I32)
            for g in range(ngr):
                gw = jnp.sum(jnp.where((sid >> 5) == g, shifted, 0), axis=0)
                rows = jnp.where((sid == 0) & (lane_i == EVL + g),
                                 gw[None, :][:, EVL + g:EVL + g + 1], rows)
            return rows

        ngr2 = -(-n // 16)  # 16 streams/word when carrying 2-bit fields

        def _pack_events2(evt_p, evt_m):
            """2-bit per-stream event fields (bit0 page, bit1 match-row),
            16 streams per word at row 0 lanes EVL..EVL+ngr2-1."""
            shifted = (evt_p | (evt_m << 1)) << ((sid & 15) << 1)
            rows = jnp.zeros((n, PAGE), _I32)
            for g in range(ngr2):
                gw = jnp.sum(jnp.where((sid >> 4) == g, shifted, 0), axis=0)
                rows = jnp.where((sid == 0) & (lane_i == EVL + g),
                                 gw[None, :][:, EVL + g:EVL + g + 1], rows)
            return rows

        def scalar_stage2():
            """stage2 staging: split page events (rare: input-page advance,
            write-window flush) from match-row events (hot: one per matched
            literal with a far source).  The match path costs ONE scalar
            VMEM read — lane 1 carries m_w with the ring-vs-HBM verdict
            precomputed vector-side at bit 30."""
            if "stage" in ablate:
                return
            for g in range(ngr2):
                ew = x_ref[0, EVL + g]
                @pl.when(ew != 0)
                def _(ew=ew, g=g):
                    for s in range(g * 16, min(n, g * 16 + 16)):
                        sh = (s - g * 16) * 2
                        @pl.when(((ew >> sh) & 1) != 0)
                        def _(s=s):
                            _stage_page(s)
                        @pl.when(((ew >> sh) & 2) != 0)
                        def _(s=s):
                            _stage_m(s)
            _stage_waits()

        def _stage_page(s):
            v = x_ref[s, 0]
            pg_i = v & 0xFFFFF
            cu = x_ref[s, 2]
            @pl.when(cu != tracked[s])
            def _(cu=cu, s=s):
                ring_ref[tracked[s] & (ring - 1), s, :] = w_ref[s, :]
                pltpu.make_async_copy(w_ref.at[s],
                                      out_ref.at[tracked[s], s],
                                      fsem).start()
                needf[s // 32] = needf[s // 32] | _bitc(s)
                tracked[s] = cu
            @pl.when(pg_i != prev_ipg[s])
            def _(pg_i=pg_i, s=s):
                i0_ref[s, :] = i1_ref[s, :]
                i1p = jnp.minimum(pg_i + 1, in_pages - 1)
                pltpu.make_async_copy(src_ref.at[i1p, s],
                                      i1_ref.at[s], dsem.at[s]).start()
                pend_dma[s // 32] = pend_dma[s // 32] | _bitc(s)
                prev_ipg[s] = pg_i

        def _stage_m(s):
            w1 = x_ref[s, 1]
            @pl.when((w1 >> 30) != 0)
            def _(w1=w1, s=s):
                m_ref[s, :] = ring_ref[w1 & (ring - 1), s, :]
            @pl.when((w1 >> 30) == 0)
            def _(w1=w1, s=s):
                pltpu.make_async_copy(out_ref.at[w1 & 0x07FFFFFF, s],
                                      m_ref.at[s], msem).start()
                needm[s // 32] = needm[s // 32] | _bitc(s)

        def _stage_copy_two(s):
            v2 = x_ref[s, 0]
            pg_a = v2 & 0x07FFFFFF
            @pl.when(((v2 >> 27) & 1) != 0)
            def _(v2=v2, pg_a=pg_a, s=s):
                @pl.when(((v2 >> 29) & 1) != 0)
                def _(pg_a=pg_a, s=s):
                    a_ref[s, :] = ring_ref[pg_a & (ring - 1), s, :]
                @pl.when(((v2 >> 29) & 1) == 0)
                def _(pg_a=pg_a, s=s):
                    pltpu.make_async_copy(out_ref.at[pg_a, s],
                                          a_ref.at[s], asem).start()
                    needa[s // 32] = needa[s // 32] | _bitc(s)
            @pl.when(((v2 >> 28) & 1) != 0)
            def _(v2=v2, pg_a=pg_a, s=s):
                pg_b = jnp.minimum(pg_a + 1, out_pages4 - 1)
                @pl.when(((v2 >> 30) & 1) != 0)
                def _(pg_b=pg_b, s=s):
                    b_ref[s, :] = ring_ref[pg_b & (ring - 1), s, :]
                @pl.when(((v2 >> 30) & 1) == 0)
                def _(pg_b=pg_b, s=s):
                    pltpu.make_async_copy(out_ref.at[pg_b, s],
                                          b_ref.at[s], bsem).start()
                    needb[s // 32] = needb[s // 32] | _bitc(s)

        def scalar_stage():
            """Event-gated per-stream staging driven by packed x_ref words.

            lane 0 of x_ref: bits [0:20) staged input page, [29]
            load-matched-row flag; lane 1 holds the matched-byte word page
            when bit 29 is set; lane 2 the current output word page (flush
            target check).  Row 0, lane EVL+g holds 32 per-stream EVENT bits for
            stream group g (computed by the vector core from the carried
            ST_PIPG / ST_PCW mirrors): the scalar core reads one word per
            32 streams and touches only streams that actually have a page
            event — scalar VMEM reads are the staging cost, and most
            iterations most streams have no event.

            The dictionary (= the packed output) lives in HBM: page
            flushes are VMEM→HBM DMAs, and dictionary reads come from the
            VMEM ring (last RING flushed pages) or an HBM DMA for older
            pages.  DMA starts are issued for all streams first and waited
            in a second pass so the latencies overlap across streams.
            """
            if "stage" in ablate:
                return
            for g in range(ngr):
                ew = x_ref[0, EVL + g]
                @pl.when(ew != 0)
                def _(ew=ew, g=g):
                    for s in range(g * 32, min(n, g * 32 + 32)):
                        @pl.when(((ew >> (s - g * 32)) & 1) != 0)
                        def _(s=s):
                            _stage_one(s)
            _stage_waits()

        def _stage_one(s):
                v = x_ref[s, 0]
                pg_i = v & 0xFFFFF
                cu = x_ref[s, 2]
                @pl.when(cu != tracked[s])
                def _(cu=cu, s=s):
                    # flush the write window: ring slot (sync) + HBM (async)
                    ring_ref[tracked[s] & (ring - 1), s, :] = w_ref[s, :]
                    pltpu.make_async_copy(w_ref.at[s],
                                          out_ref.at[tracked[s], s],
                                          fsem).start()
                    needf[s // 32] = needf[s // 32] | _bitc(s)
                    tracked[s] = cu
                # input double-buffer: i1 always holds the NEXT page; the
                # prefetch started here is waited in _stage_waits (which
                # runs every iteration), so any pending prefetch is always
                # complete before the next advance swaps i0 <- i1
                @pl.when(pg_i != prev_ipg[s])
                def _(pg_i=pg_i, s=s):
                    i0_ref[s, :] = i1_ref[s, :]
                    i1p = jnp.minimum(pg_i + 1, in_pages - 1)
                    cb = pltpu.make_async_copy(src_ref.at[i1p, s],
                                               i1_ref.at[s], dsem.at[s])
                    cb.start()
                    pend_dma[s // 32] = pend_dma[s // 32] | _bitc(s)
                    prev_ipg[s] = pg_i
                @pl.when((v >> 29) != 0)
                def _(v=v, cu=cu, s=s):
                    mw = x_ref[s, 1]
                    @pl.when(mw + ring >= cu)
                    def _(mw=mw, s=s):
                        m_ref[s, :] = ring_ref[mw & (ring - 1), s, :]
                    @pl.when(mw + ring < cu)
                    def _(mw=mw, s=s):
                        pltpu.make_async_copy(out_ref.at[mw, s],
                                              m_ref.at[s], msem).start()
                        needm[s // 32] = needm[s // 32] | _bitc(s)

        def _stage_copy_one(s):
            v2 = x_ref[s, 0]
            pg_a = v2 & 0x0FFFFFFF
            cw_s = tracked[s]
            @pl.when(((v2 >> 28) & 1) != 0)
            def _(pg_a=pg_a, cw_s=cw_s, s=s):
                @pl.when(pg_a + ring >= cw_s)
                def _(pg_a=pg_a, s=s):
                    a_ref[s, :] = ring_ref[pg_a & (ring - 1), s, :]
                @pl.when(pg_a + ring < cw_s)
                def _(pg_a=pg_a, s=s):
                    pltpu.make_async_copy(out_ref.at[pg_a, s],
                                          a_ref.at[s], asem).start()
                    needa[s // 32] = needa[s // 32] | _bitc(s)
            @pl.when(((v2 >> 29) & 1) != 0)
            def _(pg_a=pg_a, cw_s=cw_s, s=s):
                pg_b = jnp.minimum(pg_a + 1, out_pages4 - 1)
                @pl.when(pg_b + ring >= cw_s)
                def _(pg_b=pg_b, s=s):
                    b_ref[s, :] = ring_ref[pg_b & (ring - 1), s, :]
                @pl.when(pg_b + ring < cw_s)
                def _(pg_b=pg_b, s=s):
                    pltpu.make_async_copy(out_ref.at[pg_b, s],
                                          b_ref.at[s], bsem).start()
                    needb[s // 32] = needb[s // 32] | _bitc(s)

        def _word_waits(flags, wait_one):
            """Drain flagged per-stream DMA waits via ngr bitmask words.

            The common case (no flags set) costs ONE scalar SMEM read per
            32 streams per iteration instead of one per stream.
            """
            for g in range(-(-n // 32)):
                wd = flags[g]
                @pl.when(wd != 0)
                def _(wd=wd, g=g):
                    for s in range(g * 32, min(n, g * 32 + 32)):
                        @pl.when(((wd >> (s - g * 32)) & 1) != 0)
                        def _(s=s):
                            wait_one(s)
                    flags[g] = jnp.int32(0)

        def _stage_waits():
            _word_waits(pend_dma, lambda s: pltpu.make_async_copy(
                src_ref.at[0, s], i1_ref.at[s], dsem.at[s]).wait())
            _word_waits(needf, lambda s: pltpu.make_async_copy(
                w_ref.at[s], out_ref.at[0, s], fsem).wait())
            _word_waits(needm, lambda s: pltpu.make_async_copy(
                out_ref.at[0, s], m_ref.at[s], msem).wait())

        CHECK_EVERY = 64  # busy-check period (power of two)

        # per-chunk metadata tables (cumulative ends / flags per chunk lane;
        # grammar: ``Lzma2Dec.c:14-26``)
        pk_tab = meta_ref[3]         # cumulative packed end per chunk lane
        ul_tab = meta_ref[4]         # cumulative unpacked end per chunk lane
        fl_tab = meta_ref[5]         # bit0 = valid, bit1 = state reset,
                                     # bit2 = uncompressed copy chunk

        def emit_stage(st, inpos, outpos, limit, cmodeb, force=False,
                       vals=None):
            """Write the NEXT iteration's staging words + event mirrors.

            Called at the END of each body iteration (and at chunk
            transitions, force=True), so the scalar core's event reads at
            the next iteration's start consume an x_ref store the vector
            core issued a full iteration earlier — the read-after-write
            sync no longer stalls the scalar pipeline mid-iteration
            (software pipelining of phase 0).

            x_ref layout: lane 0 = staged input page | need-m flag bit 29;
            lane 1 = matched-byte word page; lane 2 = current output word
            page; row 0 lanes EVL.. = packed event words.

            ``vals``, when given, supplies the post-body per-stream scalars
            (err/plen/state/rep0/pipg/pcw) so no st register gathers run
            here — dynamic gathers are the measured bit-path cost (round-4
            probe), so each scalar is extracted once per iteration.
            """
            ipg = inpos >> 9
            cur_w = outpos >> 9
            if vals is None:
                vals = dict(err=getv(st, ST_ERR) != 0,
                            plen=getv(st, ST_PLEN),
                            state=getv(st, ST_STATE),
                            rep0=getv(st, ST_REP0),
                            pipg=getv(st, ST_PIPG),
                            pcw=getv(st, ST_PCW),
                            chunk=getv(st, ST_CHUNK))
            if chunkflow:
                # a lane at its chunk end still has the NEXT chunk's first
                # packet to decode in the transition iteration: keep the
                # matched-literal row staged until the lane is truly done
                # (no-reset chunks carry state >= 7 across the boundary,
                # so the first packet can need m_ref immediately)
                pos_gate = vals["chunk"] < n_chunks
            else:
                pos_gate = outpos < limit
            do = (active0 & ~vals["err"] & ~cmodeb & pos_gate
                  & (vals["plen"] == 0))
            mpos = jnp.clip(outpos - vals["rep0"] - 1, 0, dic_cap - 1)
            m_w = mpos >> 9
            need_m = do & (vals["state"] >= 7) & (m_w != cur_w)
            if pprev:   # page cur_w-1 is served by the register instead
                need_m = need_m & (m_w != cur_w - 1)
            st = setv(st, ST_PIPG, ipg)
            st = setv(st, ST_PCW, cur_w)
            if stage2:
                # lane 1 = m_w with the ring-vs-HBM verdict at bit 30 (the
                # scalar m-path then needs only this ONE VMEM read); event
                # words carry 2-bit page|match fields per stream
                m_field = m_w | jnp.where(need_m & (m_w + ring >= cur_w),
                                          1 << 30, 0)
                packed = jnp.clip(ipg, 0, in_pages - 1)
                if force:
                    evt_p = zero + 1
                else:
                    evt_p = jnp.where((ipg != vals["pipg"])
                                      | (cur_w != vals["pcw"]), 1, 0)
                evt_m = jnp.where(need_m, 1, 0)
                erows = (zero if "events" in ablate
                         else _pack_events2(evt_p, evt_m))
                x_ref[:] = jnp.where(lane_i == 0, packed,
                                     jnp.where(lane_i == 1, m_field,
                                               jnp.where(lane_i == 2, cur_w,
                                                         erows)))
                return st
            packed = (jnp.clip(ipg, 0, in_pages - 1)
                      | jnp.where(need_m, 1 << 29, 0))
            if force:
                evt = zero + 1
            else:
                evt = jnp.where((ipg != vals["pipg"])
                                | (cur_w != vals["pcw"]) | need_m,
                                1, 0)
            erows = zero if "events" in ablate else _pack_events(evt)
            x_ref[:] = jnp.where(lane_i == 0, packed,
                                 jnp.where(lane_i == 1, m_w,
                                           jnp.where(lane_i == 2, cur_w,
                                                     erows)))
            return st

        def body(carry):
            (it, busy_s, rng, code, inpos, st, limit, cmode_i) = carry
            cmodeb = cmode_i != 0

            # Termination check, lagged and periodic.  The while cond must
            # depend only on values resolvable EARLY in the body: a cond fed
            # by the body's final vector results serializes iterations on the
            # full dependency chain (measured).  Checking carry-in state
            # every K-th iteration keeps the scalar core's branch ahead of
            # the vector pipeline; the <=K overshoot iterations are no-ops
            # (all lanes masked off).
            # lax.cond, not where(): the any()->scalar read drains the whole
            # queued vector pipeline, so it must genuinely not execute on
            # the other K-1 iterations
            def _check():
                busy_in = (active_i != 0) & (getv(st, ST_ERR) == 0) & (
                    (getv(st, ST_OUTPOS) < limit) | (getv(st, ST_PLEN) > 0))
                if chunkflow:
                    # a lane at a chunk boundary (outpos == limit) stays
                    # busy until its transition advances ST_CHUNK; done
                    # lanes carry the n_chunks sentinel
                    busy_in = busy_in | (
                        (active_i != 0) & (getv(st, ST_ERR) == 0)
                        & (getv(st, ST_CHUNK) < n_chunks))
                return jnp.where(jnp.any(busy_in), 1, 0).astype(_I32)

            busy_s = jax.lax.cond((it & (CHECK_EVERY - 1)) == 0,
                                  _check, lambda: jnp.int32(1))

            if chunkflow:
                # scalar staging first (it consumes only last iteration's
                # x_ref), so i0/i1 line up with the emitted input page
                # before the transition's header fetch reads them
                (scalar_stage2 if stage2 else scalar_stage)()

                # ---- per-lane chunk transition (gated; ~1 event per
                # ~chunk-size iterations per lane) -------------------------
                cvec = getv(st, ST_CHUNK)
                outpos_t = getv(st, ST_OUTPOS)
                plen_t = getv(st, ST_PLEN)
                errv_t = getv(st, ST_ERR) != 0
                fin = (active0 & ~errv_t & (outpos_t >= limit)
                       & (plen_t == 0) & (cvec < n_chunks))
                any_fin = jnp.any(fin)
                # captured masks cross the cond boundaries as i32, never
                # i1 (Mosaic materializes captured bools as i8 and cannot
                # truncate them back — compiled-only corruption)
                fin_i = jnp.where(fin, 1, 0)
                cnx = jnp.minimum(cvec + 1, n_chunks - 1)
                flags_n = gat(fl_tab, cnx)
                # prob-model reset pages under pl.when (ref writes can't
                # live in the value cond); the mask skips the ~errn filter
                # — resetting an errored/done lane's probs is harmless
                reset_pre_i = jnp.where(
                    fin & (cvec + 1 < n_chunks)
                    & ((flags_n & 1) != 0) & ((flags_n & 2) != 0), 1, 0)
                @pl.when(any_fin)
                def _():
                    rp = reset_pre_i != 0
                    for _p in range(tot_pages):
                        fam_ref[_p] = jnp.where(rp, pg_init[_p],
                                                fam_ref[_p])
                i0v_t = i0_ref[:]
                i1v_t = i1_ref[:]
                # the staged input page is keyed to the PRE-transition
                # inpos (the transition may push inpos ≤ 6 bytes across a
                # page boundary; i0+i1 still cover the drift — all staging
                # offset math this iteration uses ipg_stage)
                ipg_stage = inpos >> 9

                def _trans(args):
                    rng, code, inpos, st, limit, cmode_i = args
                    fin = fin_i != 0         # rebuilt from the i32 capture
                    ipg_t = inpos >> 9       # the staged input page
                    pk_end = gat(pk_tab, cvec)
                    # verdict for the finished chunk: exact consumption
                    # incl. the trailing renormalize (LzmaDec.c:412)
                    consumed = inpos
                    tail = (fin & (cmode_i == 0) & (rng < _TOP)
                            & (consumed < pk_end))
                    consumed = jnp.where(tail, consumed + 1, consumed)
                    errn = fin & (consumed != pk_end)
                    adv = fin & ~errn & (cvec + 1 < n_chunks)
                    valid = adv & ((flags_n & 1) != 0)
                    reset = valid & ((flags_n & 2) != 0)
                    is_copy = valid & ((flags_n & 4) != 0) if has_copy \
                        else valid & (zero != 0)
                    vlz = valid & ~is_copy
                    pk_start = pk_end
                    pk_end2 = gat(pk_tab, cnx)
                    inpos = jnp.where(fin & ~errn, pk_end, inpos)

                    def fetch(pos):
                        off = (pos >> 2) - (ipg_t << 7)
                        vw = jnp.where(off < PAGE, gat(i0v_t, off),
                                       gat(i1v_t, off - PAGE)).astype(_U32)
                        return (vw >> ((pos & 3) << 3).astype(_U32)) & 0xFF
                    hb = [fetch(pk_start + k) for k in range(5)]
                    errh = vlz & ((hb[0] != 0) | (pk_end2 - pk_start < 5))
                    rng = jnp.where(vlz, jnp.full_like(rng, _MASK32), rng)
                    code = jnp.where(vlz, (hb[1] << 24) | (hb[2] << 16)
                                     | (hb[3] << 8) | hb[4], code)
                    inpos = jnp.where(vlz, pk_start + 5, inpos)
                    limit = jnp.where(valid, gat(ul_tab, cnx),
                                      jnp.where(fin, outpos_t, limit))
                    cmode_i = jnp.where(fin,
                                        jnp.where(is_copy, 1, 0), cmode_i)
                    erra = errn | errh
                    st = jnp.where((lane_i == ST_ERR) & erra, 1, st)
                    st = setv(st, ST_CHUNK,
                              jnp.where(valid, cvec + 1,
                                        jnp.where(fin, n_chunks, cvec)))
                    st = jnp.where(reset & (lane_i >= ST_STATE)
                                   & (lane_i <= ST_REP3), 0, st)
                    # flags bit3 = dict reset: the next group of a
                    # multi-group lane starts here; coder positions and
                    # match-distance validity rebase to this outpos
                    dicreset = valid & ((flags_n & 8) != 0)
                    st = jnp.where((lane_i == ST_DBASE) & dicreset,
                                   outpos_t, st)
                    return (rng, code, inpos, st, limit, cmode_i)

                (rng, code, inpos, st, limit, cmode_i) = jax.lax.cond(
                    any_fin, _trans, lambda a: a,
                    (rng, code, inpos, st, limit, cmode_i))
                cmodeb = cmode_i != 0

            outpos = getv(st, ST_OUTPOS)

            # ---- phase 0: page bookkeeping (scalar staging, all gated) -----
            # ipg is a per-iteration local (the staged input-page index);
            # fetches within the iteration drift < 512 B past it, so two
            # pages cover every renorm byte.  Input pages are DMA'd from
            # HBM on demand (~1 DMA wait per 512 consumed bytes).
            #
            # The write window ``w_ref`` holds the 512-byte word page
            # currently being written (``cur_w``), in the packed output
            # layout; it is flushed to ``out_ref`` only when the stream
            # crosses a word-page boundary (``tracked`` SMEM), and any read
            # that lands on page ``cur_w`` is served from the window
            # register.  All writes in one iteration stay within page
            # ``cur_w`` (literals write 1 byte; copies are capped at the
            # word-page end), so pages < cur_w are always complete in
            # out_ref.
            # The staging words for THIS iteration were emitted at the end
            # of the previous one (emit_stage) — the scalar core only
            # consumes here (software-pipelined phase 0).
            # one register gather per packed scalar per iteration — every
            # later use consumes these locals (dynamic gathers are the
            # measured bit-path cost; see docs/ROUND4.md)
            ipg = ipg_stage if chunkflow else (inpos >> 9)
            cur_w = outpos >> 9
            rep0c = getv(st, ST_REP0)
            rep1c = getv(st, ST_REP1)
            rep2c = getv(st, ST_REP2)
            rep3c = getv(st, ST_REP3)
            statec = getv(st, ST_STATE)
            lastbc = getv(st, ST_LAST)
            dbasec = getv(st, ST_DBASE)
            plenc = getv(st, ST_PLEN)
            pdistc = getv(st, ST_PDIST)
            pipgc = getv(st, ST_PIPG)
            pcwc = getv(st, ST_PCW)
            err0 = getv(st, ST_ERR) != 0
            do = (active0 & ~err0 & ~cmodeb & (outpos < limit)
                  & (plenc == 0))
            mpos = jnp.clip(outpos - rep0c - 1, 0, dic_cap - 1)
            m_w = mpos >> 9
            if not chunkflow:   # chunkflow ran it before the transition
                (scalar_stage2 if stage2 else scalar_stage)()

            if has_copy:
                # ---- phase 0.5: copy-chunk mover ------------------------
                # The LZMA2 uncompressed-chunk path
                # (``Lzma2Dec.c:159-289``'s LzmaDec_UpdateWithUncompressed
                # analog), in-kernel: up to 512 - (outpos & 511) raw bytes
                # per iteration flow from the two staged input pages into
                # the write window, sharing the flush/ring/DMA machinery
                # with the LZMA path so later chunks can match into the
                # copied bytes.  Traced only for batches that contain a
                # copy chunk (jit-static has_copy).
                ac = active0 & ~err0 & cmodeb & (outpos < limit)
                wl512c = outpos & 511
                ioff = inpos - (ipg << 9)          # [0, 512)
                stepc = jnp.where(ac, jnp.minimum(512 - wl512c,
                                                  limit - outpos), 0)
                wvc = w_ref[:]
                wnewc = zero
                for r in range(4):
                    j = (r * PAGE + lane_i) - wl512c
                    soff = ioff + j                # < 1024: 2 pages cover
                    word = jnp.where(soff < 512, gat(i0_ref[:], soff >> 2),
                                     gat(i1_ref[:], (soff >> 2) - PAGE))
                    byte = (word >> ((soff & 3) << 3)) & 0xFF
                    keep = (wvc >> (r << 3)) & 0xFF
                    wmask = ac & (j >= 0) & (j < stepc)
                    wnewc = wnewc | (jnp.where(wmask, byte, keep)
                                     << (r << 3))
                w_ref[:] = wnewc
                outpos = jnp.where(ac, outpos + stepc, outpos)
                inpos = jnp.where(ac, inpos + stepc, inpos)
                lposc = jnp.maximum(outpos - 1, 0)
                nlastc = (gat(wnewc, lposc & (PAGE - 1))
                          >> (((lposc >> 7) & 3) << 3)) & 0xFF
                lastbc = jnp.where(ac, nlastc, lastbc)
                st = setv(st, ST_LAST, lastbc)

            if labyte:
                def la_fill(inpos):
                    """Lookahead as BYTES ON LANES: lane k of the returned
                    [S,128] register holds byte inpos+k (at most 12 are
                    consumed per refill segment).  Per-call renorm is then
                    ONE register gather + a counter add instead of the
                    3-word shift chain (~10 fewer vector ops per bit call;
                    the refill itself costs about the same as the 3-word
                    form: 8 page gathers + a 4-way word select)."""
                    wbase = inpos >> 2
                    r0 = inpos & 3
                    ws = []
                    for j in range(4):
                        off = wbase + j - (ipg << 7)
                        ws.append(jnp.where(off < PAGE, gat(i0_ref[:], off),
                                            gat(i1_ref[:], off - PAGE)))
                    k = r0 + lane_i
                    jw = k >> 2
                    wsel = ws[0]
                    for i in range(1, 4):
                        wsel = jnp.where(jw == i, ws[i], wsel)
                    return (wsel >> ((k & 3) << 3)) & 0xFF

                la_state = {"b": la_fill(inpos), "base": inpos,
                            "lab": zero}

                def la_byte(need):
                    """Consume one lookahead byte on `need` lanes."""
                    byt = jnp.take_along_axis(la_state["b"],
                                              la_state["lab"], axis=1)
                    la_state["lab"] = (la_state["lab"]
                                       + jnp.where(need, 1, 0))
                    return byt.astype(_U32)

                def la_inpos():
                    """True input position (base of last refill + consumed)."""
                    return la_state["base"] + la_state["lab"]

                def la_refill():
                    pos = la_inpos()
                    la_state["b"] = la_fill(pos)
                    la_state["base"] = pos
                    la_state["lab"] = zero
            else:
                def la_fill(inpos):
                    """12-byte LE lookahead [inpos, inpos+12) from the staged
                    pages, as three u32 registers (byte inpos+k at bits 8k of
                    word k>>2).  Gathers happen only here — per-call renorm is
                    pure ALU (measured: per-call page gathers were ~16 us/iter
                    of the bit-call cost at S=128).  Each refill covers the 12
                    worst-case renorm bytes until the next one (one byte per
                    bit call; direct bits renorm at most once per 8 bits)."""
                    wbase = inpos >> 2
                    sh = ((inpos & 3) << 3).astype(_U32)
                    ws = []
                    for k in range(4):
                        off = wbase + k - (ipg << 7)
                        ws.append(jnp.where(off < PAGE, gat(i0_ref[:], off),
                                            gat(i1_ref[:], off - PAGE))
                                  .astype(_U32))
                    la = []
                    for k in range(3):
                        hi = ws[k + 1] << ((32 - sh) & 31)
                        la.append((ws[k] >> sh)
                                  | jnp.where(sh == 0, zerou, hi))
                    return la

                la_state = {"w": la_fill(inpos)}

                def la_byte(need):
                    """Consume one lookahead byte on `need` lanes (LE order)."""
                    w0, w1, w2 = la_state["w"]
                    byt = w0 & 0xFF
                    la_state["w"] = [
                        jnp.where(need, (w0 >> 8) | (w1 << 24), w0),
                        jnp.where(need, (w1 >> 8) | (w2 << 24), w1),
                        jnp.where(need, w2 >> 8, w2)]
                    return byt

            def renorm(rc, do):
                """Range renormalization: one lookahead byte, no gathers.

                In labyte mode ``rc[2]`` (inpos) is STALE between refill
                points — the true position is ``la_inpos()``, recomputed at
                refills and at the end of phase 1."""
                if "norenorm" in ablate:   # probe: renorm's share of bits
                    return rc
                rng, code, inpos = rc
                need = (rng < _TOP) & do
                byt = la_byte(need)
                code = jnp.where(need, (code << 8) | byt, code)
                rng = jnp.where(need, rng << 8, rng)
                if not labyte:
                    inpos = jnp.where(need, inpos + 1, inpos)
                return (rng, code, inpos)

            def bit_multi(rc, parts, rowparts=()):
                """ONE adaptive bit decode serving several families at once.

                ``rowparts`` (litrow) are literal-tree parts whose
                probabilities live in caller-held page-row REGISTERS:
                each is a dict {rows: [row] or [row0,row1,row2],
                plane: None | vec, sym: node vec, mask} — the prob read
                is a register gather at word ``sym >> 1`` and the update
                is a masked register merge (``rows`` mutated in place;
                the caller writes rows back to fam_ref at the literal's
                commit point).

                ``parts`` is a list of ``(fam, idx, mask)`` with pairwise
                disjoint masks: a lane decodes against the family whose
                mask covers it.  The renormalization and the bound/compare/
                update arithmetic are shared across parts (that is the
                saving — fusing lane-exclusive calls halves the per-call
                vector overhead); only the per-family page gathers/stores
                stay per part.  A 4th tuple element bounds the page-select
                loop: a part whose idx provably stays below ``maxw`` entries
                touches only the first ceil(maxw/256) packed pages (the
                mlit plane-0 literal parts).
                """
                if "bits" in ablate:
                    return rc, zero
                parts = [p if len(p) == 4 else (*p, None) for p in parts]
                masks = [p[2] for p in parts] + [rp["mask"]
                                                for rp in rowparts]
                do = masks[0]
                for mk in masks[1:]:
                    do = do | mk
                rng, code, inpos = renorm(rc, do)
                # multi-page families use the 16-bit packed layout (word
                # index = entry >> 1, half by bit 0, sh ∈ {0,16}); the
                # gathered word is kept for the masked halfword merge at
                # update time.  Single-page families read/store the lane
                # word directly — no extract/merge overhead.
                p = zero
                lns = []
                for fam, idx, mask, maxw in parts:
                    base, width, npg, packed = layout[fam]
                    if maxw is not None and packed:
                        npg = min(npg, -(-maxw // (2 * PAGE)))
                    if not noclip:
                        # masked-off lanes carry garbage idx; with noclip
                        # they are bounded instead by the page-select
                        # guards and the lane clip in gat() — provably
                        # unused, so the clip is redundant (measured via
                        # the tune flag, then defaulted)
                        idx = jnp.clip(idx, 0,
                                       (width if maxw is None
                                        else min(width, maxw)) - 1)
                    if "probconst" in ablate:   # probe: gather+store share
                        p = zero + S.PROB_INIT
                        continue
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
                    one = len(parts) == 1 and not rowparts
                    p = pp if one else jnp.where(mask, pp, p)
                rws = []
                for rp in rowparts:
                    sym_n = rp["sym"]
                    wl_n = sym_n >> 1
                    sh_n = (sym_n & 1) << 4
                    rowk = rp["rows"][0]
                    if rp["plane"] is not None:
                        rowk = jnp.where(rp["plane"] == 1, rp["rows"][1],
                                         jnp.where(rp["plane"] == 2,
                                                   rp["rows"][2], rowk))
                    wv_n = gat(rowk, wl_n)
                    pp = (wv_n >> sh_n) & 0xFFFF
                    rws.append((rp, wl_n, sh_n, wv_n))
                    one = not parts and len(rowparts) == 1
                    p = pp if one else jnp.where(rp["mask"], pp, p)
                bound = (rng >> S.RC_BIT_MODEL_TOTAL_BITS) * p.astype(_U32)
                bit0 = code < bound
                newp = jnp.where(
                    bit0,
                    p + ((S.RC_BIT_MODEL_TOTAL - p) >> S.RC_MOVE_BITS),
                    p - (p >> S.RC_MOVE_BITS))
                for base, npg, ln, pg, sh, wv, mask, packed in lns:
                    if "noupdate" in ablate:   # probe: RMW-store share
                        break
                    # the store mask `oh` restricts to this part's lanes,
                    # where per-lane `newp` was computed from this part's p
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
                for rp, wl_n, sh_n, wv_n in rws:
                    if "noupdate" in ablate:
                        break
                    merged = ((wv_n & (((zero + 0xFFFF) << sh_n) ^ -1))
                              | (newp << sh_n))
                    oh = (lane_i == wl_n) & rp["mask"]
                    if rp["plane"] is None:
                        rp["rows"][0] = jnp.where(oh, merged, rp["rows"][0])
                    else:
                        for j in range(3):
                            rp["rows"][j] = jnp.where(
                                oh & (rp["plane"] == j), merged,
                                rp["rows"][j])
                rng = jnp.where(do, jnp.where(bit0, bound, rng - bound), rng)
                code = jnp.where(do, jnp.where(bit0, code, code - bound),
                                 code)
                b = jnp.where(do & ~bit0, 1, 0)
                return (rng, code, inpos), b

            def bit(rc, fam, idx, do):
                """Masked adaptive bit decode vs family `fam` at `idx`."""
                return bit_multi(rc, [(fam, idx, do)])

            # ---- phase 1: packet decode ------------------------------------
            # all coder positions are relative to the lane's dictionary
            # base (0 unless multi-group lanes rebased at a dict-reset
            # chunk); dictionary ADDRESSES (mpos, copies) stay absolute —
            # the packed output is physically contiguous across groups
            pos_state = (outpos - dbasec) & pb_mask
            state = statec
            rc = (rng, code, inpos)

            if mlit:
                # a pending-is-match lane consumed its is_match bit at a
                # literal slot LAST iteration (verdict: match) — skip the
                # call, take bm = 1
                pimb = getv(st, ST_PIM) != 0
                rc, bm = bit(rc, "is_match",
                             (state << S.NUM_POS_BITS_MAX) + pos_state,
                             do & ~pimb)
                is_lit = do & ~pimb & (bm == 0)
                is_mat = do & (pimb | (bm == 1))
            else:
                rc, bm = bit(rc, "is_match",
                             (state << S.NUM_POS_BITS_MAX) + pos_state, do)
                is_lit = do & (bm == 0)
                is_mat = do & (bm == 1)

            # literal
            prev = jnp.where(outpos > dbasec, lastbc, 0)
            lit_state = (((outpos - dbasec) & lp_mask) << lc) \
                + (prev >> (8 - lc))
            # reads on the current word page come from the write window;
            # with pprev, page cur_w-1 comes from the previous-page
            # register (captured at the last crossing) — no scalar staging
            if pprev:
                mrow = jnp.where(m_w == cur_w, w_ref[:],
                                 jnp.where(m_w == cur_w - 1, p_ref[:],
                                           m_ref[:]))
            else:
                mrow = jnp.where(m_w == cur_w, w_ref[:], m_ref[:])
            mb = (gat(mrow, mpos & (PAGE - 1))
                  >> (((mpos >> 7) & 3) << 3)) & 0xFF
            in_ms = state >= 7
            matched = is_lit & in_ms
            mb = jnp.where(in_ms, mb, 0)
            # Literal tree bits are lane-exclusive with the entire match
            # path, so each of the 8 literal levels FUSES with one match-
            # side call (bit_multi): 8 renorm+ALU blocks serve both paths.
            # The match-side schedule preserves its own sequential order:
            # is_rep, g0, rep0_long, g1, g2, len_choice x2, lowmid_0, and
            # the remaining len tree levels fuse lowmid_{1,2} with
            # high_{0,1} (also lane-exclusive).
            sym = zero + 1
            lit_on = "lit" not in ablate
            nls = 1 << (lc + lp)
            if litrow:
                # context page rows pre-selected once (page index = ctx is
                # level-invariant under the contiguous-node layout); the
                # matched-literal walk needs all 3 planes' rows.  Rows are
                # mutated in-register by the rowpart updates and written
                # back at the literal's commit point.
                pg0 = layout["lit"][0]
                _r0 = _r1 = _r2 = zero
                for i in range(nls):
                    ls_eq = lit_state == i
                    _r0 = jnp.where(ls_eq, fam_ref[pg0 + i], _r0)
                    _r1 = jnp.where(ls_eq, fam_ref[pg0 + nls + i], _r1)
                    _r2 = jnp.where(ls_eq, fam_ref[pg0 + 2 * nls + i], _r2)
                l1rows = [_r0, _r1, _r2]

            def lit_part(k, sym, mb, matched):
                mb = mb << 1
                mbit = (mb >> 8) & 1
                plane = jnp.where(matched, 1 + mbit, 0)
                if mlit:
                    # plane-HIGH order: plane 0 (unmatched) occupies the
                    # first nls<<k entries, so the always-unmatched lit2/3
                    # tree parts bound their page loops to that region.
                    # An internal fam-layout permutation only — the
                    # (context, node) -> probability mapping is the
                    # kernel's own (init is uniform), so bit-exactness vs
                    # the reference is unaffected.
                    idx = (plane * (nls << k) + lit_state * (1 << k)
                           + (sym - (1 << k)))
                else:
                    idx = ((lit_state * 3 + plane) * (1 << k)
                           + (sym - (1 << k)))
                return idx, mb, mbit

            def lit_fold(k, b, sym, matched, mbit):
                sym = jnp.where(is_lit, (sym << 1) | b, sym)
                matched = matched & (b == mbit)
                return sym, matched

            def fused(rc, k, sym, mb, matched, mfam, midx, mmask):
                """Decode lit level k fused with one match-side call."""
                if lit_on and litrow:
                    mb = mb << 1
                    mbit = (mb >> 8) & 1
                    plane = jnp.where(matched, 1 + mbit, 0)
                    rc, b = bit_multi(
                        rc, [(mfam, midx, mmask)],
                        rowparts=[dict(rows=l1rows, plane=plane, sym=sym,
                                       mask=is_lit)])
                    sym, matched = lit_fold(k, b, sym, matched, mbit)
                elif lit_on:
                    idx, mb, mbit = lit_part(k, sym, mb, matched)
                    rc, b = bit_multi(rc, [(f"lit_{k}", idx, is_lit),
                                           (mfam, midx, mmask)])
                    sym, matched = lit_fold(k, b, sym, matched, mbit)
                else:
                    rc, b = bit(rc, mfam, midx, mmask)
                return rc, b, sym, mb, matched

            rc, br, sym, mb, matched = fused(
                rc, 0, sym, mb, matched, "is_rep", state, is_mat)
            simple = is_mat & (br == 0)
            rep = is_mat & (br == 1)

            rc, bg0, sym, mb, matched = fused(
                rc, 1, sym, mb, matched, "is_rep_g0", state, rep)
            rep_g0 = rep & (bg0 == 0)
            repg = rep & (bg0 == 1)
            rc, b0l, sym, mb, matched = fused(
                rc, 2, sym, mb, matched, "is_rep0_long",
                (state << S.NUM_POS_BITS_MAX) + pos_state, rep_g0)
            shortrep = rep_g0 & (b0l == 0)
            longrep0 = rep_g0 & (b0l == 1)
            rc, bg1, sym, mb, matched = fused(
                rc, 3, sym, mb, matched, "is_rep_g1", state, repg)
            use_r1 = repg & (bg1 == 0)
            repg2 = repg & (bg1 == 1)
            rc, bg2, sym, mb, matched = fused(
                rc, 4, sym, mb, matched, "is_rep_g2", state, repg2)
            use_r2 = repg2 & (bg2 == 0)
            use_r3 = repg2 & (bg2 == 1)

            rot = use_r1 | use_r2 | use_r3
            rep0 = rep0c.astype(_U32)
            rep1 = rep1c.astype(_U32)
            rep2 = rep2c.astype(_U32)
            rep3 = rep3c.astype(_U32)
            dist_rep = jnp.where(use_r1, rep1, jnp.where(use_r2, rep2, rep3))
            rep3 = jnp.where(use_r3, rep2, rep3)
            rep2 = jnp.where(use_r2 | use_r3, rep1, rep2)
            rep1 = jnp.where(rot, rep0, rep1)
            rep0 = jnp.where(rot, dist_rep, rep0)

            # length
            len_lanes = simple | longrep0 | rot
            coder = jnp.where(simple, 0, 1)
            rc, c1, sym, mb, matched = fused(
                rc, 5, sym, mb, matched, "len_choice", coder * 2, len_lanes)
            rc, c2, sym, mb, matched = fused(
                rc, 6, sym, mb, matched, "len_choice", coder * 2 + 1,
                len_lanes & (c1 == 1))
            low = len_lanes & (c1 == 0)
            mid = len_lanes & (c1 == 1) & (c2 == 0)
            high = len_lanes & (c1 == 1) & (c2 == 1)
            lowmid = low | mid
            ismid = jnp.where(mid, 1, 0)

            def lowmid_idx(k, m):
                return (((coder * 2 + ismid) * S.POS_STATES_MAX + pos_state)
                        * (1 << k)) + (m - (1 << k))

            mlm = zero + 1
            rc, blm, sym, mb, matched = fused(
                rc, 7, sym, mb, matched, "lowmid_0", lowmid_idx(0, mlm),
                lowmid)
            mlm = jnp.where(lowmid, (mlm << 1) | blm, mlm)

            # literal done: commit byte/state (match lanes unaffected)
            lit_byte = sym & 0xFF
            wl = outpos & (PAGE - 1)
            lsh = ((outpos >> 7) & 3) << 3
            wv0 = w_ref[:]
            w_ref[:] = jnp.where(
                is_lit & (lane_i == wl),
                (wv0 & (((zero + 0xFF) << lsh) ^ -1)) | (lit_byte << lsh),
                wv0)
            outpos = jnp.where(is_lit, outpos + 1, outpos)
            lastbc = jnp.where(is_lit, lit_byte, lastbc)
            st = setv(st, ST_LAST, lastbc)
            if litrow and lit_on:
                # lit1 row writeback (before any lit2 row load of the
                # same pages; untouched rows rewrite their loaded values)
                for i in range(nls):
                    wmk = (lit_state == i) & is_lit
                    fam_ref[pg0 + i] = jnp.where(wmk, l1rows[0],
                                                 fam_ref[pg0 + i])
                    fam_ref[pg0 + nls + i] = jnp.where(
                        wmk, l1rows[1], fam_ref[pg0 + nls + i])
                    fam_ref[pg0 + 2 * nls + i] = jnp.where(
                        wmk, l1rows[2], fam_ref[pg0 + 2 * nls + i])
            lit_next = jnp.where(state < 4, 0,
                                 jnp.where(state < 10, state - 3, state - 6))

            def fnext(s):
                """state after a literal (state_after_literal)."""
                return jnp.where(s < 4, 0, jnp.where(s < 10, s - 3, s - 6))

            if mlit:
                # ---- literal slot 2 setup (v14 multilit) -----------------
                # lit1 is done and its byte committed; a lane whose next
                # packet is also a literal decodes it in the otherwise
                # match-only calls 10-18.  Gates: stay inside the chunk
                # (outpos < limit: the is_match bit belongs to this chunk)
                # and inside the current 512-byte write page (the one-page-
                # per-iteration write-window contract).  state after a
                # literal is < 7, so lit2/3 are always UNMATCHED literals —
                # plane 0 only, page loops bounded by nls << k.
                state_l2 = lit_next
                want2 = is_lit & (outpos < limit) & ((outpos & 511) != 0)
                ps2 = (outpos - dbasec) & pb_mask
                ls2 = (((outpos - dbasec) & lp_mask) << lc) \
                    + (lit_byte >> (8 - lc))
                im2 = [("is_match", (state_l2 << S.NUM_POS_BITS_MAX) + ps2,
                        want2)]
            else:
                im2 = []
            mhi = zero + 1
            # call 10: lowmid_1 + high_0 [+ is_match2]
            rc, bk = bit_multi(rc, [
                ("lowmid_1", lowmid_idx(1, mlm), lowmid),
                ("high_0", coder + (mhi - 1), high)] + im2)
            mlm = jnp.where(lowmid, (mlm << 1) | bk, mlm)
            mhi = jnp.where(high, (mhi << 1) | bk, mhi)
            if mlit:
                is_lit2 = want2 & (bk == 0)
                pim2 = want2 & (bk == 1)
                sym2 = zero + 1
                if litrow:
                    _q0 = zero
                    for i in range(nls):
                        _q0 = jnp.where(ls2 == i, fam_ref[pg0 + i], _q0)
                    l2rows = [_q0]

                    def l2part(k):
                        return [], [dict(rows=l2rows, plane=None, sym=sym2,
                                         mask=is_lit2)]
                else:
                    def l2part(k):
                        return [(f"lit_{k}",
                                 ls2 * (1 << k) + (sym2 - (1 << k)),
                                 is_lit2, nls << k)], []
            else:
                def l2part(k):
                    return [], []
            # call 11: lowmid_2 + high_1 [+ lit2_0]
            _p, _r = l2part(0)
            rc, bk = bit_multi(rc, [
                ("lowmid_2", lowmid_idx(2, mlm), lowmid),
                ("high_1", coder * 2 + (mhi - 2), high)] + _p, rowparts=_r)
            mlm = jnp.where(lowmid, (mlm << 1) | bk, mlm)
            mhi = jnp.where(high, (mhi << 1) | bk, mhi)
            if mlit:
                sym2 = jnp.where(is_lit2, (sym2 << 1) | bk, sym2)
            # lookahead refill #2: covers high_2..7 + the slot tree (12)
            if labyte:
                la_refill()
            else:
                la_state["w"] = la_fill(rc[2])
            for k in range(2, S.LEN_HIGH_BITS):   # calls 12-17 [+ lit2_1-6]
                idx = coder * (1 << k) + (mhi - (1 << k))
                _p, _r = l2part(k - 1)
                rc, bh = bit_multi(rc, [(f"high_{k}", idx, high)] + _p,
                                   rowparts=_r)
                mhi = jnp.where(high, (mhi << 1) | bh, mhi)
                if mlit:
                    sym2 = jnp.where(is_lit2, (sym2 << 1) | bh, sym2)
            lm_sym = jnp.where(lowmid, mlm - S.LEN_LOW_SYMBOLS, 0)
            hi_sym = jnp.where(high, mhi - S.LEN_HIGH_SYMBOLS, 0)
            state = jnp.where(is_lit, lit_next,
                              jnp.where(shortrep,
                                        jnp.where(state < 7, 9, 11), state))
            length = jnp.where(
                low, S.MATCH_MIN_LEN + lm_sym,
                jnp.where(mid, S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS + lm_sym,
                          S.MATCH_MIN_LEN + S.LEN_LOW_SYMBOLS
                          + S.LEN_MID_SYMBOLS + hi_sym))
            state = jnp.where(simple, jnp.where(state < 7, 7, 10),
                              jnp.where(longrep0 | rot,
                                        jnp.where(state < 7, 8, 11), state))
            st = setv(st, ST_STATE, state)

            # distance (simple matches): slot tree
            # [mlit: slot_0 carries lit2_7; slot_1 carries is_match3;
            #  slot_2..5 carry lit3 tree levels 0..3]
            lt_ps = jnp.minimum(length - S.MATCH_MIN_LEN,
                                S.NUM_LEN_TO_POS_STATES - 1)
            m = zero + 1
            # call 18: slot_0 [+ lit2_7]
            _p, _r = l2part(7)
            rc, bs = bit_multi(rc, [("slot_0", lt_ps + (m - 1), simple)]
                               + _p, rowparts=_r)
            m = jnp.where(simple, (m << 1) | bs, m)
            if mlit:
                sym2 = jnp.where(is_lit2, (sym2 << 1) | bs, sym2)
                # ---- commit lit2, set up literal slot 3 ------------------
                byte2 = sym2 & 0xFF
                wl2 = outpos & (PAGE - 1)
                lsh2 = ((outpos >> 7) & 3) << 3
                wv2 = w_ref[:]
                w_ref[:] = jnp.where(
                    is_lit2 & (lane_i == wl2),
                    (wv2 & (((zero + 0xFF) << lsh2) ^ -1))
                    | (byte2 << lsh2), wv2)
                outpos = jnp.where(is_lit2, outpos + 1, outpos)
                lastbc = jnp.where(is_lit2, byte2, lastbc)
                st = setv(st, ST_LAST, lastbc)
                if litrow:
                    for i in range(nls):
                        wmk = (ls2 == i) & is_lit2
                        fam_ref[pg0 + i] = jnp.where(wmk, l2rows[0],
                                                     fam_ref[pg0 + i])
                state_l3 = fnext(state_l2)
                want3 = is_lit2 & (outpos < limit) & ((outpos & 511) != 0)
                ps3 = (outpos - dbasec) & pb_mask
                ls3 = (((outpos - dbasec) & lp_mask) << lc) \
                    + (byte2 >> (8 - lc))
                im3 = [("is_match",
                        (state_l3 << S.NUM_POS_BITS_MAX) + ps3, want3)]
            else:
                im3 = []
            # call 19: slot_1 [+ is_match3]
            rc, bs = bit_multi(rc, [("slot_1", lt_ps * 2 + (m - 2),
                                     simple)] + im3)
            m = jnp.where(simple, (m << 1) | bs, m)
            if mlit:
                is_lit3 = want3 & (bs == 0)
                pim3 = want3 & (bs == 1)
                sym3 = zero + 1
                if litrow:
                    _q3 = zero
                    for i in range(nls):
                        _q3 = jnp.where(ls3 == i, fam_ref[pg0 + i], _q3)
                    l3rows = [_q3]

                    def l3part(k):
                        return [], [dict(rows=l3rows, plane=None, sym=sym3,
                                         mask=is_lit3)]
                else:
                    def l3part(k):
                        return [(f"lit_{k}",
                                 ls3 * (1 << k) + (sym3 - (1 << k)),
                                 is_lit3, nls << k)], []
            else:
                def l3part(k):
                    return [], []
            for k in range(2, S.NUM_POS_SLOT_BITS):  # calls 20-23 [+lit3_0-3]
                idx = lt_ps * (1 << k) + (m - (1 << k))
                _p, _r = l3part(k - 2)
                rc, bs = bit_multi(rc, [(f"slot_{k}", idx, simple)] + _p,
                                   rowparts=_r)
                m = jnp.where(simple, (m << 1) | bs, m)
                if mlit:
                    sym3 = jnp.where(is_lit3, (sym3 << 1) | bs, sym3)
            slot = jnp.where(simple, m - (1 << S.NUM_POS_SLOT_BITS), 0)

            big = simple & (slot >= 4)
            nd = jnp.maximum((slot >> 1) - 1, 0)
            dist = jnp.where(big,
                             (2 | (slot & 1)).astype(_U32) << nd.astype(_U32),
                             slot.astype(_U32))
            specs = big & (slot < S.END_POS_MODEL_INDEX)
            spec_base = dist.astype(_I32) - slot - 1

            # direct bits: static masked loop, trip count bounded by the
            # dictionary size (see module docstring) — a dynamic trip count
            # from a vector reduce would stall the scalar core mid-body.
            # The loop body does NO input gathers: renormalization bytes
            # come from a lookahead register pair prefetched here.  Each
            # byte fetch buys 8 range halvings and the post-bit-decode
            # range is > 2^17, so nmax halvings need at most
            # 1 + ceil((nmax-1)/8) bytes.
            directs = big & (slot >= S.END_POS_MODEL_INDEX)
            ndirect = jnp.where(directs, nd - S.NUM_ALIGN_BITS, 0)
            (rng, code, inpos) = rc
            # lookahead refill #3: covers direct bits (<= 1 + ceil((nmax-1)/8)
            # bytes — a byte buys 8 halvings) + the spec/align trees (<= 5)
            if labyte:
                la_refill()
                lb = la_state["b"]

                def dbody(i, dc):
                    rng, code, lab, dval = dc
                    # ndirect > 0 exactly on `directs` lanes — avoids
                    # capturing a bool loop-invariant (Mosaic i8/i1 limit)
                    act = i < ndirect
                    need = (rng < _TOP) & act
                    byt = jnp.take_along_axis(lb, lab, axis=1).astype(_U32)
                    lab = lab + jnp.where(need, 1, 0)
                    code = jnp.where(need, (code << 8) | byt, code)
                    rng = jnp.where(need, rng << 8, rng)
                    rng = jnp.where(act, rng >> 1, rng)
                    code2 = code - rng
                    t = jnp.zeros_like(code2) - (code2 >> 31)
                    code = jnp.where(act, code2 + (rng & t), code)
                    dval = jnp.where(act, (dval << 1) + (t + 1).astype(_U32),
                                     dval)
                    return (rng, code, lab, dval)

                def _run_direct(args):
                    return jax.lax.fori_loop(0, nmax, dbody, args + (zerou,))

                (rng, code, lab_n, dval) = jax.lax.cond(
                    jnp.any(directs), _run_direct, lambda a: a + (zerou,),
                    (rng, code, la_state["lab"]))
                la_state["lab"] = lab_n
                rc = (rng, code, inpos)
            else:
                def dbody(i, dc):
                    rng, code, inpos, w0, w1, w2, dval = dc
                    # ndirect > 0 exactly on `directs` lanes — avoids capturing
                    # a bool loop-invariant (Mosaic i8/i1 truncation limit)
                    act = i < ndirect
                    need = (rng < _TOP) & act
                    byt = w0 & 0xFF
                    w0 = jnp.where(need, (w0 >> 8) | (w1 << 24), w0)
                    w1 = jnp.where(need, (w1 >> 8) | (w2 << 24), w1)
                    w2 = jnp.where(need, w2 >> 8, w2)
                    code = jnp.where(need, (code << 8) | byt, code)
                    rng = jnp.where(need, rng << 8, rng)
                    inpos = jnp.where(need, inpos + 1, inpos)
                    rng = jnp.where(act, rng >> 1, rng)
                    code2 = code - rng
                    t = jnp.zeros_like(code2) - (code2 >> 31)
                    code = jnp.where(act, code2 + (rng & t), code)
                    dval = jnp.where(act, (dval << 1) + (t + 1).astype(_U32),
                                     dval)
                    return (rng, code, inpos, w0, w1, w2, dval)

                w0, w1, w2 = la_fill(inpos)

                # the tail runs only when some lane actually decoded a
                # direct-bits slot (rare on literal-heavy iterations).  A
                # mid-body lax.cond on a fresh vector reduce measured ~0.2 us
                # (tools/dev_v12_probe.py tailcond) — far below the ~2-3 us
                # the 15-26-trip masked loop costs every iteration.
                def _run_direct(args):
                    return jax.lax.fori_loop(0, nmax, dbody, args + (zerou,))

                (rng, code, inpos, w0, w1, w2, dval) = jax.lax.cond(
                    jnp.any(directs), _run_direct, lambda a: a + (zerou,),
                    (rng, code, inpos, w0, w1, w2))
                la_state["w"] = [w0, w1, w2]
                rc = (rng, code, inpos)

            # reverse bit trees: spec-pos (≤5 bits) and align (4 bits) are
            # lane-exclusive (specs vs directs), so each level is ONE bit
            # call against the merged spec_align family (align entries at
            # offset NUM_SPEC_POS)
            m = zero + 1
            sym_r = zero
            for i in range(5):   # calls 24-28 [+ lit3_4..7 on i = 0..3]
                act_s = specs & (i < nd)
                act_a = directs & (i < S.NUM_ALIGN_BITS)
                act = act_s | act_a
                idx = jnp.where(act_a, S.NUM_SPEC_POS + m, spec_base + m)
                _p, _r = l3part(i + 4) if (mlit and i < 4) else ([], [])
                rc, bsp = bit_multi(rc, [("spec_align", idx, act)] + _p,
                                    rowparts=_r)
                m = jnp.where(act, (m << 1) | bsp, m)
                sym_r = jnp.where(act, sym_r | (bsp << i), sym_r)
                if mlit and i < 4:
                    sym3 = jnp.where(is_lit3, (sym3 << 1) | bsp, sym3)
            dist = jnp.where(specs, dist + sym_r.astype(_U32), dist)
            dist = jnp.where(directs,
                             dist + (dval << S.NUM_ALIGN_BITS)
                             + sym_r.astype(_U32), dist)

            if mlit:
                # ---- commit lit3; fold multilit state/pim into st --------
                byte3 = sym3 & 0xFF
                wl3 = outpos & (PAGE - 1)
                lsh3 = ((outpos >> 7) & 3) << 3
                wv3 = w_ref[:]
                w_ref[:] = jnp.where(
                    is_lit3 & (lane_i == wl3),
                    (wv3 & (((zero + 0xFF) << lsh3) ^ -1))
                    | (byte3 << lsh3), wv3)
                outpos = jnp.where(is_lit3, outpos + 1, outpos)
                lastbc = jnp.where(is_lit3, byte3, lastbc)
                st = setv(st, ST_LAST, lastbc)
                if litrow:
                    for i in range(nls):
                        wmk = (ls3 == i) & is_lit3
                        fam_ref[pg0 + i] = jnp.where(wmk, l3rows[0],
                                                     fam_ref[pg0 + i])
                state = jnp.where(is_lit2, state_l3, state)
                state = jnp.where(is_lit3, fnext(state_l3), state)
                st = setv(st, ST_STATE, state)
                # pim: is_match consumed at a lit slot said "match" — the
                # next iteration decodes it via the match path (call 1
                # skipped).  Cleared for everyone else, including lanes
                # whose pending match was consumed this iteration.
                st = setv(st, ST_PIM, jnp.where(pim2 | pim3, 1, 0))

            marker = simple & (dist == _MASK32)
            rep3 = jnp.where(simple, rep2, rep3)
            rep2 = jnp.where(simple, rep1, rep2)
            rep1 = jnp.where(simple, rep0, rep1)
            rep0 = jnp.where(simple, dist, rep0)
            st = setv(st, ST_REP0, rep0.astype(_I32))
            st = setv(st, ST_REP1, rep1.astype(_I32))
            st = setv(st, ST_REP2, rep2.astype(_I32))
            st = setv(st, ST_REP3, rep3.astype(_I32))

            (rng, code, inpos) = rc
            if labyte:
                inpos = la_inpos()   # end of phase 1: sync the true inpos
            match_lanes = len_lanes
            bad = match_lanes & (rep0 + 1 > (outpos - dbasec).astype(_U32))
            overrun = match_lanes & (outpos + length > limit)
            err = err0 | marker | bad | overrun
            if "noerr" in ablate:   # timing probes: keep garbage lanes alive
                err = err0 & (zero != 0)
            okm = match_lanes & ~err
            pend_len = jnp.where(okm, length,
                                 jnp.where(shortrep & ~err, 1, plenc))
            pend_dist = jnp.where((okm | shortrep) & ~err,
                                  rep0.astype(_I32) + 1, pdistc)

            # ---- phase 2: copy step (≤ 512-wl bytes) ------------------------
            # when pend_len > 0 no literal was decoded this iteration, so
            # outpos (and the current word page) are unchanged from the
            # carry — page-`cur_w` reads come from the write window.  The
            # destination is the packed word window: each of the 4 byte
            # slots gets its own masked source gather, so one iteration
            # moves up to 512 - (outpos & 511) bytes.
            def _phase2(outpos, pend_len, st, lastb):
                ac = active0 & ~err & (pend_len > 0)
                d = jnp.maximum(pend_dist, 1)
                wl512 = outpos & 511
                if p2one:
                    step = jnp.where(
                        ac, jnp.minimum(pend_len,
                                        PAGE - (wl512 & (PAGE - 1))), 0)
                else:
                    step = jnp.where(ac,
                                     jnp.minimum(pend_len, 512 - wl512), 0)
                base = jnp.maximum(outpos - d, 0)
                spg = jnp.clip(base >> 9, 0, out_pages4 - 1)
                spgn = jnp.minimum(spg + 1, out_pages4 - 1)
                if pprev:   # cur_w-1 rows come from the register, not DMA
                    na = ac & (spg != cur_w) & (spg != cur_w - 1)
                    nb = (ac & (spgn != cur_w) & (spgn != cur_w - 1)
                          & (spgn != spg))
                else:
                    na = ac & (spg != cur_w)
                    nb = ac & (spgn != cur_w) & (spgn != spg)
                if stage2:
                    # the b row only matters when the copy span actually
                    # crosses the source page end (max source offset =
                    # b512 + min(d-1, step-1)); was: every far copy
                    nb = nb & ((base & 511)
                               + jnp.minimum(d - 1, step - 1) >= 512)
                    packed2 = (spg
                               | jnp.where(na, 1 << 27, 0)
                               | jnp.where(nb, 1 << 28, 0)
                               | jnp.where(na & (spg + ring >= cur_w),
                                           1 << 29, 0)
                               | jnp.where(nb & (spgn + ring >= cur_w),
                                           1 << 30, 0))
                    evt2 = jnp.where(na | nb, 1, 0)
                else:
                    packed2 = (spg
                               | jnp.where(na, 1 << 28, 0)
                               | jnp.where(nb, 1 << 29, 0))
                    evt2 = jnp.where((packed2 >> 28) != 0, 1, 0)
                erows2 = _pack_events(evt2)
                x_ref[:] = jnp.where(lane_i == 0, packed2, erows2)
                # copy-source rows: ring for the last RING pages, HBM DMA for
                # older ones (start all, then wait all, so latencies overlap);
                # event-gated like phase 0 — streams copying from the current
                # write page (short distances) cost the scalar core nothing
                if "copystage" not in ablate:
                    for g in range(ngr):
                        ew2 = x_ref[0, EVL + g]
                        @pl.when(ew2 != 0)
                        def _(ew2=ew2, g=g):
                            for s in range(g * 32, min(n, g * 32 + 32)):
                                @pl.when(((ew2 >> (s - g * 32)) & 1) != 0)
                                def _(s=s):
                                    (_stage_copy_two if stage2
                                     else _stage_copy_one)(s)
                    _word_waits(needa, lambda s: pltpu.make_async_copy(
                        out_ref.at[0, s], a_ref.at[s], asem).wait())
                    _word_waits(needb, lambda s: pltpu.make_async_copy(
                        out_ref.at[0, s], b_ref.at[s], bsem).wait())

                wv = w_ref[:]
                if pprev:
                    pv = p_ref[:]
                    av = jnp.where(spg == cur_w, wv,
                                   jnp.where(spg == cur_w - 1, pv,
                                             a_ref[:]))
                    bv = jnp.where(spgn == cur_w, wv,
                                   jnp.where(spgn == cur_w - 1, pv,
                                             b_ref[:]))
                else:
                    av = jnp.where(spg == cur_w, wv, a_ref[:])
                    bv = jnp.where(spgn == cur_w, wv, b_ref[:])
                b512 = base & 511
                # j mod d via f32 reciprocal: int vector division has no
                # hardware path; with j < 1024 and d >= 1 the f32 quotient
                # is within 1 of truth, fixed by one correction select
                rec = 1.0 / d.astype(jnp.float32)
                if p2one:
                    # one DYNAMIC byte slot: bytes [wl512, wl512+step) all
                    # live in slot wl512>>7 (step was capped above)
                    sh = ((wl512 >> 7) & 3) << 3
                    j = lane_i - (wl512 & (PAGE - 1))
                    q = (j.astype(jnp.float32) * rec).astype(_I32)
                    jm = j - q * d
                    jm = jnp.where(jm < 0, jm + d,
                                   jnp.where(jm >= d, jm - d, jm))
                    jm = jnp.where(j > 0, jm, 0)
                    off = b512 + jm
                    word = jnp.where(off < 512, gat(av, off & (PAGE - 1)),
                                     gat(bv, off & (PAGE - 1)))
                    byte = (word >> (((off >> 7) & 3) << 3)) & 0xFF
                    wmask = ac & (j >= 0) & (j < step)
                    bsel = jnp.where(wmask, 0xFF, 0) << sh
                    wnew = (wv & ~bsel) | (jnp.where(wmask, byte, 0) << sh)
                else:
                    wnew = zero
                    for r in range(4):
                        j = (r * PAGE + lane_i) - wl512
                        if "nomod" in ablate:
                            jm = jnp.where(j > 0, j, 0)
                        elif "intmod" in ablate:
                            jm = jnp.where(j > 0, j % d, 0)
                        else:
                            q = (j.astype(jnp.float32) * rec).astype(_I32)
                            jm = j - q * d
                            jm = jnp.where(jm < 0, jm + d,
                                           jnp.where(jm >= d, jm - d, jm))
                            jm = jnp.where(j > 0, jm, 0)
                        off = b512 + jm  # [0, 1022]: 2 word rows cover it
                        word = jnp.where(off < 512,
                                         gat(av, off & (PAGE - 1)),
                                         gat(bv, off & (PAGE - 1)))
                        byte = (word >> (((off >> 7) & 3) << 3)) & 0xFF
                        keep = (wv >> (r << 3)) & 0xFF
                        wmask = ac & (j >= 0) & (j < step)
                        wnew = wnew | (jnp.where(wmask, byte, keep)
                                       << (r << 3))
                w_ref[:] = wnew
                outpos = jnp.where(ac, outpos + step, outpos)
                pend_len = jnp.where(ac, pend_len - step, pend_len)
                lpos = jnp.maximum(outpos - 1, 0)
                nlast = (gat(wnew, lpos & (PAGE - 1))
                         >> (((lpos >> 7) & 3) << 3)) & 0xFF
                lastb = jnp.where(ac, nlast, lastb)
                st = setv(st, ST_LAST, lastb)
                return outpos, pend_len, st, lastb

            if "copy" not in ablate:
                outpos, pend_len, st, lastbc = _phase2(outpos, pend_len, st,
                                                       lastbc)

            st = setv(st, ST_OUTPOS, outpos)
            st = setv(st, ST_PLEN, pend_len)
            st = setv(st, ST_PDIST, pend_dist)
            st = setv(st, ST_ERR, jnp.where(err, 1, 0))
            if pprev:
                # page-crossing iterations never write the new page (all
                # writes are capped at the old page's end), so w still
                # holds the COMPLETE page cur_w at the end of the body —
                # capture it as the previous-page register
                crossed = (outpos >> 9) != cur_w
                p_ref[:] = jnp.where(crossed, w_ref[:], p_ref[:])
            st = emit_stage(st, inpos, outpos, limit, cmodeb,
                            vals=dict(err=err, plen=pend_len, state=state,
                                      rep0=rep0.astype(_I32),
                                      pipg=pipgc, pcw=pcwc,
                                      chunk=(getv(st, ST_CHUNK)
                                             if chunkflow else None)))

            return (it + 1, busy_s, rng, code, inpos, st, limit, cmode_i)

        def cond(carry):
            it, busy_s = carry[0], carry[1]
            if fixed_iters:
                return it < fixed_iters
            return (busy_s != 0) & (it < max_iters)

        if chunkflow:
            # ---- single loop, per-lane chunk progression -----------------
            # chunk 0 is initialized here (the only non-gated transition);
            # all later chunk boundaries are handled by the in-body gated
            # transition, so no lane ever idles waiting for another lane's
            # chunk round to finish.
            flags0 = gat(fl_tab, zero)
            valid0 = active0 & ((flags0 & 1) != 0)
            is_copy0 = valid0 & ((flags0 & 4) != 0) if has_copy else \
                valid0 & (zero != 0)
            vlz0 = valid0 & ~is_copy0
            pk_end0 = gat(pk_tab, zero)
            limit0 = jnp.where(valid0, gat(ul_tab, zero), zero)
            i0v = i0_ref[:]
            i1v = i1_ref[:]

            def fetch0(pos):
                off = pos >> 2
                vw = jnp.where(off < PAGE, gat(i0v, off),
                               gat(i1v, off - PAGE)).astype(_U32)
                return (vw >> ((pos & 3) << 3).astype(_U32)) & 0xFF
            hb0 = [fetch0(zero + k) for k in range(5)]
            errh0 = vlz0 & ((hb0[0] != 0) | (pk_end0 < 5))
            rng0 = jnp.full((n, PAGE), _MASK32, _U32)
            code0 = jnp.where(vlz0, (hb0[1] << 24) | (hb0[2] << 16)
                              | (hb0[3] << 8) | hb0[4], zerou)
            inpos0 = jnp.where(vlz0, zero + 5, zero)
            st0 = zero
            st0 = jnp.where(lane_i == ST_PDIST, 1, st0)
            st0 = jnp.where((lane_i == ST_ERR) & errh0, 1, st0)
            st0 = setv(st0, ST_CHUNK,
                       jnp.where(valid0, zero, zero + n_chunks))
            st0 = emit_stage(st0, inpos0, zero, limit0, is_copy0,
                             force=True)
            init0 = (jnp.int32(0), jnp.int32(1), rng0, code0, inpos0, st0,
                     limit0, jnp.where(is_copy0, 1, 0))
            finw = jax.lax.while_loop(cond, body, init0)
            (itt, _b, rng, code, inpos, st, _lim, _cm) = finw
        else:
            itt = None   # set by the round loop below

        # ---- outer loop: one round per chunk of the group ------------------
        # A group is a sequence of LZMA chunks sharing the dictionary
        # (``Lzma2Dec.c:14-26`` grammar); chunk boundaries re-init the range
        # coder, and state-reset chunks additionally re-init the probability
        # model, state, and reps while the dictionary (outpos) continues.
        def round_fn(c, carry):
            (rng, code, inpos, st, itt) = carry
            pk_end = gat(pk_tab, zero + c)
            pk_start = jnp.where(c == 0, zero,
                                 gat(pk_tab, zero + jnp.maximum(c - 1, 0)))
            limit_c = gat(ul_tab, zero + c)
            flags = gat(fl_tab, zero + c)
            errp = getv(st, ST_ERR) != 0
            valid = active0 & ~errp & ((flags & 1) != 0)
            reset = valid & ((flags & 2) != 0)
            is_copy = valid & ((flags & 4) != 0) if has_copy else \
                valid & (zero != 0)
            vlz = valid & ~is_copy

            # masked probability/state reset (dictionary continues; the
            # literal context byte ST_LAST is dict content, NOT coder state)
            for p in range(tot_pages):
                fam_ref[p] = jnp.where(reset, pg_init[p], fam_ref[p])
            st = jnp.where(reset & (lane_i >= ST_STATE)
                           & (lane_i <= ST_REP3), 0, st)

            # stage input pages for the new chunk's RC header
            outpos0 = getv(st, ST_OUTPOS)
            ipg0 = jnp.where(valid, pk_start >> 9, inpos >> 9)
            packed0 = jnp.clip(ipg0, 0, in_pages - 1)
            # chunk transitions force every stream through the staging body
            # (event word all-ones; page bits only under stage2) so the RC
            # header bytes below are staged
            ev_force = np.int32(np.uint32(0x55555555)) if stage2 else -1
            x_ref[:] = jnp.where(lane_i == 0, packed0,
                                 jnp.where(lane_i == 2, outpos0 >> 9,
                                           jnp.where(lane_i >= PAGE - 32,
                                                     ev_force, 0)))
            (scalar_stage2 if stage2 else scalar_stage)()

            # RC init: 5 header bytes, first must be 0 (LzmaDec.c:729-746)
            def fetch(pos):
                off = (pos >> 2) - (ipg0 << 7)
                vw = jnp.where(off < PAGE, gat(i0_ref[:], off),
                               gat(i1_ref[:], off - PAGE)).astype(_U32)
                return (vw >> ((pos & 3) << 3).astype(_U32)) & 0xFF
            # RC init applies to LZMA chunks only; a copy chunk's body is
            # raw bytes starting right at pk_start
            hb = [fetch(pk_start + k) for k in range(5)]
            errh = vlz & ((hb[0] != 0) | (pk_end - pk_start < 5))
            rng = jnp.where(vlz, jnp.full_like(rng, _MASK32), rng)
            code = jnp.where(vlz, (hb[1] << 24) | (hb[2] << 16)
                             | (hb[3] << 8) | hb[4], code)
            inpos = jnp.where(vlz, pk_start + 5,
                              jnp.where(is_copy, pk_start, inpos))
            st = setv(st, ST_ERR,
                      jnp.where(errh, 1, jnp.where(errp, 1, 0)))
            # arm the first body iteration's staging (software pipeline)
            st = emit_stage(st, inpos, outpos0, limit_c, is_copy,
                            force=True)

            init = (jnp.int32(0), jnp.int32(1), rng, code, inpos, st,
                    limit_c, jnp.where(is_copy, 1, 0))
            fin = jax.lax.while_loop(cond, body, init)
            (it, _b, rng, code, inpos, st, _l, _cm) = fin

            # per-chunk verdict: exact consumption accounting including the
            # trailing renormalize (LzmaDec.c:412) — LZMA chunks only (a
            # copy chunk consumes exactly its unpacked size)
            errc = getv(st, ST_ERR) != 0
            outp = getv(st, ST_OUTPOS)
            consumed = inpos
            tail = vlz & ~errc & (rng < _TOP) & (consumed < pk_end)
            consumed = jnp.where(tail, consumed + 1, consumed)
            okc = (outp == limit_c) & (consumed == pk_end)
            errn = errc | (valid & ~okc)
            st = setv(st, ST_ERR, jnp.where(errn, 1, 0))
            inpos = jnp.where(valid & ~errn, pk_end, inpos)
            return (rng, code, inpos, st, itt + it)

        if not chunkflow:
            st0 = zero
            st0 = jnp.where(lane_i == ST_PDIST, 1, st0)
            carry0 = (jnp.full((n, PAGE), _MASK32, _U32),  # rng
                      zerou,                               # code
                      zero,                                # inpos
                      st0,                                 # packed state
                      jnp.int32(0))                        # total iterations
            (rng, code, inpos, st, itt) = jax.lax.fori_loop(
                0, n_chunks, round_fn, carry0)
        err = getv(st, ST_ERR) != 0
        outpos = getv(st, ST_OUTPOS)

        ok = (~err) & (outpos == limit) & (inpos == pack_len)
        ok = ok | ~active0   # (where() on i1 operands lowers via i8)

        status_ref[0] = jnp.where(ok, 1, 0)
        status_ref[1] = inpos
        status_ref[2] = zero + itt

        # final write-window flush (word pages < the last written one were
        # flushed as `tracked` advanced; w still mirrors the last page);
        # drain any in-flight input prefetch before exiting
        dirty = jnp.maximum(outpos - 1, 0) >> 9
        x_ref[:] = jnp.where(lane_i == 0, dirty, 0)
        _word_waits(pend_dma, lambda s: pltpu.make_async_copy(
            src_ref.at[0, s], i1_ref.at[s], dsem.at[s]).wait())
        for s in range(n):
            pltpu.make_async_copy(w_ref.at[s], out_ref.at[x_ref[s, 0], s],
                                  fsem).start()
        for s in range(n):
            pltpu.make_async_copy(w_ref.at[s], out_ref.at[0, s],
                                  fsem).wait()

    return kernel, tot_pages


def _default_tune() -> str:
    """Kernel tuning flags (jit-static), env-overridable for A/B probes.

    Unlike LZT_ABLATE these variants preserve bit-exactness; the default
    is the measured-fastest configuration."""
    return os.environ.get("LZT_TUNE", TUNE_DEFAULT)


# measured round 5 (docs/ROUND5.md): multilit phase-split (up to 3
# literals per iteration riding the match path's calls) + the
# context-row literal layout; FULL real-workload decode on the 1 MB
# 22-chunk probe shape 18.1 -> 30.7 MB/s on-chip (iterations 337K ->
# 154K, 15% higher per-iteration cost)
TUNE_DEFAULT = "pprev,stage2,chunkflow,mlit,litrow"


@functools.partial(jax.jit,
                   static_argnames=("n_streams", "in_pages", "out_pages",
                                    "lc", "lp", "pb", "n_chunks",
                                    "interpret", "ablate_spec", "has_copy",
                                    "tune"))
def _decode_call(meta, src_words, *, n_streams, in_pages, out_pages,
                 lc, lp, pb, n_chunks=1, interpret=False, ablate_spec="",
                 has_copy=False, tune=None):
    if tune is None:
        tune = _default_tune()
    max_iters = out_pages * PAGE + 4096
    kernel, tot_pages = _make_kernel(n_streams, in_pages, out_pages,
                                     lc, lp, pb, max_iters, n_chunks,
                                     ablate_spec, has_copy, tune)
    n = n_streams
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_pages // 4, n, PAGE), _I32),  # packed
            jax.ShapeDtypeStruct((3, n, PAGE), _I32),               # status
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],   # src stays in HBM
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),   # dict/out in HBM
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((tot_pages, n, PAGE), _I32),   # fam
            pltpu.VMEM((_ring(n), n, PAGE), _I32),    # ring dict cache
            pltpu.VMEM((n, PAGE), _I32),              # W  write window (words)
            pltpu.VMEM((n, PAGE), _I32),              # M  matched-byte row
            pltpu.VMEM((n, PAGE), _I32),              # A  copy src row
            pltpu.VMEM((n, PAGE), _I32),              # B  copy src row+1
            pltpu.VMEM((n, PAGE), _I32),              # I0 input page
            pltpu.VMEM((n, PAGE), _I32),              # I1 input page+1
            pltpu.VMEM((n, PAGE), _I32),              # X  scalar xfer
            pltpu.VMEM((n, PAGE), _I32),              # P  previous page reg
            pltpu.SMEM((n,), _I32),                   # prev input page
            pltpu.SMEM((n,), _I32),                   # tracked write page
            pltpu.SMEM((-(-n // 32),), _I32),         # prefetch DMA bitmask
            pltpu.SMEM((-(-n // 32),), _I32),         # flush DMA bitmask
            pltpu.SMEM((-(-n // 32),), _I32),         # m-row DMA bitmask
            pltpu.SMEM((-(-n // 32),), _I32),         # a-row DMA bitmask
            pltpu.SMEM((-(-n // 32),), _I32),         # b-row DMA bitmask
            pltpu.SemaphoreType.DMA((n,)),            # per-stream input DMA
            pltpu.SemaphoreType.DMA,                  # init DMA
            # flush/m/a/b share ONE semaphore each across streams (sflag
            # space holds only 512 semaphores; waits drain the aggregate
            # count before any dependent read, so per-stream identity is
            # not needed)
            pltpu.SemaphoreType.DMA,                  # flush DMA
            pltpu.SemaphoreType.DMA,                  # m-row DMA
            pltpu.SemaphoreType.DMA,                  # a-row DMA
            pltpu.SemaphoreType.DMA,                  # b-row DMA
        ],
        interpret=interpret,
    )(meta, src_words)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def submit_groups(src: np.ndarray, pack_ends: np.ndarray,
                  unpack_ends: np.ndarray, flags: np.ndarray,
                  active: np.ndarray, *,
                  dic_cap: int, lc: int = 3, lp: int = 0, pb: int = 2,
                  interpret: bool | None = None):
    """Enqueue one decode call of multi-chunk groups (async dispatch).

    src: [S, pack_cap] uint8 — each stream holds its group's chunk BODIES
    (LZMA: 5-byte RC header + payload; uncompressed copy chunks: the raw
    bytes) back to back, no LZMA2 chunk headers.  pack_ends/unpack_ends:
    [S, C] int32 cumulative ends per chunk; flags: [S, C] (bit0 valid,
    bit1 state reset — chunk 0 must NOT set bit1, the kernel starts
    fresh; bit2 uncompressed copy chunk; bit3 dict reset — a lane may
    carry SEVERAL dict-reset groups back to back, their chunk tables
    concatenated, each group's first chunk flagged bit1|bit3: coder
    positions and distance validity rebase while the output stays
    physically contiguous).  Invalid (padding) chunk entries must repeat
    the previous cumulative values with flags=0.

    JAX dispatch is asynchronous: the returned (dic, status) device arrays
    materialize later, so callers can queue several batches back-to-back
    and overlap host-side batch assembly + dispatch latency with device
    compute (the MtCoder read-ring equivalent for the device path).
    """
    meta, words, dims = _prep_groups(src, pack_ends, unpack_ends, flags,
                                     active, dic_cap=dic_cap)
    n, in_pages, out_pages, n_chunks = dims
    tune = _default_tune()
    if bool((np.asarray(flags) & 8).any()):
        # flags bit3 (in-lane dict reset: multi-group lanes) is only
        # decoded by the chunkflow transition path
        assert "chunkflow" in tune.split(","), \
            "multi-group lanes (flags bit3) require the chunkflow kernel"
    return _decode_call(
        jnp.asarray(meta), jnp.asarray(words),
        n_streams=n, in_pages=in_pages, out_pages=out_pages,
        lc=lc, lp=lp, pb=pb, n_chunks=n_chunks,
        interpret=_resolve_interpret(interpret),
        ablate_spec=_ablate_env(),
        has_copy=bool((np.asarray(flags) & 4).any()),
        tune=tune)


def _resolve_interpret(interpret):
    import os
    if interpret is None:  # Mosaic needs a real TPU; CPU tests interpret
        interpret = os.environ.get("LZT_PALLAS_INTERPRET", "0") == "1"
    return interpret


def _prep_groups(src, pack_ends, unpack_ends, flags, active, *, dic_cap):
    n, pack_cap = src.shape
    n_chunks = pack_ends.shape[1]
    assert n_chunks <= PAGE, n_chunks
    in_pages = -(-(pack_cap + 8) // IN_PAGE_BYTES)
    out_pages = -(-dic_cap // PAGE)
    out_pages += (-out_pages) % 4      # packed output: 4 pages per word
    # LE word packing, shaped [in_pages, S, 128]
    padded = np.zeros((n, in_pages * IN_PAGE_BYTES), np.uint8)
    padded[:, :pack_cap] = src
    words = padded.view("<u4").astype(np.int32).reshape(
        n, in_pages, PAGE).transpose(1, 0, 2)
    meta = np.zeros((6, n, PAGE), np.int32)
    meta[0] = np.asarray(pack_ends[:, -1], np.int32)[:, None]
    meta[1] = np.asarray(unpack_ends[:, -1], np.int32)[:, None]
    meta[2] = np.asarray(active, np.int32)[:, None]
    meta[3, :, :n_chunks] = pack_ends
    meta[4, :, :n_chunks] = unpack_ends
    meta[5, :, :n_chunks] = flags
    return meta, words, (n, in_pages, out_pages, n_chunks)


def submit_groups_sharded(src: np.ndarray, pack_ends: np.ndarray,
                          unpack_ends: np.ndarray, flags: np.ndarray,
                          active: np.ndarray, *, dic_cap: int, mesh,
                          axis: str = "dp", lc: int = 3, lp: int = 0,
                          pb: int = 2, interpret: bool | None = None):
    """submit_groups with the lane axis sharded over a device mesh.

    The MtCoder-equivalent data parallelism (SURVEY §2.4-2): dict-reset
    groups are independent, so lanes partition over the ``dp`` mesh axis
    via ``shard_map`` — each device runs the SAME group kernel on its lane
    shard, zero cross-device traffic inside the decode (the ordered gather
    happens host-side, keyed by group index).  On CPU meshes the kernel
    runs in interpret mode (Mosaic needs a real TPU); the code path —
    batch assembly, kernel semantics, lane partitioning — is identical.
    """
    import jax
    from jax.sharding import PartitionSpec
    import functools as _ft
    if hasattr(jax, "shard_map"):
        shard_map = _ft.partial(jax.shard_map, check_vma=False)
    else:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = _ft.partial(_sm, check_rep=False)
    meta, words, dims = _prep_groups(src, pack_ends, unpack_ends, flags,
                                     active, dic_cap=dic_cap)
    n, in_pages, out_pages, n_chunks = dims
    ndev = mesh.shape[axis]
    assert n % ndev == 0, (n, ndev)
    interpret = _resolve_interpret(interpret)
    has_copy = bool((np.asarray(flags) & 4).any())

    tune = _default_tune()

    def per_device(m, w):
        return _decode_call(m, w, n_streams=n // ndev, in_pages=in_pages,
                            out_pages=out_pages, lc=lc, lp=lp, pb=pb,
                            n_chunks=n_chunks, interpret=interpret,
                            has_copy=has_copy, tune=tune)

    lane_spec = PartitionSpec(None, axis, None)
    f = shard_map(per_device, mesh=mesh,
                  in_specs=(lane_spec, lane_spec),
                  out_specs=(lane_spec, lane_spec))
    # explicit global placement: every process holds the identical host
    # arrays (the stream bytes are the broadcast), so device_put with the
    # mesh-wide sharding is valid single- AND multi-process
    from jax.sharding import NamedSharding
    lane_sh = NamedSharding(mesh, lane_spec)
    meta_d = jax.device_put(jnp.asarray(meta), lane_sh)
    words_d = jax.device_put(jnp.asarray(words), lane_sh)
    return f(meta_d, words_d)


def submit_chunks(src: np.ndarray, pack_len: np.ndarray,
                  unpack_len: np.ndarray, active: np.ndarray, *,
                  dic_cap: int, lc: int = 3, lp: int = 0, pb: int = 2,
                  interpret: bool | None = None):
    """Single-chunk-per-group convenience wrapper over submit_groups."""
    pack_len = np.asarray(pack_len, np.int32)
    unpack_len = np.asarray(unpack_len, np.int32)
    active_i = np.asarray(active, np.int32)
    return submit_groups(
        src, pack_len[:, None], unpack_len[:, None],
        (active_i != 0).astype(np.int32)[:, None], active_i,
        dic_cap=dic_cap, lc=lc, lp=lp, pb=pb, interpret=interpret)


def finalize_chunks(handle, *, dic_cap: int):
    """Materialize a submit_chunks result: (out, ok, consumed)."""
    packed, status = handle
    packed = np.asarray(packed)   # [out_pages//4, S, 128] int32, LE bytes =
    status = np.asarray(status)   # pages 4q..4q+3 interleaved per lane
    q, n, _ = packed.shape
    out = (np.ascontiguousarray(packed).view(np.uint8)
           .reshape(q, n, PAGE, 4).transpose(1, 0, 3, 2).reshape(n, -1))
    ok = status[0, :, 0] != 0
    consumed = status[1, :, 0]
    return out[:, :dic_cap], ok, consumed


def decode_chunks(src: np.ndarray, pack_len: np.ndarray,
                  unpack_len: np.ndarray, active: np.ndarray, *,
                  dic_cap: int, lc: int = 3, lp: int = 0, pb: int = 2,
                  interpret: bool | None = None):
    """Decode one single-chunk group per stream (submit + finalize).

    src: [S, pack_cap] uint8; returns (out [S, dic_cap] uint8, ok [S] bool,
    consumed [S] int32).
    """
    handle = submit_chunks(src, pack_len, unpack_len, active,
                           dic_cap=dic_cap, lc=lc, lp=lp, pb=pb,
                           interpret=interpret)
    return finalize_chunks(handle, dic_cap=dic_cap)
