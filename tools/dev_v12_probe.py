"""v12 feasibility probe: stream-on-lane scalar state vs broadcast state.

The v11 decoder carries every per-stream scalar (rng/code/inpos/...) as a
lane-UNIFORM [S,128] array: all range-coder ALU runs at 16 vregs per op at
S=128 even though the information content is [S].  The v12 idea keeps the
scalar plane TRANSPOSED — streams on LANES, one [1,S] row per scalar — so
the ALU is 1 vreg per op, paying layout transposes only where dynamically
indexed tables force stream-on-sublane (prob gathers, input pages).

This probe measures, on the real chip, one while-loop iteration of:

  A. baseline  — B bit-call-shaped blocks on broadcast [S,128] state
                 (gather + bound/update ALU + masked store), the v11 shape
  B. lane      — the same B blocks with the ALU on [8,S] rows and explicit
                 jnp.transpose at the gather/store interfaces
  C. lane-notr — the ALU on [8,S] rows with NO transposes (lower bound:
                 what pure lane-layout ALU would cost if the interfaces
                 were free)

If (B) beats (A) at S=128, v12 is worth building; (C)-(B) is the
transpose tax.  Usage: LZT_ITERS=20000 python tools/dev_v12_probe.py
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_CALLS = 28      # bit-call-shaped blocks per iteration (v11 count)


def make_kernel(S, iters, variant):
    def kernel(out_ref, tbl_ref, st_ref):
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        for b in range(8):
            tbl_ref[b] = jnp.full((S, 128), 1024, jnp.int32)
        st_ref[:] = jnp.zeros((8, S), jnp.int32)

        def gat(t, i):
            return jnp.take_along_axis(t, jnp.clip(i, 0, 127), axis=1)

        def body_broadcast(k, carry):
            rng, code, idx = carry
            for b in range(B_CALLS):
                p = gat(tbl_ref[b % 8], idx)
                bound = (rng >> 11) * p.astype(jnp.uint32)
                bit0 = code < bound
                newp = jnp.where(bit0, p + ((2048 - p) >> 5), p - (p >> 5))
                oh = lane_i == (idx & 127)
                tbl_ref[b % 8] = jnp.where(oh, newp, tbl_ref[b % 8])
                rng = jnp.where(bit0, bound, rng - bound)
                code = jnp.where(bit0, code, code - bound)
                need = rng < (1 << 24)
                rng = jnp.where(need, rng << 8, rng)
                idx = (idx + p) & 127
            return (rng, code, idx)

        def body_lane(k, carry, transpose):
            # scalar plane: rows 0..2 of an [8,S] tile = rng/code/idx
            sc = carry
            for b in range(B_CALLS):
                idx_row = sc[2:3, :]                       # [1,S] i32
                if transpose:
                    # lane layout -> sublane layout for the gather
                    idx_col = jnp.transpose(idx_row)       # [S,1]
                    idxb = jnp.broadcast_to(idx_col, (S, 128))
                    p_bc = gat(tbl_ref[b % 8], idxb)       # [S,128]
                    p_row = jnp.transpose(p_bc[:, 0:1])    # [1,S]
                else:
                    p_row = (sc[1:2, :] & 2047)            # fake prob
                rng = sc[0:1, :].astype(jnp.uint32)
                code = sc[1:2, :].astype(jnp.uint32)
                bound = (rng >> 11) * p_row.astype(jnp.uint32)
                bit0 = code < bound
                newp = jnp.where(bit0, p_row + ((2048 - p_row) >> 5),
                                 p_row - (p_row >> 5))
                if transpose:
                    # lane layout -> sublane layout for the masked store
                    np_col = jnp.broadcast_to(
                        jnp.transpose(newp), (S, 128))
                    oh = lane_i == (idxb & 127)
                    tbl_ref[b % 8] = jnp.where(oh, np_col, tbl_ref[b % 8])
                rng = jnp.where(bit0, bound, rng - bound)
                code = jnp.where(bit0, code, code - bound)
                need = rng < (1 << 24)
                rng = jnp.where(need, rng << 8, rng)
                sc = jnp.concatenate(
                    [rng.astype(jnp.int32), code.astype(jnp.int32),
                     ((sc[2:3, :] + newp) & 127), sc[3:, :]], axis=0)
            return sc

        def body_feat(k, carry, masked=False, fused=False):
            """broadcast body + selected real-kernel features."""
            rng, code, idx = carry
            do = idx < 96                      # a live per-call mask
            for b in range(B_CALLS):
                p = gat(tbl_ref[b % 8], idx)
                if fused:                      # second family part
                    p2 = gat(tbl_ref[(b + 1) % 8], idx + 1)
                    p = jnp.where(do, p, p2)
                bound = (rng >> 11) * p.astype(jnp.uint32)
                bit0 = code < bound
                newp = jnp.where(bit0, p + ((2048 - p) >> 5), p - (p >> 5))
                oh = lane_i == (idx & 127)
                tbl_ref[b % 8] = jnp.where(oh, newp, tbl_ref[b % 8])
                if fused:
                    oh2 = lane_i == ((idx + 1) & 127)
                    tbl_ref[(b + 1) % 8] = jnp.where(
                        oh2 & ~do, newp, tbl_ref[(b + 1) % 8])
                if masked:
                    rng = jnp.where(do, jnp.where(bit0, bound, rng - bound),
                                    rng)
                    code = jnp.where(do, jnp.where(bit0, code,
                                                   code - bound), code)
                else:
                    rng = jnp.where(bit0, bound, rng - bound)
                    code = jnp.where(bit0, code, code - bound)
                need = rng < (1 << 24)
                rng = jnp.where(need, rng << 8, rng)
                idx = (idx + p) & 127
            return (rng, code, idx)

        def body_live(k, carry, extra):
            """fused2 body + `extra` long-lived [S,128] carries: isolates
            live-set/register-pressure cost (the real kernel keeps
            ~12-15 broadcast temporaries alive across its 28 calls)."""
            rng, code, idx = carry[:3]
            cs = list(carry[3:])
            do = idx < 96
            for b in range(B_CALLS):
                p = gat(tbl_ref[b % 8], idx)
                p2 = gat(tbl_ref[(b + 1) % 8], idx + 1)
                p = jnp.where(do, p, p2)
                bound = (rng >> 11) * p.astype(jnp.uint32)
                bit0 = code < bound
                newp = jnp.where(bit0, p + ((2048 - p) >> 5), p - (p >> 5))
                oh = lane_i == (idx & 127)
                tbl_ref[b % 8] = jnp.where(oh, newp, tbl_ref[b % 8])
                rng = jnp.where(do, jnp.where(bit0, bound, rng - bound),
                                rng)
                code = jnp.where(do, jnp.where(bit0, code, code - bound),
                                 code)
                need = rng < (1 << 24)
                rng = jnp.where(need, rng << 8, rng)
                # touch ONE long-lived carry per call (cheap op, but every
                # cs[j] stays live across the whole 28-call sequence)
                j = b % len(cs)
                cs[j] = cs[j] + idx
                idx = (idx + p) & 127
            return (rng, code, idx) + tuple(cs)

        init_bc = (jnp.full((S, 128), 0xFFFFFFFF, jnp.uint32),
                   jnp.zeros((S, 128), jnp.uint32),
                   jnp.zeros((S, 128), jnp.int32))
        if variant == "broadcast":
            fin = jax.lax.fori_loop(0, iters, body_broadcast, init_bc)
            out_ref[:] = fin[2]
        elif variant == "masked":
            fin = jax.lax.fori_loop(
                0, iters, functools.partial(body_feat, masked=True),
                init_bc)
            out_ref[:] = fin[2]
        elif variant == "fused2":
            fin = jax.lax.fori_loop(
                0, iters,
                functools.partial(body_feat, masked=True, fused=True),
                init_bc)
            out_ref[:] = fin[2]
        elif variant.startswith("live"):
            extra = int(variant[4:])
            init = init_bc + tuple(
                jnp.full((S, 128), 3 + e, jnp.int32) for e in range(extra))
            fin = jax.lax.fori_loop(
                0, iters, functools.partial(body_live, extra=extra), init)
            acc = fin[2]
            for e in range(extra):
                acc = acc ^ fin[3 + e]
            out_ref[:] = acc
        elif variant in ("tailalways", "tailnever", "tailcond"):
            # the direct-bits-loop gating question: a 26-trip masked tail
            # loop runs every iteration today; gating it on a mid-body
            # lax.cond over a FRESH vector reduce is the documented
            # pipeline-drain fear — measure all three ways
            def tail(ops):
                r, c = ops

                def db(i, rc):
                    r2, c2 = rc
                    r2 = jnp.where(c2 > r2, r2 ^ (c2 >> 1), r2)
                    c2 = c2 + (r2 & 0xFF)
                    return (r2, c2)
                return jax.lax.fori_loop(0, 26, db, (r, c))

            def body(k, carry):
                rng, code, idx = body_broadcast(k, carry)
                if variant == "tailalways":
                    rng, code = tail((rng, code))
                elif variant == "tailcond":
                    anyd = jnp.any(idx > 120)   # fresh reduce -> scalar
                    rng, code = jax.lax.cond(anyd, tail, lambda o: o,
                                             (rng, code))
                return (rng, code, idx)
            fin = jax.lax.fori_loop(0, iters, body, init_bc)
            out_ref[:] = fin[2]
        elif variant == "while":
            def cond(c):
                return c[0] < iters

            def wbody(c):
                it = c[0]
                rest = body_broadcast(it, c[1:])
                return (it + 1,) + rest
            fin = jax.lax.while_loop(cond, wbody, (jnp.int32(0),) + init_bc)
            out_ref[:] = fin[3]
        elif variant == "whilecond":
            # the real kernel's lagged busy-check pattern
            def cond(c):
                return (c[1] != 0) & (c[0] < iters)

            def wbody(c):
                it, busy = c[0], c[1]
                busy = jax.lax.cond(
                    (it & 63) == 0,
                    lambda: jnp.where(jnp.any(c[4] < (1 << 30)), 1,
                                      0).astype(jnp.int32),
                    lambda: jnp.int32(1))
                rest = body_broadcast(it, c[2:])
                return (it + 1, busy) + rest
            fin = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), jnp.int32(1)) + init_bc)
            out_ref[:] = fin[4]
        else:
            tr = variant == "lane"
            init = st_ref[:].astype(jnp.int32)
            fin = jax.lax.fori_loop(
                0, iters, functools.partial(body_lane, transpose=tr), init)
            out_ref[0:8, :] = jnp.pad(fin, ((0, 0), (0, 128 - S)))

    return kernel


def run(S, iters, variant):
    kern = make_kernel(S, iters, variant)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, S, 128), jnp.int32),
                        pltpu.VMEM((8, S), jnp.int32)],
    )
    try:
        r = f()
        np.asarray(r)
    except Exception as e:
        print(f"S={S:<4d} {variant:10s} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return
    best = 1e9
    for _ in range(3):
        t = time.time()
        np.asarray(f())
        best = min(best, time.time() - t)
    print(f"S={S:<4d} {variant:10s} {best * 1e6 / iters:7.2f} us/iter",
          flush=True)


def main():
    iters = int(os.environ.get("LZT_ITERS", "20000"))
    variants = sys.argv[1:] or ["broadcast", "lane-notr", "lane"]
    for S in (32, 128):
        for variant in variants:
            run(S, iters, variant)


if __name__ == "__main__":
    main()
