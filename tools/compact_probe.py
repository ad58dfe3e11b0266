"""On-chip microbenchmark for the v2 COMPACT-layout packet phase.

The round-5 ceiling analysis (docs/ROUND5.md) showed the decode kernel
is bound by scalar ALU executed on lane-redundant broadcast state: every
per-stream scalar op on an (S, 128) array pays 128x redundancy, and the
measured speed-of-light of that formulation is ~39 MB/s.  The v2 design
packs streams across LANES — per-stream scalars live in (1, 128) compact
rows — and pays a compact<->broadcast boundary only where a bit call
touches its probability table.  This probe measures the REAL per-call
cost of that boundary on the attached chip, for three candidate
formulations, against a calibration kernel that reproduces the current
broadcast cost structure:

  bcast    S=64 broadcast state, per-row lane gather   (calibrates the
           probe against the known ~14 us/iter of the real kernel)
  mxu      compact state; boundary = two 128x128 one-hot f32 matmuls per
           call (idx compact->broadcast, prob broadcast->compact) + the
           same per-row lane gather on a broadcast table
  tpose    compact state; boundary = two jnp.transpose (1,128)<->(128,1)
           relayouts per call instead of the matmuls
  submask  compact state AND compact tables (T slots on sublanes,
           streams on lanes): read = iota-mask + sublane reduction over a
           (T,128) region, update = masked select; no boundary at all

Each kernel runs FIXED_ITERS iterations of NCALLS rc-bit-shaped calls
(renorm + bound + code/rng update + state mix + table read/update) with
the same op mix, so the A:B ratio transfers to the real kernel even
though no real stream is decoded.  Usage:

  python tools/compact_probe.py [variant|all] [iters]
"""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32
NCALLS = 28          # calls per iteration (the mlit packet shape)
SUB_T = 192          # submask variant: table slots held on sublanes


def _alu(rng, code, st, prob):
    """The shared per-call scalar ALU of an rc-bit decode (shape-generic)."""
    bound = (rng >> 11) * prob
    bit = code < bound
    rng = jnp.where(bit, bound, rng - bound)
    code = jnp.where(bit, code, code - bound)
    newp = jnp.where(bit, prob + ((2048 - prob) >> 5), prob - (prob >> 5))
    need = rng < (1 << 24)
    rng = jnp.where(need, rng << 8, rng)
    code = jnp.where(need, ((code << 8) | 0x5A) & 0x7FFFFFFF, code)
    st = (jnp.where(bit, st * 2 + 1, st * 2) ^ (code >> 17)) & 0x3FFF
    return rng, code, st, newp, bit


def kern_bcast(seed_ref, out_ref, *, iters, s=64):
    lane = lax.broadcasted_iota(I32, (s, 128), 1)
    rng = jnp.full((s, 128), 0x7FFFFF00, I32)
    code = lax.broadcasted_iota(I32, (s, 128), 0) * 7919 + 13 + seed_ref[0, 0]
    st = jnp.full((s, 128), 3, I32)
    tbl = jnp.full((s, 128), 1024, I32)

    def body(i, carry):
        rng, code, st, tbl = carry
        for _ in range(NCALLS):
            idx = (st + (code >> 7)) & 127
            prob = jnp.take_along_axis(tbl, idx, axis=1)
            rng, code, st, newp, _bit = _alu(rng, code, st, prob)
            tbl = jnp.where(lane == idx, newp, tbl)
        return rng, code, st, tbl

    rng, code, st, tbl = lax.fori_loop(
        0, iters, body, (rng, code, st, tbl))
    out_ref[...] = rng + code + st + tbl


def _c2b_mxu(eye, c):
    """(1,128) compact -> (128,1) sublane layout via one-hot f32 matmul.

    Exact for values < 2^24 (f32 mantissa; one-hot row sums are exact)."""
    r = lax.dot_general(eye, c.astype(F32), (((1,), (1,)), ((), ())),
                        preferred_element_type=F32,
                        precision=lax.Precision.HIGHEST)
    return r.astype(I32)            # (128, 1)


def _b2c_mxu(eye, b):
    """(128,1) sublane layout -> (1,128) compact via the transposed matmul."""
    r = lax.dot_general(b.astype(F32), eye, (((0,), (0,)), ((), ())),
                        preferred_element_type=F32,
                        precision=lax.Precision.HIGHEST)
    return r.astype(I32)            # (1, 128)


def kern_mxu(seed_ref, out_ref, *, iters):
    # 128 streams: compact scalars (1,128); broadcast table (128,128)
    # (stream on sublanes for the table, as in the current kernel).
    eye = jnp.eye(128, dtype=F32)
    rng = jnp.full((1, 128), 0x7FFFFF00, I32)
    code = lax.broadcasted_iota(I32, (1, 128), 1) * 7919 + 13 + seed_ref[0, 0]
    st = jnp.full((1, 128), 3, I32)
    tbl = jnp.full((128, 128), 1024, I32)
    lane = lax.broadcasted_iota(I32, (128, 128), 1)

    def body(i, carry):
        rng, code, st, tbl = carry
        for _ in range(NCALLS):
            idx = (st + (code >> 7)) & 127          # compact (1,128)
            idx_s = _c2b_mxu(eye, idx)              # (128,1) per-sublane
            idx_b = jnp.broadcast_to(idx_s, (128, 128))
            prob_b = jnp.take_along_axis(tbl, idx_b, axis=1)
            prob = _b2c_mxu(eye, prob_b[:, :1])     # compact (1,128)
            rng, code, st, newp, _bit = _alu(rng, code, st, prob)
            newp_s = _c2b_mxu(eye, newp)            # (128,1)
            tbl = jnp.where(lane == idx_b, newp_s, tbl)
        return rng, code, st, tbl

    rng, code, st, tbl = lax.fori_loop(0, iters, body,
                                       (rng, code, st, tbl))
    out_ref[...] = rng + code + st + jnp.sum(tbl, axis=0, keepdims=True)


def kern_tpose(seed_ref, out_ref, *, iters):
    rng = jnp.full((1, 128), 0x7FFFFF00, I32)
    code = lax.broadcasted_iota(I32, (1, 128), 1) * 7919 + 13 + seed_ref[0, 0]
    st = jnp.full((1, 128), 3, I32)
    tbl = jnp.full((128, 128), 1024, I32)
    lane = lax.broadcasted_iota(I32, (128, 128), 1)

    def body(i, carry):
        rng, code, st, tbl = carry
        for _ in range(NCALLS):
            idx = (st + (code >> 7)) & 127
            idx_s = jnp.transpose(idx)              # (128,1)
            idx_b = jnp.broadcast_to(idx_s, (128, 128))
            prob_b = jnp.take_along_axis(tbl, idx_b, axis=1)
            prob = jnp.transpose(prob_b[:, :1])     # (1,128)
            rng, code, st, newp, _bit = _alu(rng, code, st, prob)
            newp_s = jnp.transpose(newp)
            tbl = jnp.where(lane == idx_b, newp_s, tbl)
        return rng, code, st, tbl

    rng, code, st, tbl = lax.fori_loop(0, iters, body,
                                       (rng, code, st, tbl))
    out_ref[...] = rng + code + st + jnp.sum(tbl, axis=0, keepdims=True)


def kern_submask(seed_ref, out_ref, *, iters):
    # compact everything: table slot t of stream l at tbl[t, l]
    rng = jnp.full((1, 128), 0x7FFFFF00, I32)
    code = lax.broadcasted_iota(I32, (1, 128), 1) * 7919 + 13 + seed_ref[0, 0]
    st = jnp.full((1, 128), 3, I32)
    tbl = jnp.full((SUB_T, 128), 1024, I32)
    sub = lax.broadcasted_iota(I32, (SUB_T, 128), 0)

    def body(i, carry):
        rng, code, st, tbl = carry
        for _ in range(NCALLS):
            idx = (st + (code >> 7)) % SUB_T        # compact (1,128)
            mask = sub == idx                        # bcast over sublanes
            prob = jnp.sum(jnp.where(mask, tbl, 0), axis=0, keepdims=True)
            rng, code, st, newp, _bit = _alu(rng, code, st, prob)
            tbl = jnp.where(mask, newp, tbl)
        return rng, code, st, tbl

    rng, code, st, tbl = lax.fori_loop(0, iters, body,
                                       (rng, code, st, tbl))
    out_ref[...] = rng + code + st + jnp.sum(tbl, axis=0, keepdims=True)


KERNELS = {
    "bcast": (kern_bcast, 64),     # 64 streams
    "mxu": (kern_mxu, 128),        # 128 streams
    "tpose": (kern_tpose, 128),
    "submask": (kern_submask, 128),
}


def run(name, iters):
    fn, streams = KERNELS[name]
    kern = functools.partial(fn, iters=iters)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128) if name != "bcast"
                                       else (streams, 128), jnp.int32),
    )
    f = jax.jit(call)
    # Timing protocol, learned the hard way on the axon backend: the
    # result must be PULLED (np.asarray) inside the timed region —
    # block_until_ready alone was observed returning in flat ~50 us for
    # arbitrarily long kernels.  Fresh per-rep seeds are belt-and-braces
    # (identical-input reps measured real once pulled, but cost nothing
    # to vary).  The 512 B D2H is noise at these walls.
    base = int(time.time()) % 1000000
    seed = jnp.full((1, 128), base, jnp.int32)
    t0 = time.time()
    r = np.asarray(f(seed))
    compile_s = time.time() - t0
    best = 1e18
    for rep in range(3):
        seed = jnp.full((1, 128), base + rep + 1, jnp.int32)
        t0 = time.time()
        np.asarray(f(seed))
        best = min(best, time.time() - t0)
    us_iter = best / iters * 1e6
    us_call = us_iter / NCALLS
    # per-stream per-iteration cost is the number that sets MB/s
    us_stream_iter = us_iter / streams
    print(f"{name:8s} streams={streams:3d} {us_iter:7.3f} us/iter  "
          f"{us_call*1000:7.1f} ns/call  {us_stream_iter*1000:7.1f} "
          f"ns/stream-iter  (compile {compile_s:.1f}s)")
    return float(np.asarray(r).sum())


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    names = list(KERNELS) if which == "all" else [which]
    for nm in names:
        try:
            run(nm, iters)
        except Exception as e:  # noqa: BLE001 - report per-variant failure
            print(f"{nm:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
