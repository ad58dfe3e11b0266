"""Round-4 one-process kernel timing matrix.

Measures the real group kernel at several lane counts x ablation specs,
all within ONE process/device session (cross-session tunnel variance is
~2x, so only in-session deltas are meaningful).  Uses LZT_ABLATE_ITERS
semantics via the _decode_call static arg directly (no env), with the
`noerr` flag so masked-off lanes keep running and the timing stays
uniform across variants.

Usage: python tools/r4_probe.py [iters]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))

import numpy as np  # noqa: E402


_CACHE = {}


def build_batch(S_, chunk):
    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P

    if "singles" not in _CACHE:
        # 8 distinct 1 MB groups, tiled across lanes: lanes are fully
        # independent, so identical content across lanes is timing-valid
        # for in-session A/B (absolute MB/s of record stays bench.py's).
        data = big_mixed(chunk * 8)
        stream, _prop = framing.encode(data, dict_size=chunk,
                                       chunk_size=chunk)
        chunks, _ = framing.scan(stream)
        _CACHE["stream"] = stream
        _CACHE["groups"] = framing.split_groups(chunks)
    stream = _CACHE["stream"]
    groups = list(_CACHE["groups"])
    assert groups, "no groups in probe stream"
    while len(groups) < S_:
        groups = groups * 2
    groups = groups[:S_]
    n_chunks = max(len(g) for g in groups)
    pack_cap = max(sum(c.pack_size for c in g) for g in groups)
    src = np.zeros((S_, pack_cap), np.uint8)
    pe = np.zeros((S_, n_chunks), np.int32)
    ue = np.zeros((S_, n_chunks), np.int32)
    fl = np.zeros((S_, n_chunks), np.int32)
    act = np.ones(S_, np.int32)
    for li, g in enumerate(groups):
        ap = au = 0
        for j, c in enumerate(g):
            src[li, ap:ap + c.pack_size] = np.frombuffer(
                stream, np.uint8, c.pack_size, c.data_off)
            ap += c.pack_size
            au += c.unpack_size
            pe[li, j] = ap
            ue[li, j] = au
            fl[li, j] = 1 | (2 if (j > 0 and c.mode >= framing.MODE_STATE)
                             else 0) | (0 if c.is_lzma else 4)
        pe[li, len(g):] = ap
        ue[li, len(g):] = au
    meta, words, dims = P._prep_groups(src, pe, ue, fl, act, dic_cap=chunk)
    return meta, words, dims


def main():
    # NOTE: fixed-iters > ~1024 per chunk round crashes the tunnel backend
    # (INTERNAL, server-side; @1024 is stable and gives ~22K iters/call at
    # the 1 MB 22-chunk shape).  Ablated rows also run has_copy=False —
    # the ablate+has_copy combination is another backend-crash trigger;
    # ablation timings are garbage-decode probes anyway.  The backend
    # also crashes sporadically mid-matrix, so the spec list is CLI-driven
    # (tools/r4_drive.sh batches specs per process, each batch leading
    # with the `noerr` baseline as in-process calibration).
    #
    # argv: S_list spec[:tune] spec[:tune] ...   e.g.
    #   python tools/r4_probe.py 64,128 noerr noerr:labyte "" ":labyte"
    iters = int(os.environ.get("LZT_PROBE_ITERS", "1024"))
    chunk = 1 << 20          # bench-like: 1 MB groups
    reps = 3
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P
    import jax.numpy as jnp

    s_list = tuple(int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                    else "32,64,128").split(","))
    if len(sys.argv) > 2:
        specs = []
        for a in sys.argv[2:]:
            spec, _, tn = a.partition(":")
            specs.append((spec, tn))
    else:
        specs = [
            ("noerr", ""),            # fixed-iters baseline
            ("noerr", "labyte"),
            ("noerr", "noclip"),
            ("noerr,bits", ""),
            ("noerr,norenorm", ""),
            ("noerr,lit", ""),
            ("noerr,copy", ""),
            ("noerr,stage", ""),
            ("noerr,events", ""),
            ("noerr,copystage", ""),
            ("noerr,probconst", ""),
            ("noerr,noupdate", ""),
            ("", ""),                 # full kernel (real decode, honest)
        ]
    for S_ in s_list:
        meta, words, dims = build_batch(S_, chunk)
        n, in_pages, out_pages, n_chunks = dims
        has_copy = bool((np.asarray(meta[5]) & 4).any())
        mj, wj = jnp.asarray(meta), jnp.asarray(words)
        for spec, tune in specs:
            tag = (spec if spec == "" else f"{spec}@{iters}")
            try:
                def run():
                    return P._decode_call(
                        mj, wj, n_streams=n, in_pages=in_pages,
                        out_pages=out_pages, lc=3, lp=0, pb=2,
                        n_chunks=n_chunks, ablate_spec=tag,
                        has_copy=(has_copy if spec == "" else False),
                        tune=tune)
                t0 = time.time()
                st = np.asarray(run()[1])
                compile_s = time.time() - t0
                its = int(st[2, :, 0].max())
                best = 1e9
                for _ in range(reps):
                    t0 = time.time()
                    st = np.asarray(run()[1])
                    best = min(best, time.time() - t0)
                ui = best / max(its, 1) * 1e6
                ok = int(st[0, :, 0].sum())
                note = f" ok={ok}/{S_}" if spec == "" else ""
                mbs = (S_ * chunk) / best / 1e6 if spec == "" else 0
                mnote = f" {mbs:.1f} MB/s" if spec == "" else ""
                lbl = (spec or "FULL") + (f" +{tune}" if tune else "")
                print(f"S={S_:3d} {lbl:<28} iters={its:6d} "
                      f"{ui:7.2f} us/iter  (compile {compile_s:.0f}s)"
                      f"{note}{mnote}", flush=True)
            except Exception as e:
                lbl = (spec or "FULL") + (f" +{tune}" if tune else "")
                print(f"S={S_:3d} {lbl}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
