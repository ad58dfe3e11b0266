"""Ablation/timing probe for the Pallas decode kernel.

Reports per-iteration time at a given S by reading the kernel's own
iteration counter out of the status plane (status[2]).

Usage: python tools/pallas_ablate.py [S] [chunk_kb]
Env: LZT_ABLATE=<name> hooks in pallas_decode can gate phases off.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "build", "jax_cache"))

import numpy as np


def main():
    S_ = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk = (int(sys.argv[2]) if len(sys.argv) > 2 else 16) << 10
    lc = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P
    import jax.numpy as jnp

    data = big_mixed(max(2 << 20, chunk * S_ * 2))
    stream, prop = framing.encode(data, dict_size=chunk, chunk_size=chunk, lc=lc)
    chunks, _ = framing.scan(stream)
    singles = [c for g in framing.split_groups(chunks)
               for c in g if len(g) == 1 and c.is_lzma][:S_]
    pack_cap = max(c.pack_size for c in singles)
    src = np.zeros((S_, pack_cap), np.uint8)
    pl_ = np.zeros(S_, np.int32)
    ul = np.zeros(S_, np.int32)
    act = np.zeros(S_, np.int32)
    for j, c in enumerate(singles):
        src[j, :c.pack_size] = np.frombuffer(stream, np.uint8, c.pack_size,
                                             c.data_off)
        pl_[j], ul[j], act[j] = c.pack_size, c.unpack_size, 1

    in_pages = -(-(pack_cap + 8) // P.IN_PAGE_BYTES)
    out_pages = -(-chunk // P.PAGE)
    padded = np.zeros((S_, in_pages * P.IN_PAGE_BYTES), np.uint8)
    padded[:, :pack_cap] = src
    words = padded.view("<u4").astype(np.int32).reshape(
        S_, in_pages, P.PAGE).transpose(1, 0, 2)
    meta = np.zeros((3, S_, P.PAGE), np.int32)
    meta[0] = pl_[:, None]
    meta[1] = ul[:, None]
    meta[2] = act[:, None]

    mj, wj = jnp.asarray(meta), jnp.asarray(words)
    t0 = time.time()
    dic, status = P._decode_call(mj, wj, n_streams=S_, in_pages=in_pages,
                                 out_pages=out_pages, lc=lc, lp=0, pb=2)
    status = np.asarray(status)
    print(f"compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    iters = int(status[2, :, 0].max())
    ok = status[0, :, 0]
    print(f"ok_lanes={int(ok.sum())}/{S_} iters={iters}", file=sys.stderr)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        dic, status = P._decode_call(mj, wj, n_streams=S_, in_pages=in_pages,
                                     out_pages=out_pages, lc=lc, lp=0, pb=2)
    np.asarray(status)
    dt = (time.time() - t0) / reps
    tot_bytes = int(ul.sum())
    print(f"S={S_} chunk={chunk>>10}KB iters={iters}: {dt*1e3:.1f} ms/call, "
          f"{dt/iters*1e6:.2f} us/iter, {tot_bytes/dt/1e6:.2f} MB/s")


if __name__ == "__main__":
    main()
