"""Compute-only probe of the Pallas group kernel at a given lane count.

Packs one batch of oracle-encoded groups with the scheduler's packer
(the bench's _compute_rate shape), runs the compiled kernel on device-
resident inputs, and reports wall, us/iter, and MB/s.

Usage: python tools/compute_probe.py [lanes] [stream.l2] [group_bytes]
Env: LZT_ABLATE passes through to the kernel's phase gates.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))

import numpy as np


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "build", "bench_128m_1024k.l2")
    group = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 20)

    import jax.numpy as jnp
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P
    from lzma_sdk_zliblike_tpu.parallel.scheduler import (
        BatchShape, BatchedLzma2Decoder)

    stream = open(path, "rb").read()
    groups = framing.split_groups(framing.scan(stream)[0])
    max_pack = max(sum(c.pack_size for c in g) for g in groups)
    pack_cap = -(-max_pack // 4096) * 4096
    shape = BatchShape(n_lanes=lanes, pack_cap=pack_cap, dic_cap=group)
    dec = BatchedLzma2Decoder(shape, engine="pallas")
    lane_groups = [g for g in groups if dec._eligible(g)][:lanes]
    if len(lane_groups) < lanes:
        print(f"only {len(lane_groups)} eligible groups", file=sys.stderr)
        lane_groups = (lane_groups * (lanes // len(lane_groups) + 1))[:lanes]
    meta, words, dims = dec._pack_batch_pallas(stream, lane_groups)
    n, in_pages, out_pages, n_chunks = dims
    meta_d = jnp.asarray(meta)
    words_d = jnp.asarray(words)
    has_copy = bool((np.asarray(meta[5]) & 4).any())

    def run():
        return P._decode_call(
            meta_d, words_d, n_streams=n, in_pages=in_pages,
            out_pages=out_pages, lc=shape.lc, lp=shape.lp, pb=shape.pb,
            n_chunks=n_chunks, interpret=P._resolve_interpret(None),
            ablate_spec=P._ablate_env(), has_copy=has_copy)

    t0 = time.time()
    status = np.asarray(run()[1])
    print(f"compile+first: {time.time()-t0:.1f}s "
          f"ok={int((status[0, :, 0] != 0).sum())}/{lanes}", file=sys.stderr)
    unpack = sum(sum(c.unpack_size for c in g) for g in lane_groups)
    best = 1e18
    for _ in range(3):
        t = time.time()
        status = np.asarray(run()[1])
        best = min(best, time.time() - t)
    iters = int(status[2, :, 0].max()) if status.shape[0] > 2 else 0
    ipi = best / iters * 1e6 if iters else 0.0
    print(f"S={lanes} pack_cap={pack_cap} n_chunks={n_chunks} "
          f"iters={iters}: {best*1e3:.0f} ms/call, {ipi:.2f} us/iter, "
          f"{unpack/best/1e6:.2f} MB/s")


if __name__ == "__main__":
    main()
