"""Host-side block-parallel encoding — the MtCoder equivalent.

The reference's MtCoder splits input into blocks, compresses them on up to
32 threads, and emits results in order via read/write token rings
(``MtCoder.c:185-224``).  Here: dict-reset groups are encoded concurrently
on a thread pool (the native engine releases the GIL inside ctypes calls)
and joined in submission order — a deterministic ordered gather instead of
the token ring.  Thread-count normalization mirrors
``Lzma2EncProps_Normalize`` (``Lzma2Enc.c:176-221``): block threads are
capped at 32 and at the number of blocks.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

MAX_BLOCK_THREADS = 32  # MtCoder ring size (MtCoder.h:30-34)


def normalize_threads(threads: int | None, n_blocks: int) -> int:
    if threads is None or threads <= 0:
        threads = os.cpu_count() or 1
    return max(1, min(threads, MAX_BLOCK_THREADS, n_blocks))


def encode_lzma2_mt(data: bytes, *, dict_size: int, chunk_size: int,
                    threads: int | None = None, effort: int = 9,
                    lc: int = 3, lp: int = 0, pb: int = 2,
                    progress=None) -> tuple[bytes, int]:
    """Parallel LZMA2 encode: each dict-reset group is one work item.

    Returns ``(stream, dict_prop)``; output is byte-identical to the
    single-threaded parallel_groups encoder (same groups, same coder), so
    thread count never changes the stream.
    """
    from .. import native
    from ..models.lzma2 import framing
    from ..utils.errors import ProgressAborted

    if not native.available():
        return framing.encode(data, dict_size=dict_size,
                              chunk_size=chunk_size, lc=lc, lp=lp, pb=pb,
                              effort=effort, engine="python")

    n = len(data)
    blocks = [(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]
    nt = normalize_threads(threads, max(len(blocks), 1))
    prop_holder = {}

    def encode_block(span):
        start, end = span
        stream, prop = native.lzma2_encode(
            data[start:end], dict_size, chunk_size, True,
            lc=lc, lp=lp, pb=pb, effort=effort)
        prop_holder.setdefault("prop", prop)
        return stream[:-1]  # strip the per-call EOS terminator

    out = bytearray()
    done = 0
    if not blocks:
        from ..models.lzma2.framing import encode_dict_prop
        return b"\x00", encode_dict_prop(dict_size)
    with ThreadPoolExecutor(max_workers=nt) as pool:
        # ordered gather: as_completed would scramble; map preserves order
        for (start, end), part in zip(blocks, pool.map(encode_block, blocks)):
            out += part
            done += end - start
            if progress is not None:
                if progress(done, len(out)) is False:
                    raise ProgressAborted()
    out.append(0)  # EOS
    return bytes(out), prop_holder["prop"]


def group_span(stream: bytes, group) -> tuple[int, int, int]:
    """(start, end, unpack) byte span of a dict-reset group in `stream`.

    The span starts at the group's first control byte, so the slice is a
    standalone LZMA2 stream (modulo the missing EOS terminator).
    """
    from ..models.lzma2 import framing

    def ctrl_off(c):
        if not c.is_lzma:
            return c.data_off - 3
        return c.data_off - 5 - (
            1 if c.mode >= framing.MODE_STATE_PROPS else 0)

    return (ctrl_off(group[0]),
            group[-1].data_off + group[-1].pack_size,
            sum(c.unpack_size for c in group))


def decode_group_native(stream: bytes, group, dict_prop: int) -> bytes:
    """Decode one dict-reset group with the native engine (host worker)."""
    from .. import native
    from ..models.lzma2 import framing

    if not native.available():
        return framing.decode_chunks(stream, group)
    start, end, unpack = group_span(stream, group)
    return native.lzma2_decode(stream[start:end] + b"\x00", dict_prop,
                               size_hint=unpack)


def decode_lzma2_mt(stream: bytes, dict_prop: int, *,
                    threads: int | None = None,
                    progress=None) -> bytes:
    """Parallel LZMA2 decode: dict-reset groups decoded concurrently.

    Groups are contiguous slices of the stream; each is standalone (starts
    with a full-reset chunk), so every worker runs the native decoder on
    its slice and the ordered join reassembles the output.

    ``progress(in_bytes, out_bytes)`` is invoked at each group's ordered
    completion (``ICompressProgress`` semantics, ``Types.h:220-225`` —
    the decode-side counterpart the reference only wires to encode);
    returning ``False`` aborts with ``ProgressAborted``.
    """
    from .. import native
    from ..models.lzma2 import framing

    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    if not native.available() or len(groups) <= 1:
        out = framing.decode(stream, dict_prop)
        if progress is not None and progress(len(stream), len(out)) is False:
            from ..utils.errors import ProgressAborted
            raise ProgressAborted()
        return out

    def ctrl_off(c):
        if not c.is_lzma:
            return c.data_off - 3
        return c.data_off - 5 - (1 if c.mode >= framing.MODE_STATE_PROPS else 0)

    spans = []
    for g in groups:
        start = ctrl_off(g[0])
        end = g[-1].data_off + g[-1].pack_size
        unpack = sum(c.unpack_size for c in g)
        spans.append((start, end, unpack))

    nt = normalize_threads(threads, len(spans))

    def decode_span(span):
        start, end, unpack = span
        return native.lzma2_decode(stream[start:end] + b"\x00", dict_prop,
                                   size_hint=unpack)

    out = bytearray()
    with ThreadPoolExecutor(max_workers=nt) as pool:
        futures = [pool.submit(decode_span, s) for s in spans]
        for (start, end, _u), fut in zip(spans, futures):
            out += fut.result()   # ordered join (write-token equivalent)
            if progress is not None and progress(end, len(out)) is False:
                for f in futures:
                    f.cancel()
                from ..utils.errors import ProgressAborted
                raise ProgressAborted()
    return bytes(out)
