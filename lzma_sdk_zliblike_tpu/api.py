"""Zlib-like one-call public API.

The reference exposes this as ``LzmaCompress``/``LzmaUncompress``
(``LzmaLib.h:98-129``): flat-buffer one-call compression with the 5 props
bytes carried out-of-band.  Here the same shape, plus LZMA2 one-calls whose
chunked output is the framework's data-parallel unit.
"""

from __future__ import annotations

from .models.lzma.spec import LzmaProps


def compress(data: bytes, *, level: int = 5, dict_size: int | None = None,
             lc: int = 3, lp: int = 0, pb: int = 2, effort: int | None = None,
             engine: str = "auto") -> tuple[bytes, bytes]:
    """Compress to raw LZMA. Returns ``(stream, props_bytes)``.

    Mirrors ``LzmaCompress`` (``LzmaLib.h:98-112``): props travel out-of-band.
    ``effort``: defaults from level (level ≥ 9 → optimal parse).
    """
    if dict_size is None:
        dict_size = default_dict_size(level)
    if effort is None:
        effort = default_effort(level)
    props = LzmaProps(lc=lc, lp=lp, pb=pb, dict_size=dict_size)
    from .engine import lzma_raw_encode
    return (lzma_raw_encode(data, props, effort=effort, engine=engine),
            props.to_bytes())


def uncompress(stream: bytes, props_bytes: bytes, unpack_size: int,
               *, engine: str = "auto") -> bytes:
    """Decompress raw LZMA (``LzmaUncompress``, ``LzmaLib.h:114-129``)."""
    from .engine import lzma_raw_decode
    return lzma_raw_decode(stream, LzmaProps.from_bytes(props_bytes),
                           unpack_size, engine=engine)


def lzma2_compress(data: bytes, *, level: int = 5,
                   dict_size: int | None = None,
                   chunk_size: int | None = None,
                   threads: int | None = None,
                   effort: int | None = None,
                   progress=None,
                   props=None,
                   engine: str = "auto") -> tuple[bytes, int]:
    """Compress to a raw LZMA2 stream. Returns ``(stream, dict_prop_byte)``.

    ``threads``: block-parallel encoding over dict-reset groups (the
    MtCoder equivalent; output is identical at any thread count).
    ``effort``: ≤9 greedy/lazy; 10+ = BT4 + price-based optimal parse
    (defaults from level like the reference's algo knob, LzmaEnc.c:53-74).
    ``progress(done_bytes, out_bytes)``: return False to abort
    (ICompressProgress semantics, Types.h:220-225).
    ``props``: a ``utils.props.EncProps`` — the CLzmaEncProps-shaped
    config surface; explicit keyword args override its fields.
    """
    from .models.lzma2 import framing
    if props is not None:
        p = props.normalize()
        dict_size = p.dict_size if dict_size is None else dict_size
        chunk_size = p.chunk_size if chunk_size is None else chunk_size
        effort = p.effort if effort is None else effort
        threads = p.num_block_threads if threads is None else threads
    if dict_size is None:
        dict_size = default_dict_size(level)
    if effort is None:
        effort = default_effort(level)
    if threads is not None and threads != 1 and engine in ("auto", "native"):
        from .parallel.host_pool import encode_lzma2_mt
        return encode_lzma2_mt(data, dict_size=dict_size,
                               chunk_size=chunk_size or (1 << 20),
                               threads=threads, effort=effort,
                               progress=progress)
    return framing.encode(data, dict_size=dict_size, chunk_size=chunk_size,
                          effort=effort, engine=engine)


def lzma2_uncompress(stream: bytes, dict_prop: int, *,
                     threads: int | None = None,
                     progress=None,
                     engine: str = "auto") -> bytes:
    """Decompress a raw LZMA2 stream.

    ``threads``: decode dict-reset groups concurrently (ordered join).
    ``progress(in_bytes, out_bytes)``: per-group decode progress; return
    False to abort (decode-side ICompressProgress, Types.h:220-225).
    ``engine``: "auto"/"native"/"python" (host scalar), "tpu" (the
    batched Pallas group kernel under an HBM-budgeted shape), or
    "hybrid" (host cores + device draining one group queue).  The hybrid
    engine reports per-group progress and honors abort natively (the
    abort poisons host workers AND the device feeder,
    ``MtCoder.c:101-107`` semantics); the pure-device engine has no
    per-group hook, so a ``progress`` callback there routes to the host
    MT path instead (abort semantics preserved).
    """
    if engine == "hybrid" or (engine == "tpu" and progress is None):
        from .models.lzma2 import framing
        from .utils.memory import shape_for_groups
        framing.decode_dict_prop(dict_prop)  # validate
        groups = framing.split_groups(framing.scan(stream)[0])
        # batch props come from the stream, not defaults: a non-default
        # lc/lp/pb stream would otherwise silently fall back to the
        # scalar path group by group
        lc, lp, pb = 3, 0, 2
        props = next((c.props for g in groups for c in g
                      if c.props is not None), None)
        if props is not None:
            lc, lp, pb = props.lc, props.lp, props.pb
        shape = shape_for_groups(groups, lc=lc, lp=lp, pb=pb)
        if engine == "hybrid":
            from .parallel.hybrid import decode_lzma2_hybrid
            return decode_lzma2_hybrid(stream, dict_prop, shape=shape,
                                       threads=threads, progress=progress)
        from .parallel.scheduler import BatchedLzma2Decoder
        dec = BatchedLzma2Decoder(shape, engine="pallas")
        return b"".join(dec.decode_groups(stream, groups))
    if engine in ("hybrid", "tpu"):
        engine = "auto"   # progress requested: host MT path below
    if progress is not None or (threads is not None and threads != 1
                                and engine in ("auto", "native")):
        from .parallel.host_pool import decode_lzma2_mt
        return decode_lzma2_mt(stream, dict_prop, threads=threads,
                               progress=progress)
    from .models.lzma2 import framing
    return framing.decode(stream, dict_prop, engine=engine)


def lzma2_compress_stream(*, level: int = 5, dict_size: int | None = None,
                          lc: int = 3, lp: int = 0, pb: int = 2,
                          effort: int | None = None):
    """Incremental LZMA2 encoder with O(dict) memory.

    Returns a compressobj-style object: ``compress(bytes) -> bytes`` /
    ``flush() -> bytes`` / ``dict_prop``.  The streaming counterpart of
    the reference's ``LzmaEnc_Encode2`` sliding-window loop
    (``LzmaEnc.c:2154-2184``, ``LzFind.c:57-121``).
    """
    from .native import Lzma2StreamEncoder
    if dict_size is None:
        dict_size = default_dict_size(level)
    if effort is None:
        effort = default_effort(level)
    return Lzma2StreamEncoder(dict_size, lc=lc, lp=lp, pb=pb, effort=effort)


def lzma2_compress_file(src_path: str, dst_path: str, *, level: int = 5,
                        dict_size: int | None = None,
                        effort: int | None = None,
                        read_size: int = 1 << 20,
                        progress=None) -> int:
    """File-to-file LZMA2 encode in O(dict) memory; returns dict_prop.

    Output is the raw LZMA2 stream (prefix it with the returned prop byte
    for the oracle's ``lzma2d`` framing).  Encodes inputs far larger than
    RAM: only the sliding window + one read buffer are resident.
    """
    enc = lzma2_compress_stream(level=level, dict_size=dict_size,
                                effort=effort)
    done = 0
    with open(src_path, "rb") as fin, open(dst_path, "wb") as fout:
        while True:
            piece = fin.read(read_size)
            if not piece:
                break
            fout.write(enc.compress(piece))
            done += len(piece)
            if progress is not None and progress(done, fout.tell()) is False:
                from .utils.errors import ProgressAborted
                raise ProgressAborted()
        fout.write(enc.flush())
    return enc.dict_prop


def default_dict_size(level: int) -> int:
    """Level→dictSize table of the reference (``LzmaLib.h:44-52``)."""
    table = {0: 1 << 14, 1: 1 << 16, 2: 1 << 18, 3: 1 << 20,
             4: 1 << 22, 5: 1 << 24, 6: 1 << 25}
    return table.get(level, 1 << 26)


def default_effort(level: int) -> int:
    """Level→algo mapping mirroring ``LzmaEncProps_Normalize``
    (``LzmaEnc.c:53-74``): level < 5 → fast/lazy parse, level ≥ 5 →
    BT4 + optimal parse, level ≥ 9 → deeper BT walk."""
    if level >= 9:
        return 11
    return 10 if level >= 5 else 9
