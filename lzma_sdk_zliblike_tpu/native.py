"""ctypes bindings to the native C++ runtime (liblzt_native.so).

The reference's entire runtime is native C; here the host-side scalar codec,
chunk scanner, checksums, and streaming I/O helpers live in ``native/`` and
are loaded via ctypes.  Falls back gracefully (``available() == False``) when
the library has not been built — the pure-Python reference implementation is
used instead.
"""

from __future__ import annotations

import ctypes
import os

from .models.lzma.spec import LzmaProps
from .utils.errors import raise_for_sres

_LIB = None
_TRIED = False
_LOAD_LOCK = __import__("threading").Lock()


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native",
                        "liblzt_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:          # fast path, no lock once resolved
        return _LIB
    with _LOAD_LOCK:
        _load_locked()
    return _LIB


def _load_locked():
    global _LIB, _TRIED
    if not _TRIED:
        path = os.path.abspath(_lib_path())
        if not os.path.exists(path):
            # fresh checkout: build the runtime once, best-effort (the
            # Python engines remain the fallback if no toolchain exists)
            import subprocess
            repo = os.path.dirname(os.path.dirname(path))
            try:
                subprocess.run(["make", "-C", repo, "native"], check=True,
                               capture_output=True, timeout=300)
            except Exception:
                pass
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            _bind(lib)
            _LIB = lib
        # _TRIED flips only after _LIB is final: the unlocked fast path
        # in _load() must never observe _TRIED=True with a half-done load
        _TRIED = True
    return _LIB


def available() -> bool:
    return _load() is not None


def _bind(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.lzt_lzma_decode.restype = ctypes.c_int
    lib.lzt_lzma_decode.argtypes = [
        u8p, ctypes.c_size_t,            # src
        u8p, ctypes.POINTER(ctypes.c_size_t),  # dst, inout dst_len
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,  # lc lp pb dict
        ctypes.c_int,                    # has_size (else end-marker mode)
    ]
    lib.lzt_lzma_encode.restype = ctypes.c_int
    lib.lzt_lzma_encode.argtypes = [
        u8p, ctypes.c_size_t,
        u8p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
        ctypes.c_int,                    # write_end_mark
        ctypes.c_int,                    # effort level
    ]
    lib.lzt_crc32.restype = ctypes.c_uint32
    lib.lzt_crc32.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
    lib.lzt_crc64.restype = ctypes.c_uint64
    lib.lzt_crc64.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint64]
    # a stale prebuilt .so may predate these symbols: guard every binding
    # added after the initial ABI and fall back (hashlib) when absent
    if hasattr(lib, "lzt_sha256"):
        lib.lzt_sha256.restype = None
        lib.lzt_sha256.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.lzt_sha256_init.restype = None
        lib.lzt_sha256_init.argtypes = [ctypes.c_void_p]
        lib.lzt_sha256_update.restype = None
        lib.lzt_sha256_update.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
        lib.lzt_sha256_final.restype = None
        lib.lzt_sha256_final.argtypes = [ctypes.c_void_p, u8p]
    lib.lzt_lzma2_encode.restype = ctypes.c_int
    lib.lzt_lzma2_encode.argtypes = [
        u8p, ctypes.c_size_t,
        u8p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,   # dict, chunk, parallel
        ctypes.c_int, ctypes.c_int, ctypes.c_int,         # lc lp pb
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),       # effort, prop_out
    ]
    lib.lzt_lzma2_decode.restype = ctypes.c_int
    lib.lzt_lzma2_decode.argtypes = [
        u8p, ctypes.c_size_t,
        u8p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
    ]
    if hasattr(lib, "lzt_lzma2_encode_ext"):
        lib.lzt_lzma2_encode_ext.restype = ctypes.c_int
        lib.lzt_lzma2_encode_ext.argtypes = [
            u8p, ctypes.c_size_t,
            u8p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,  # dict chunk par
            ctypes.c_int, ctypes.c_int, ctypes.c_int,        # lc lp pb
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),      # effort prop
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,    # ext, ext_k
        ]
    if hasattr(lib, "lzt_ppmd7_decode"):
        lib.lzt_ppmd7_decode.restype = ctypes.c_int
        lib.lzt_ppmd7_decode.argtypes = [
            u8p, ctypes.c_size_t,                 # src
            u8p,                                  # props (5 bytes)
            u8p, ctypes.c_size_t,                 # dst, out_size
        ]
        lib.lzt_ppmd7_encode.restype = ctypes.c_int
        lib.lzt_ppmd7_encode.argtypes = [
            u8p, ctypes.c_size_t,                 # data
            ctypes.c_int, ctypes.c_uint32,        # order, mem_size
            u8p, ctypes.POINTER(ctypes.c_size_t),  # out, inout out_len
        ]
    if hasattr(lib, "lzt_lzma2_group_ops"):
        lib.lzt_lzma2_group_ops.restype = ctypes.c_int
        lib.lzt_lzma2_group_ops.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int),
            u8p, ctypes.POINTER(ctypes.c_size_t)]
    if hasattr(lib, "lzt_stream_dec_new"):
        lib.lzt_stream_dec_new.restype = ctypes.c_void_p
        lib.lzt_stream_dec_new.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
            ctypes.c_longlong]
        lib.lzt_stream2_dec_new.restype = ctypes.c_void_p
        lib.lzt_stream2_dec_new.argtypes = [ctypes.c_uint32]
        for pre in ("lzt_stream_dec", "lzt_stream2_dec"):
            getattr(lib, pre + "_feed").restype = ctypes.c_longlong
            getattr(lib, pre + "_feed").argtypes = [
                ctypes.c_void_p, u8p, ctypes.c_size_t, ctypes.c_int]
            getattr(lib, pre + "_status").restype = ctypes.c_int
            getattr(lib, pre + "_status").argtypes = [ctypes.c_void_p]
            getattr(lib, pre + "_pending").restype = ctypes.c_size_t
            getattr(lib, pre + "_pending").argtypes = [ctypes.c_void_p]
            getattr(lib, pre + "_total_out").restype = ctypes.c_uint64
            getattr(lib, pre + "_total_out").argtypes = [ctypes.c_void_p]
            getattr(lib, pre + "_read").restype = ctypes.c_size_t
            getattr(lib, pre + "_read").argtypes = [ctypes.c_void_p, u8p,
                                                    ctypes.c_size_t]
            getattr(lib, pre + "_free").restype = None
            getattr(lib, pre + "_free").argtypes = [ctypes.c_void_p]
    if hasattr(lib, "lzt_stream_enc_new"):
        lib.lzt_stream_enc_new.restype = ctypes.c_void_p
        lib.lzt_stream_enc_new.argtypes = [
            ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.lzt_stream_enc_feed.restype = None
        lib.lzt_stream_enc_feed.argtypes = [ctypes.c_void_p, u8p,
                                            ctypes.c_size_t]
        lib.lzt_stream_enc_finish.restype = None
        lib.lzt_stream_enc_finish.argtypes = [ctypes.c_void_p]
        lib.lzt_stream_enc_pending.restype = ctypes.c_size_t
        lib.lzt_stream_enc_pending.argtypes = [ctypes.c_void_p]
        lib.lzt_stream_enc_drain.restype = ctypes.c_size_t
        lib.lzt_stream_enc_drain.argtypes = [ctypes.c_void_p, u8p,
                                             ctypes.c_size_t]
        lib.lzt_stream_enc_free.restype = None
        lib.lzt_stream_enc_free.argtypes = [ctypes.c_void_p]


def _as_u8p(b) -> "ctypes.POINTER(ctypes.c_uint8)":
    return ctypes.cast(ctypes.c_char_p(bytes(b) if not isinstance(b, (bytes, bytearray)) else b),
                       ctypes.POINTER(ctypes.c_uint8))


def lzma_decode(src: bytes, props: LzmaProps, unpack_size: int | None) -> bytes:
    lib = _load()
    # start with a bounded buffer even when the declared size is huge —
    # a corrupt header must produce DataError, not a giant allocation
    want = unpack_size
    cap = min(want if want is not None else max(1 << 16, len(src) * 64),
              max(1 << 26, len(src) * 64))
    while True:
        try:
            dst = ctypes.create_string_buffer(cap)
        except MemoryError:
            raise_for_sres(2)  # SZ_ERROR_MEM
        n = ctypes.c_size_t(cap)
        r = lib.lzt_lzma_decode(
            _as_u8p(src), len(src),
            ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(n),
            props.lc, props.lp, props.pb, props.dict_size,
            1 if (want is not None and want <= cap) else 0)
        if r == 7 and (want is None or cap < want):
            cap *= 4
            continue
        raise_for_sres(r)
        out = dst.raw[:n.value]
        if want is not None and len(out) != want:
            from .utils.errors import DataError
            raise DataError("declared uncompressed size not reached")
        return out


def lzma_encode(data: bytes, props: LzmaProps, write_end_mark: bool = False,
                effort: int = 9) -> bytes:
    lib = _load()
    cap = len(data) + len(data) // 2 + 4096
    dst = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    r = lib.lzt_lzma_encode(
        _as_u8p(data), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(n),
        props.lc, props.lp, props.pb, props.dict_size,
        1 if write_end_mark else 0, effort)
    raise_for_sres(r)
    return dst.raw[:n.value]


def lzma2_encode(data: bytes, dict_size: int, chunk_size: int | None,
                 parallel: bool, lc: int = 3, lp: int = 0, pb: int = 2,
                 effort: int = 9) -> tuple[bytes, int]:
    lib = _load()
    cap = len(data) + len(data) // 2 + 4096 + 8 * (len(data) // 49152 + 2)
    dst = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    prop = ctypes.c_int(0)
    r = lib.lzt_lzma2_encode(
        _as_u8p(data), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(n),
        dict_size, chunk_size or 0, 1 if parallel else 0,
        lc, lp, pb, effort, ctypes.byref(prop))
    raise_for_sres(r)
    return dst.raw[:n.value], prop.value


def lzma2_encode_ext(data: bytes, ext, dict_size: int, chunk_size: int,
                     lc: int = 3, lp: int = 0, pb: int = 2,
                     effort: int = 9) -> tuple[bytes, int]:
    """LZMA2 encode (parallel groups) with device match candidates.

    ext: int32 C-contiguous array [len(data), K], candidate distances per
    position (0 = none), chunk-local (the TPU finder guarantees this).
    """
    import numpy as np
    lib = _load()
    ext = np.ascontiguousarray(ext, np.int32)
    assert ext.shape[0] >= len(data), (ext.shape, len(data))
    cap = len(data) + len(data) // 2 + 4096 + 8 * (len(data) // 49152 + 2)
    dst = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    prop = ctypes.c_int(0)
    r = lib.lzt_lzma2_encode_ext(
        _as_u8p(data), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(n),
        dict_size, chunk_size, 1,
        lc, lp, pb, effort, ctypes.byref(prop),
        ext.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ext.shape[1])
    raise_for_sres(r)
    return dst.raw[:n.value], prop.value


def lzma2_decode(stream: bytes, prop: int,
                 size_hint: int | None = None) -> bytes:
    lib = _load()
    cap = size_hint if size_hint is not None else max(1 << 16, len(stream) * 8)
    while True:
        dst = ctypes.create_string_buffer(cap)
        n = ctypes.c_size_t(cap)
        r = lib.lzt_lzma2_decode(
            _as_u8p(stream), len(stream),
            ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(n), prop)
        if r == 7:  # output cap too small: grow
            cap *= 4
            continue
        raise_for_sres(r)
        return dst.raw[:n.value]


def ppmd7_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lzt_ppmd7_decode")


def ppmd7_decode(src: bytes, props: bytes, out_size: int) -> bytes:
    """Native PPMd7 decode (7z method 0x030401); byte-identical to
    ``models.ppmd7.codec`` (see ``native/lzt_ppmd7.cc``)."""
    from .utils.errors import DataError, ParamError

    lib = _load()
    dst = ctypes.create_string_buffer(max(out_size, 1))
    r = lib.lzt_ppmd7_decode(_as_u8p(src), len(src), _as_u8p(props),
                             ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)),
                             out_size)
    if r == -4:
        raise ParamError("ppmd props")
    if r != 0:
        raise DataError(f"ppmd decode error {r}")
    return dst.raw[:out_size]


def ppmd7_encode(data: bytes, order: int, mem_size: int) -> bytes:
    from .utils.errors import DataError, ParamError

    lib = _load()
    cap = max(1024, len(data) + (len(data) >> 1) + 1024)
    while True:
        out = ctypes.create_string_buffer(cap)
        n = ctypes.c_size_t(cap)
        r = lib.lzt_ppmd7_encode(_as_u8p(data), len(data), order, mem_size,
                                 ctypes.cast(out,
                                             ctypes.POINTER(ctypes.c_uint8)),
                                 ctypes.byref(n))
        if r == -90:
            cap = n.value
            continue
        if r == -4:
            raise ParamError("ppmd params")
        if r != 0:
            raise DataError(f"ppmd encode error {r}")
        return out.raw[:n.value]


def crc32(data: bytes, value: int = 0) -> int:
    lib = _load()
    return lib.lzt_crc32(_as_u8p(data), len(data), value)


def crc64(data: bytes, value: int = 0) -> int:
    lib = _load()
    return lib.lzt_crc64(_as_u8p(data), len(data), value)


def sha256_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lzt_sha256")


def sha256(data: bytes) -> bytes:
    """One-shot SHA-256 via the owned native impl (lzt_sha256.cc)."""
    lib = _load()
    out = (ctypes.c_uint8 * 32)()
    lib.lzt_sha256(_as_u8p(data), len(data), out)
    return bytes(out)


class Sha256:
    """Streaming SHA-256 (the reference's Init/Update/Final shape)."""

    def __init__(self):
        self._lib = _load()
        self._blob = (ctypes.c_uint8 * 112)()
        self._lib.lzt_sha256_init(self._blob)

    def update(self, data) -> None:
        b = bytes(memoryview(data))
        self._lib.lzt_sha256_update(self._blob, _as_u8p(b), len(b))

    def digest(self) -> bytes:
        # finalize a COPY so update() can continue afterwards
        blob = (ctypes.c_uint8 * 112)()
        ctypes.memmove(blob, self._blob, 112)
        out = (ctypes.c_uint8 * 32)()
        self._lib.lzt_sha256_final(blob, out)
        return bytes(out)


class Lzma2StreamEncoder:
    """Incremental bounded-memory LZMA2 encoder (native sliding window).

    The compressobj-style counterpart of the reference's streaming encode
    path (``LzmaEnc_Encode2``'s block loop over a MoveBlock window,
    ``LzmaEnc.c:2154-2184`` + ``LzFind.c:57-121``): feed ``compress()``
    arbitrary pieces, collect compressed bytes as they are produced, and
    ``flush()`` for the EOS-terminated tail.  Memory stays O(dict) no
    matter how much data flows through.
    """

    def __init__(self, dict_size: int = 1 << 24, *, lc: int = 3,
                 lp: int = 0, pb: int = 2, effort: int = 9):
        lib = _load()
        if lib is None or not hasattr(lib, "lzt_stream_enc_new"):
            raise RuntimeError("native runtime library not available")
        self._lib = lib
        prop = ctypes.c_int(0)
        self._h = lib.lzt_stream_enc_new(dict_size, lc, lp, pb, effort,
                                         ctypes.byref(prop))
        if not self._h:
            from .utils.errors import ParamError
            raise ParamError("bad stream encoder params")
        self.dict_prop = prop.value
        self._buf = (ctypes.c_uint8 * (1 << 20))()
        self._done = False

    def _drain(self) -> bytes:
        out = bytearray()
        while True:
            n = self._lib.lzt_stream_enc_drain(self._h, self._buf,
                                               len(self._buf))
            if not n:
                return bytes(out)
            out += bytes(self._buf[:n])

    def compress(self, data) -> bytes:
        assert not self._done, "flush() already called"
        mv = memoryview(data)
        self._lib.lzt_stream_enc_feed(self._h, _as_u8p(bytes(mv)), len(mv))
        return self._drain()

    def flush(self) -> bytes:
        assert not self._done
        self._done = True
        self._lib.lzt_stream_enc_finish(self._h)
        out = self._drain()
        self._lib.lzt_stream_enc_free(self._h)
        self._h = None
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lzt_stream_enc_free(self._h)
            self._h = None


def group_ops_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lzt_lzma2_group_ops")


def lzma2_group_ops(data: bytes, dict_size: int, *, lc: int = 3, lp: int = 0,
                    pb: int = 2, sub_size: int = 48 << 10):
    """Fast-parse one dict-reset group, exporting the op stream.

    Returns ``(ops, chunk_tab, body)``: ops is an int64-safe uint32 numpy
    array of 2-word records (see lzt_codec.cc), chunk_tab an [n_chunks, 3]
    int32 table of cumulative (op words, unpack bytes, body bytes), and
    body the concatenated native chunk bodies (device ground truth).
    """
    import numpy as np
    lib = _load()
    ops_cap = ctypes.c_size_t(4 * len(data) + 64)
    ops = np.zeros(ops_cap.value, np.uint32)
    max_chunks = len(data) // 1024 + 2
    tab = np.zeros(max_chunks * 3, np.int32)
    n_chunks = ctypes.c_int(max_chunks)
    body_cap = ctypes.c_size_t(len(data) + len(data) // 2 + 4096)
    body = ctypes.create_string_buffer(body_cap.value)
    r = lib.lzt_lzma2_group_ops(
        _as_u8p(data), len(data), dict_size, lc, lp, pb, sub_size,
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(ops_cap),
        tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_chunks),
        ctypes.cast(body, ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(body_cap))
    raise_for_sres(r)
    return (ops[:ops_cap.value].copy(),
            tab[:n_chunks.value * 3].reshape(-1, 3).copy(),
            body.raw[:body_cap.value])


def stream_dec_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lzt_stream_dec_new")


class _StreamDecBase:
    """Shared driver for the native resumable decoders.

    Contract (see ``native/lzt_codec.cc`` stream section): ``feed`` is given
    the caller's WHOLE unconsumed buffer each call and returns how much was
    consumed — the native side retains no input.  Decoded bytes accumulate
    in a native dictionary window drained with ``read``.
    """

    _PREFIX = ""

    def __init__(self):
        self._lib = _load()
        self._h = None
        self._rbuf = (ctypes.c_uint8 * (1 << 20))()

    def _call(self, name):
        return getattr(self._lib, self._PREFIX + name)

    def feed(self, data, finish: bool = False) -> int:
        """Consume a prefix of ``data``; returns consumed count.

        Raises on decode error.  After the logical end of stream,
        ``done`` is True and further bytes are never consumed.
        """
        b = bytes(data)
        c = self._call("_feed")(self._h, _as_u8p(b), len(b),
                                1 if finish else 0)
        st = self._call("_status")(self._h)
        if st < 0:
            raise_for_sres(-st)
        return int(c)

    @property
    def done(self) -> bool:
        return self._call("_status")(self._h) == 1

    @property
    def total_out(self) -> int:
        return self._call("_total_out")(self._h)

    def pending(self) -> int:
        return self._call("_pending")(self._h)

    def read(self, max_length: int = -1) -> bytes:
        """Drain up to max_length decoded bytes (all pending if < 0)."""
        out = bytearray()
        want = self.pending() if max_length is None or max_length < 0 \
            else max_length
        while want > 0:
            n = self._call("_read")(self._h, self._rbuf,
                                    min(want, len(self._rbuf)))
            if not n:
                break
            out += bytes(self._rbuf[:n])
            want -= n
        return bytes(out)

    def close(self) -> None:
        if self._h:
            self._call("_free")(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class LzmaStreamDecoder(_StreamDecBase):
    """Resumable raw-LZMA decoder (``LzmaDec_DecodeToBuf`` role,
    ``LzmaDec.c:840-878``), O(dict) memory."""

    _PREFIX = "lzt_stream_dec"

    def __init__(self, props: LzmaProps, unpack_size: int | None = None):
        super().__init__()
        if self._lib is None or not hasattr(self._lib, "lzt_stream_dec_new"):
            raise RuntimeError("native runtime library not available")
        self._h = self._lib.lzt_stream_dec_new(
            props.lc, props.lp, props.pb, props.dict_size,
            -1 if unpack_size is None else unpack_size)
        if not self._h:
            from .utils.errors import ParamError
            raise ParamError("bad LZMA props")


class Lzma2StreamDecoder(_StreamDecBase):
    """Resumable LZMA2 decoder (header state machine + chunk decode,
    ``Lzma2Dec.c:47-157`` role), O(dict) memory."""

    _PREFIX = "lzt_stream2_dec"

    def __init__(self, dict_size: int):
        super().__init__()
        if self._lib is None or not hasattr(self._lib, "lzt_stream2_dec_new"):
            raise RuntimeError("native runtime library not available")
        self._h = self._lib.lzt_stream2_dec_new(dict_size)
