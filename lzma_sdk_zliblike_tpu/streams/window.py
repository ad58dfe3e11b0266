"""Sliding-window output buffer for constant-memory streaming decode.

Presents the absolute-position indexing the scalar decoder expects while
holding only the trailing ``keep`` bytes in memory; older bytes are flushed
to a sink callback.  This replaces the reference's circular decoder
dictionary with wrap-around copies (``LzmaDec.c:383-407``) — same bounded
memory, simpler addressing.
"""

from __future__ import annotations

from typing import Callable


class WindowBuffer:
    """bytearray-compatible facade over a sliding window.

    Supports exactly the operations the scalar LZMA decoder performs:
    ``len()``, ``append``, ``extend/+=``, ``buf[i]`` and ``buf[i:j]`` for
    positions within the retained window.
    """

    __slots__ = ("_buf", "_base", "keep", "sink", "autoflush")

    def __init__(self, keep: int, sink: Callable[[bytes], None],
                 autoflush: int | None = None):
        """``autoflush``: when set, flush automatically once more than
        ``keep + autoflush`` bytes are buffered (bounded-memory decode of
        arbitrarily long single segments)."""
        self._buf = bytearray()
        self._base = 0
        self.keep = keep
        self.sink = sink
        self.autoflush = autoflush

    def __len__(self) -> int:
        return self._base + len(self._buf)

    def append(self, b: int) -> None:
        self._buf.append(b)
        if self.autoflush and len(self._buf) > self.keep + self.autoflush:
            self.flush()

    def extend(self, bs) -> None:
        self._buf.extend(bs)
        if self.autoflush and len(self._buf) > self.keep + self.autoflush:
            self.flush()

    def __iadd__(self, bs):
        self._buf.extend(bs)
        return self

    def __getitem__(self, i):
        if isinstance(i, slice):
            start = (i.start or 0) - self._base
            stop = (i.stop if i.stop is not None else len(self)) - self._base
            if start < 0:
                raise IndexError("window slice before retained base")
            return self._buf[start:stop:i.step]
        j = i - self._base
        if j < 0:
            raise IndexError("window access before retained base")
        return self._buf[j]

    def flush(self, *, final: bool = False) -> None:
        """Emit bytes older than the retained window (all bytes if final)."""
        excess = len(self._buf) if final else len(self._buf) - self.keep
        if excess > 0:
            self.sink(bytes(self._buf[:excess]))
            del self._buf[:excess]
            self._base += excess
