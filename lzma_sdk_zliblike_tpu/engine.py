"""Engine dispatch: route codec work to the best available backend.

Backends, in preference order for host-side scalar work:
  * ``native``  — the C++ runtime (fast scalar codec, chunk scanner, checksums)
  * ``python``  — pure-Python reference implementation (always available)
and for batched chunk work:
  * ``tpu``     — the JAX lane-parallel multi-stream coder (jit over a mesh)

``engine="auto"`` picks native when the shared library is built, else python.
"""

from __future__ import annotations

from .models.lzma.spec import LzmaProps


def _native():
    try:
        from . import native
        return native if native.available() else None
    except Exception:
        return None


def lzma_raw_decode(src: bytes, props: LzmaProps, unpack_size: int | None,
                    *, engine: str = "auto") -> bytes:
    if engine in ("auto", "native"):
        nat = _native()
        if nat is not None:
            return nat.lzma_decode(src, props, unpack_size)
        if engine == "native":
            raise RuntimeError("native engine not built")
    from .models.lzma.decoder_ref import lzma_decode
    return lzma_decode(src, props, unpack_size)


def lzma_raw_encode(data: bytes, props: LzmaProps, *,
                    write_end_mark: bool = False, effort: int = 9,
                    engine: str = "auto") -> bytes:
    if engine in ("auto", "native"):
        nat = _native()
        if nat is not None:
            return nat.lzma_encode(data, props, write_end_mark, effort)
        if engine == "native":
            raise RuntimeError("native engine not built")
    from .models.lzma.encoder_ref import lzma_encode
    return lzma_encode(data, props, write_end_mark=write_end_mark)
