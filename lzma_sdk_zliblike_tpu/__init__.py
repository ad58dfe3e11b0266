"""lzma_sdk_zliblike_tpu — a TPU-native LZMA compression framework.

A from-scratch rebuild of the capabilities of the LZMA SDK 9.20 fork
``yurket/lzma-sdk-zlibLike`` (see SURVEY.md): LZMA / LZMA2 codecs, .lzma,
.lzma86, .xz and .7z containers, BCJ/BCJ2/Delta branch filters,
CRC32/CRC64/SHA-256 integrity, and a zlib-like one-call API — designed
TPU-first: independent LZMA2 chunks are the data-parallel unit, decoded by a
lane-parallel interleaved multi-stream range decoder under ``jax.jit`` and
sharded over ``jax.sharding.Mesh`` axes, with a native C++ host runtime for
byte-wrangling, container parsing, and streaming I/O.
"""

__version__ = "0.1.0"

from .utils.errors import (  # noqa: F401
    LzmaError,
    DataError,
    CrcError,
    InputEofError,
    OutputEofError,
    UnsupportedError,
    MemError,
    ParamError,
    ArchiveError,
    ProgressAborted,
)
from .api import (  # noqa: F401
    compress,
    uncompress,
    lzma2_compress,
    lzma2_uncompress,
)
