"""``xz``-style CLI over the framework's .xz implementation.

Usage:
  python -m lzma_sdk_zliblike_tpu.cli.xz_util c in out.xz [--check c]
  python -m lzma_sdk_zliblike_tpu.cli.xz_util d in.xz out
  python -m lzma_sdk_zliblike_tpu.cli.xz_util l in.xz          (block index)
"""

from __future__ import annotations

import argparse
import sys

from ..containers import xz
from ..utils.errors import LzmaError


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="xzutil")
    ap.add_argument("command", choices=["c", "d", "l"])
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--check", default="crc32",
                    choices=["none", "crc32", "crc64", "sha256"])
    ap.add_argument("--dict-size", type=int, default=1 << 24)
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--effort", type=int, default=9,
                    help="1-9 fast..best lazy; 10 = optimal parse")
    ap.add_argument("--threads", type=int, default=None,
                    help="block-parallel encode threads (0 = all cores)")
    args = ap.parse_args(argv)
    try:
        data = open(args.input, "rb").read()
        if args.command == "c":
            threads = args.threads
            if threads == 0:
                import os as _os
                threads = _os.cpu_count() or 1
            out = xz.encode(data, check=args.check, dict_size=args.dict_size,
                            block_size=args.block_size, effort=args.effort,
                            threads=threads, engine=args.engine)
            open(args.output, "wb").write(out)
        elif args.command == "d":
            out = xz.decode(data, engine=args.engine)
            open(args.output, "wb").write(out)
        else:
            for si, info in enumerate(xz.read_backward(data)):
                print(f"stream {si}: check={info.check_id:#x} "
                      f"blocks={len(info.blocks)}")
                for bi, (unpadded, uncomp) in enumerate(info.blocks):
                    print(f"  block {bi}: unpadded={unpadded} "
                          f"uncompressed={uncomp}")
    except LzmaError as e:
        print(f"error: {e}", file=sys.stderr)
        return e.sres
    except OSError as e:
        print(f"io error: {e}", file=sys.stderr)
        return 8
    return 0


if __name__ == "__main__":
    sys.exit(main())
