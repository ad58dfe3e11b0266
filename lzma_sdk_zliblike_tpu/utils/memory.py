"""Memory accounting and budgets (the reference's allocator surface).

The reference threads ``ISzAlloc``/``allocBig`` through every API
(``Types.h:227-234``, ``Alloc.c:95-113``) so callers control peak memory.
Python's GC owns host allocation here, but two footprints still need
explicit budgeting, which round 2 lacked:

* **Device (HBM)**: a decode batch materializes its whole group output
  (the HBM-resident dictionary) plus the packed source per lane, double
  buffered while the scheduler pipelines submit/finalize.  At the
  reference's default MT block of 4x dict = 64 MB (``Lzma2Enc.c:223-233``)
  a careless 128-lane batch would ask for 16+ GB.
* **Host (RAM)**: the MT pools hold one decoded block per in-flight
  worker plus the ordered-gather slots.

``shape_for_groups`` is the one place batch shapes come from; call sites
(bench, hybrid, api) use it instead of ad-hoc ``BatchShape`` literals.
"""

from __future__ import annotations

import os

DEFAULT_HBM_BUDGET = int(os.environ.get("LZT_HBM_BUDGET",
                                        str(8 << 30)))  # bytes
DEFAULT_INFLIGHT = 2        # submit/finalize pipeline depth


def decode_batch_hbm_bytes(n_lanes: int, pack_cap: int, dic_cap: int,
                           inflight: int = DEFAULT_INFLIGHT) -> int:
    """HBM bytes one pipelined decode batch shape holds live.

    Packed output (the dictionary) dominates: ``dic_cap`` bytes per lane,
    int32-packed 1:1.  The packed source adds ``pack_cap`` per lane (word
    layout, 1:1).  Status/meta are O(KB) and ignored.
    """
    per_lane = dic_cap + pack_cap
    return n_lanes * per_lane * inflight


def pick_lanes(pack_cap: int, dic_cap: int, *,
               hbm_budget: int = DEFAULT_HBM_BUDGET,
               max_lanes: int = 128, min_lanes: int = 1,
               inflight: int = DEFAULT_INFLIGHT) -> int:
    """Largest power-of-two lane count whose batches fit the budget."""
    lanes = max_lanes
    while lanes > min_lanes and \
            decode_batch_hbm_bytes(lanes, pack_cap, dic_cap,
                                   inflight) > hbm_budget:
        lanes //= 2
    return max(min_lanes, lanes)


def shape_for_groups(groups, *, hbm_budget: int = DEFAULT_HBM_BUDGET,
                     max_lanes: int = 32, lc: int = 3, lp: int = 0,
                     pb: int = 2):
    """A BatchShape sized to the stream's groups under the HBM budget.

    dic_cap/pack_cap cover the largest group (4 KB-rounded); the lane
    count is the largest power of two that keeps the pipelined batches
    inside ``hbm_budget`` (env override ``LZT_HBM_BUDGET``).
    """
    from ..parallel.scheduler import BatchShape

    dic_cap = max((sum(c.unpack_size for c in g) for g in groups),
                  default=1 << 16)
    dic_cap = -(-dic_cap // 4096) * 4096
    pack_cap = max((sum(c.pack_size for c in g) for g in groups),
                   default=1 << 16)
    pack_cap = -(-pack_cap // 4096) * 4096
    lanes = pick_lanes(pack_cap, dic_cap, hbm_budget=hbm_budget,
                       max_lanes=max_lanes)
    return BatchShape(n_lanes=lanes, pack_cap=pack_cap, dic_cap=dic_cap,
                      lc=lc, lp=lp, pb=pb)
