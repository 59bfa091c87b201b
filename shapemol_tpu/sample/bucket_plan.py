"""Pad-bucket planning for the sampling sweep (VERDICT r2 item 10).

The sweep packs (target, sample) work items into fixed-pad batches; the
per-batch cost grows with the pad size, so the bucket boundaries should be
derived from the measured cost curve and the actual atom-count histogram,
not hand-chosen. This module does exact dynamic-programming over candidate
pads:

  total_cost(S) = sum over buckets p in S of ceil(n_p / B) * t(p)

where n_p counts work items whose atom count falls in that bucket (between
the next-smaller chosen pad and p) and t(p) is the measured per-batch
sampling cost at pad p. DP over sorted candidates finds the optimal subset
in O(P^2).

The cost table is measured once per (model, chip) by
tools/measure_pad_costs.py and cached as JSON; without a table the sweep
falls back to the r2 hand-chosen {16, 24, 32, N} buckets.
"""
from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_CANDIDATES = (8, 12, 16, 20, 24, 28, 32, 40, 48)


def interpolate_cost(table: Dict[int, float], pad: int) -> float:
    """Per-batch cost at `pad`, linearly interpolated/extrapolated from the
    measured points (cost is smooth and increasing in pad)."""
    pads = sorted(table)
    if pad in table:
        return table[pad]
    if pad <= pads[0]:
        return table[pads[0]] * pad / pads[0]
    for lo, hi in zip(pads, pads[1:]):
        if lo < pad < hi:
            f = (pad - lo) / (hi - lo)
            return table[lo] * (1 - f) + table[hi] * f
    lo, hi = pads[-2], pads[-1]
    slope = (table[hi] - table[lo]) / (hi - lo)
    return table[hi] + slope * (pad - pads[-1])


def plan_buckets(counts: Sequence[int], batch_size: int,
                 cost_table: Optional[Dict[int, float]] = None,
                 max_pad: int = 48,
                 candidates: Sequence[int] = DEFAULT_CANDIDATES
                 ) -> List[int]:
    """Choose bucket pad sizes minimizing total sweep cost.

    counts: per-work-item atom counts. Returns ascending pads, last >= max
    count. Without a cost table returns the legacy {16,24,32,max_pad}."""
    counts = np.asarray(counts)
    top = int(counts.max()) if len(counts) else max_pad
    if cost_table is None:
        return sorted({min(max_pad, p) for p in (16, 24, 32, max_pad)
                       if p >= top or p < max_pad})
    cands = sorted({c for c in candidates if c <= max_pad and c >= 3}
                   | {min(max_pad, max(top, 3))})
    # n_le[i] = number of items with count <= cands[i]
    n_le = [int((counts <= c).sum()) for c in cands]
    t = [interpolate_cost(cost_table, c) for c in cands]
    P = len(cands)
    # only candidates >= top can be the last bucket
    INF = float("inf")
    best = [INF] * P          # best[i] = min cost covering items <= cands[i]
    choice = [None] * P
    for i in range(P):
        ni = n_le[i]
        # bucket (prev, i]: items in (cands[j], cands[i]]
        for j in range(-1, i):
            nj = n_le[j] if j >= 0 else 0
            base = best[j] if j >= 0 else 0.0
            if base == INF:
                continue
            n_bucket = ni - nj
            cost = base + math.ceil(n_bucket / batch_size) * t[i]
            if cost < best[i]:
                best[i] = cost
                choice[i] = j
    # the final bucket must cover the max count
    final = min((i for i in range(P) if cands[i] >= top),
                key=lambda i: best[i])
    pads = []
    i = final
    while i is not None and i >= 0:
        pads.append(cands[i])
        i = choice[i]
    return sorted(set(pads))


def load_cost_table(path: str) -> Optional[Dict[int, float]]:
    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    table = {int(k): float(v) for k, v in raw.get("per_batch_ms",
                                                  raw).items()}
    return table or None
