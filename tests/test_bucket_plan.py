"""Bucket-planning DP (VERDICT r2 item 10)."""
import numpy as np
import pytest

from shapemol_tpu.sample.bucket_plan import (interpolate_cost, plan_buckets,
                                             load_cost_table)


COST = {8: 100.0, 16: 200.0, 24: 300.0, 32: 400.0, 48: 600.0}


def test_interpolation():
    assert interpolate_cost(COST, 16) == 200.0
    assert interpolate_cost(COST, 20) == pytest.approx(250.0)
    assert interpolate_cost(COST, 56) == pytest.approx(700.0)  # extrapolate
    assert interpolate_cost(COST, 4) == pytest.approx(50.0)


def test_single_bucket_when_counts_uniform():
    # all molecules the same size: one bucket at (or just above) that size
    pads = plan_buckets([24] * 500, 100, COST, max_pad=48)
    assert pads[-1] >= 24
    assert len(pads) == 1


def test_split_pays_when_sizes_bimodal():
    counts = [12] * 400 + [46] * 100
    pads = plan_buckets(counts, 100, COST, max_pad=48)
    # one small bucket for the 400 cheap molecules, one large for the rest
    assert len(pads) == 2
    assert pads[0] in (12, 16) and pads[-1] >= 46
    # DP beats the single-bucket plan
    import math
    single = math.ceil(500 / 100) * interpolate_cost(COST, 46)
    small = math.ceil(400 / 100) * interpolate_cost(COST, pads[0])
    big = math.ceil(100 / 100) * interpolate_cost(COST, pads[-1])
    assert small + big < single


def test_no_split_when_batches_would_fragment():
    # 101 items of size 12 + 1 item of size 48: a separate 12-bucket costs
    # an extra batch launch; DP decides by arithmetic, result must cover all
    counts = [12] * 101 + [48]
    pads = plan_buckets(counts, 100, COST, max_pad=48)
    assert pads[-1] == 48
    total = 0
    prev = 0
    import math
    for p in pads:
        n = sum(1 for c in counts if prev < c <= p)
        total += math.ceil(n / 100) * interpolate_cost(COST, p)
        prev = p
    # must not exceed the trivial single-bucket cost
    assert total <= math.ceil(102 / 100) * COST[48] + 1e-9


def test_fallback_without_table(tmp_path):
    pads = plan_buckets([10, 20, 30], 100, None, max_pad=48)
    assert pads == [16, 24, 32, 48]
    assert load_cost_table(str(tmp_path / "missing.json")) is None
    import json
    f = tmp_path / "c.json"
    f.write_text(json.dumps({"per_batch_ms": {"8": 1.0}}))
    assert load_cost_table(str(f)) == {8: 1.0}
