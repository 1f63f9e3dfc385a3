"""Truncated-EWMA trailing sum: exact integer semantics vs the recursion."""

import numpy as np
import pandas as pd


def _ref_ewma_num(values_c, taps):
    out = []
    for i in range(len(values_c)):
        s = 0
        for lag in range(min(i, taps) + 1):
            s += int(values_c[i - lag]) << (taps - lag)
        out.append(s)
    return out


def test_ewma_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import ewma_trailing

    rng = np.random.default_rng(21)
    rows, expect = [], {}
    eid = 0
    for user in range(8):
        n = int(rng.integers(3, 40))
        vals = rng.uniform(0, 200, n).round(2)
        ts = np.sort(rng.integers(0, 10**6, n))
        ids = []
        for t, v in zip(ts, vals):
            rows.append(
                {
                    "event_id": eid,
                    "user_id": user,
                    "ts": pd.Timestamp(int(t) * 1000, unit="ns"),
                    "value": float(v),
                }
            )
            ids.append(eid)
            eid += 1
        cvals = np.rint(vals * 100).astype(np.int64)
        order = np.argsort(ts, kind="stable")
        nums = _ref_ewma_num(cvals[order], 16)
        for j, pos in enumerate(order):
            expect[ids[pos]] = nums[j]

    ds = ray.data.from_items(rows).repartition(4)
    out = ewma_trailing(ds, taps=16).to_pandas()
    got = dict(zip(out["event_id"], out["ewma_num"]))
    assert got == expect


def test_ewma_taps_do_not_cross_groups(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import ewma_trailing

    rows = [
        {"event_id": 1, "user_id": 1, "ts": pd.Timestamp(0), "value": 100.0},
        {"event_id": 2, "user_id": 2, "ts": pd.Timestamp(1, unit="s"), "value": 100.0},
    ]
    out = ewma_trailing(ray.data.from_items(rows), taps=4).to_pandas()
    got = dict(zip(out["event_id"], out["ewma_num"]))
    # both are the FIRST event of their group: numerator = c << taps only
    assert got == {1: 10000 << 4, 2: 10000 << 4}
