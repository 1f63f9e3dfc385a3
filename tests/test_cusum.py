"""CUSUM drift detection: vectorized identity vs the literal recursion."""

import numpy as np
import pandas as pd


def _ref_cusum(values_c, k, h):
    s, n_alarms, mx = 0, 0, 0
    for c in values_c:
        s = max(0, s + (c - k))
        mx = max(mx, s)
        if s >= h:
            n_alarms += 1
    return n_alarms, mx


def _run(rows, drift_c, alarm_c, ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import cusum_stats

    ds = ray.data.from_items(rows).repartition(3)
    out = cusum_stats(ds, drift_c=drift_c, alarm_c=alarm_c).to_pandas()
    return out.set_index("user_id").sort_index()


def test_cusum_matches_sequential_recursion(ray_session):
    rng = np.random.default_rng(13)
    rows, expect = [], {}
    eid = 0
    for user in range(12):
        n = int(rng.integers(5, 60))
        vals = rng.uniform(0, 150, n).round(2)
        ts = np.sort(rng.integers(0, 10**6, n))
        for t, v in zip(ts, vals):
            rows.append(
                {
                    "event_id": eid,
                    "user_id": user,
                    "ts": pd.Timestamp(int(t) * 1000, unit="ns"),
                    "value": float(v),
                }
            )
            eid += 1
        cvals = np.rint(vals * 100).astype(np.int64)
        order = np.argsort(ts, kind="stable")
        expect[user] = _ref_cusum(cvals[order], 6000, 15000)

    out = _run(rows, 6000, 15000, ray_session)
    assert len(out) == 12
    for user, (n_alarms, mx) in expect.items():
        assert out.loc[user, "n_alarms"] == n_alarms, user
        assert out.loc[user, "max_stat_c"] == mx, user


def test_cusum_floor_at_zero(ray_session):
    # all values far below drift: stat pinned at 0, no alarms
    rows = [
        {
            "event_id": i,
            "user_id": 1,
            "ts": pd.Timestamp(i, unit="s"),
            "value": 1.0,
        }
        for i in range(20)
    ]
    out = _run(rows, 6000, 1, ray_session)
    assert out.loc[1, "n_alarms"] == 0
    assert out.loc[1, "max_stat_c"] == 0
    assert out.loc[1, "n_events"] == 20


def test_cusum_timestamp_peers_break_ties_by_id(ray_session):
    # two events at the identical timestamp: order must be event_id
    rows = [
        {"event_id": 2, "user_id": 1, "ts": pd.Timestamp(0), "value": 300.0},
        {"event_id": 1, "user_id": 1, "ts": pd.Timestamp(0), "value": 0.0},
    ]
    # order by id: y = [-6000, +24000] -> stats [0, 24000] -> 1 alarm
    out = _run(rows, 6000, 20000, ray_session)
    assert out.loc[1, "n_alarms"] == 1
    assert out.loc[1, "max_stat_c"] == 24000
