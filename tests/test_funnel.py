"""Funnel analysis: ordering semantics, ties, partial funnels."""

import pyarrow as pa


def _counts(rows, steps):
    import ray.data

    from opentapioca_ray.stages.funnel import funnel_counts

    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], type=pa.int64()),
            "ts": pa.array(rows["ts"], type=pa.timestamp("us")),
            "event_type": pa.array(rows["event_type"], type=pa.string()),
        }
    )
    out = funnel_counts(ray.data.from_arrow(t), steps).to_pandas()
    return dict(zip(out["step"], out["n_users"]))


def test_order_matters(ray_session):
    # user 1: view@1 click@2 buy@3 (full funnel)
    # user 2: click@1 view@2 (click BEFORE view -> stops at view)
    # user 3: view@1 buy@2 (no click -> stops at view)
    rows = {
        "user_id": [1, 1, 1, 2, 2, 3, 3],
        "ts": [1, 2, 3, 1, 2, 1, 2],
        "event_type": ["view", "click", "buy", "click", "view", "view", "buy"],
    }
    c = _counts(rows, ["view", "click", "buy"])
    assert c == {"view": 3, "click": 1, "buy": 1}


def test_same_timestamp_counts(ray_session):
    # ties: step k at the SAME ts as step k-1 counts (>=, SQL parity)
    rows = {"user_id": [1, 1], "ts": [5, 5], "event_type": ["view", "click"]}
    c = _counts(rows, ["view", "click"])
    assert c == {"view": 1, "click": 1}


def test_noise_types_ignored_and_empty(ray_session):
    rows = {"user_id": [1, 1], "ts": [1, 2], "event_type": ["error", "signup"]}
    c = _counts(rows, ["view", "click"])
    assert c == {"view": 0, "click": 0}


def test_retention_cohorts(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.funnel import retention_cohorts

    day = 86_400_000_000
    # user 1: days 0, 0 (dup), 2; user 2: days 1, 1; user 3: day 2
    t = pa.table(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": pa.array(
                [0, 1000, 2 * day, day, day + 5, 2 * day],
                type=pa.timestamp("us"),
            ),
        }
    )
    out = retention_cohorts(ray.data.from_arrow(t).repartition(3)).to_pandas()
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for _, r in out.iterrows()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (2, 0): 1}
