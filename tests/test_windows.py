"""Windowed/temporal operators: tumbling windows, sessionization, as-of join."""

import datetime as dt

import pytest

US = 1_000_000
T0 = dt.datetime(2024, 1, 1)


def _ev(eid, sec, user, kind="click", value=1.0):
    return {
        "event_id": eid,
        "ts": T0 + dt.timedelta(seconds=sec),
        "user_id": user,
        "event_type": kind,
        "value": value,
    }


def test_tumbling_window(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import tumbling_window_agg

    events = [
        _ev(0, 10, 1, "click", 2.0),
        _ev(1, 20, 1, "view", 3.0),
        _ev(2, 3700, 2, "click", 5.0),  # next hour window
    ]
    out = tumbling_window_agg(
        ray.data.from_items(events), window_us=3600 * US
    ).take_all()
    got = {(r["window_start_us"], r["event_type"]): (r["n"], r["total_value"]) for r in out}
    import pandas as pd

    base = int(pd.Timestamp(T0).value // 1000)  # naive epoch us, no tz shift
    assert got[(base, "click")] == (1, 2.0)
    assert got[(base, "view")] == (1, 3.0)
    assert got[(base + 3600 * US, "click")] == (1, 5.0)


def test_sessionize_gap(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import sessionize

    events = [
        _ev(0, 0, 1, value=1.0),
        _ev(1, 60, 1, value=2.0),       # same session (gap 60s)
        _ev(2, 60 + 2000, 1, value=4.0),  # gap 2000s > 1800 -> new session
        _ev(3, 0, 2, value=8.0),        # other user
    ]
    out = sessionize(ray.data.from_items(events), gap_us=1800 * US).take_all()
    by = {(r["user_id"], r["session_index"]): r for r in out}
    assert len(by) == 3
    s0 = by[(1, 0)]
    assert s0["n_events"] == 2 and s0["total_value"] == 3.0
    assert s0["end_us"] - s0["start_us"] == 60 * US
    s1 = by[(1, 1)]
    assert s1["n_events"] == 1 and s1["total_value"] == 4.0
    assert by[(2, 0)]["n_events"] == 1


def test_asof_join(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import asof_join_events

    clicks = ray.data.from_items([_ev(10, 0, 1), _ev(11, 100, 1), _ev(12, 50, 2)])
    errors = ray.data.from_items(
        [
            _ev(20, 150, 1, "error"),  # matches click@100
            _ev(21, 100, 1, "error"),  # ts equality: matches click@100
            _ev(22, 40, 2, "error"),   # before any click of user 2 -> dropped
            _ev(23, 10, 3, "error"),   # user with no clicks -> dropped
        ]
    )
    out = asof_join_events(errors, clicks)
    rows = {r["event_id"]: r for r in out.take_all()}
    assert set(rows) == {20, 21}
    assert rows[20]["lag_us"] == 50 * US
    assert rows[21]["lag_us"] == 0
