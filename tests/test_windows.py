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


def test_interval_join_basic_and_overlap(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import interval_join_events

    import pandas as pd

    b = int(pd.Timestamp(T0).value // 1000)  # epoch us of T0
    # user 1: two OVERLAPPING intervals; user 2: one interval; user 3: none
    intervals = ray.data.from_items(
        [
            {"user_id": 1, "start_us": b + 10 * US, "end_us": b + 50 * US},
            {"user_id": 1, "start_us": b + 40 * US, "end_us": b + 90 * US},
            {"user_id": 2, "start_us": b, "end_us": b + 5 * US},
        ]
    )
    events = ray.data.from_items(
        [
            _ev(0, 45, 1),   # inside BOTH user-1 intervals
            _ev(1, 10, 1),   # on first interval's start bound (inclusive)
            _ev(2, 90, 1),   # on second interval's end bound (inclusive)
            _ev(3, 91, 1),   # outside everything
            _ev(4, 3, 2),    # user 2's interval
            _ev(5, 3, 3),    # user with no intervals
        ]
    )
    out = interval_join_events(intervals, events).take_all()
    got = {(r["key"], (r["start_us"] - b) // US, r["event_id"]) for r in out}
    assert got == {
        (1, 10, 0),
        (1, 40, 0),
        (1, 10, 1),
        (1, 40, 2),
        (2, 0, 4),
    }
    # ts_us is the event's own timestamp
    by_event = {r["event_id"]: r["ts_us"] for r in out}
    assert by_event[4] == b + 3 * US


def test_interval_join_empty_sides(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import interval_join_events

    intervals = ray.data.from_items(
        [{"user_id": 1, "start_us": 0, "end_us": 10 * US}]
    )
    events = ray.data.from_items([_ev(0, 5, 1)])
    no_events = events.filter(lambda r: False)
    no_intervals = intervals.filter(lambda r: False)
    assert interval_join_events(intervals, no_events).count() == 0
    assert interval_join_events(no_intervals, events).count() == 0


def test_interval_join_matches_duckdb(ray_session):
    """Cross-check the composite-searchsorted kernel against a DuckDB
    range join on a randomized instance (overlaps, shared bounds, dup ts)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.windows import interval_join_events

    rng = np.random.RandomState(11)
    n_iv, n_ev = 60, 300
    iv = pd.DataFrame(
        {
            "user_id": rng.randint(0, 8, n_iv).astype(np.int64),
            "start_us": rng.randint(0, 1000, n_iv).astype(np.int64),
        }
    )
    iv["end_us"] = iv["start_us"] + rng.randint(0, 200, n_iv).astype(np.int64)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "user_id": rng.randint(0, 10, n_ev).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 1100, n_ev), unit="us"),
        }
    )
    out = interval_join_events(
        ray.data.from_pandas(iv), ray.data.from_pandas(ev)
    ).take_all()
    got = {(r["key"], r["start_us"], r["end_us"], r["event_id"]) for r in out}
    want = {
        tuple(r)
        for r in duckdb.sql(
            """SELECT i.user_id, i.start_us, i.end_us, e.event_id
               FROM iv i JOIN ev e ON e.user_id = i.user_id
                AND epoch_us(e.ts) BETWEEN i.start_us AND i.end_us"""
        ).fetchall()
    }
    assert got == want and len(want) > 50


def test_windowed_frame_segments(ray_session):
    import datetime

    import ray.data

    from opentapioca_ray.stages.windows import windowed_frame

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: 4 events; user 2: 1 event (shorter than the frame)
        {"event_id": 1, "user_id": 1, "ts": t0, "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": t0 + datetime.timedelta(seconds=1), "value": 2.0},
        {"event_id": 3, "user_id": 1, "ts": t0 + datetime.timedelta(seconds=2), "value": 3.0},
        {"event_id": 4, "user_id": 1, "ts": t0 + datetime.timedelta(seconds=3), "value": 4.0},
        {"event_id": 5, "user_id": 2, "ts": t0, "value": 10.0},
    ]
    got = (
        windowed_frame(ray.data.from_items(rows), preceding=2)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(got["running_sum_u"]) == [
        1_000_000, 3_000_000, 6_000_000, 10_000_000, 10_000_000,
    ]
    # rolling avg over <=3-row frame, micro-units
    assert list(got["rolling_avg_u"]) == [
        1_000_000.0, 1_500_000.0, 2_000_000.0, 3_000_000.0, 10_000_000.0,
    ]


def test_windowed_frame_ts_tiebreak(ray_session):
    import datetime

    import ray.data

    from opentapioca_ray.stages.windows import windowed_frame

    t0 = datetime.datetime(2024, 1, 1)
    # identical ts: order must fall back to event_id
    rows = [
        {"event_id": 2, "user_id": 1, "ts": t0, "value": 5.0},
        {"event_id": 1, "user_id": 1, "ts": t0, "value": 1.0},
    ]
    got = (
        windowed_frame(ray.data.from_items(rows), preceding=0)
        .to_pandas()
        .set_index("event_id")
    )
    assert got.loc[1, "running_sum_u"] == 1_000_000
    assert got.loc[2, "running_sum_u"] == 6_000_000


def test_grouped_sequence_order_and_ties(ray_session):
    import datetime

    import ray.data

    from opentapioca_ray.stages.windows import grouped_sequence

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        {"event_id": 2, "user_id": 1, "ts": t0, "event_type": "b", "value": 0.0},
        {"event_id": 1, "user_id": 1, "ts": t0, "event_type": "a", "value": 0.0},
        {"event_id": 3, "user_id": 1, "ts": t0 + datetime.timedelta(seconds=1), "event_type": "c", "value": 0.0},
        {"event_id": 4, "user_id": 2, "ts": t0, "event_type": "x", "value": 0.0},
    ]
    got = (
        grouped_sequence(ray.data.from_items(rows), "user_id", "ts", "event_type")
        .to_pandas()
        .set_index("user_id")
    )
    # same-ts rows fall back to event_id order
    assert got.loc[1, "seq"] == "a,b,c"
    assert got.loc[1, "n_events"] == 3
    assert got.loc[2, "seq"] == "x"


def test_hopping_window_membership(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import hopping_window_agg

    # window 40us / hop 10us -> every event in exactly 4 windows
    t = pa.table(
        {
            "ts": pa.array([100, 125], type=pa.timestamp("us")),
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
        }
    )
    out = (
        hopping_window_agg(
            ray.data.from_arrow(t), window_us=40, hop_us=10
        )
        .to_pandas().sort_values("window_start_us").reset_index(drop=True)
    )
    # event@100 -> windows 70..100; event@125 -> 90..120
    assert out["window_start_us"].tolist() == [70, 80, 90, 100, 110, 120]
    assert out["n"].tolist() == [1, 1, 2, 2, 1, 1]
    assert out["total_e4"].tolist() == [
        10000, 10000, 30000, 30000, 20000, 20000
    ]


def test_hopping_window_requires_multiple(ray_session):
    import pytest
    import ray.data
    import pyarrow as pa

    from opentapioca_ray.stages.windows import hopping_window_agg

    t = pa.table({"ts": pa.array([1], type=pa.timestamp("us")),
                  "event_type": ["a"], "value": [1.0]})
    with pytest.raises(ValueError):
        hopping_window_agg(ray.data.from_arrow(t), window_us=35, hop_us=10)


def test_group_ntile_uneven_and_small_groups(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import group_ntile

    rows = (
        # group "a": 6 rows -> ntile(4) buckets of sizes 2,2,1,1
        [{"g": "a", "v": float(i), "id": i} for i in range(6)]
        # group "b": 3 rows (< n_buckets) -> buckets 1,2,3
        + [{"g": "b", "v": 0.0, "id": 10 + i} for i in range(3)]
    )
    out = group_ntile(
        ray.data.from_items(rows).repartition(3), "g", "v", "id", n_buckets=4
    ).to_pandas()
    got = {r["id"]: r["bucket"] for _, r in out.iterrows()}
    assert got == {
        0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 4,   # sizes 2,2,1,1
        10: 1, 11: 2, 12: 3,                   # ties broken by id
    }


def test_group_lag_delta_drops_first_rows(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import group_lag_delta

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 8],
            "ts": pa.array([0, 10, 20, 5], type=pa.timestamp("us")),
            "value": [1.0, 3.5, 2.0, 9.0],
        }
    )
    out = group_lag_delta(ray.data.from_arrow(t).repartition(2)).to_pandas()
    got = {r["event_id"]: r["delta_e4"] for _, r in out.iterrows()}
    # user 8's single event has no predecessor -> dropped
    assert got == {2: 25_000, 3: -15_000}


def test_ratio_to_report_shares(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import ratio_to_report

    t = pa.table(
        {
            "event_id": [1, 2, 3],
            "event_type": ["a", "a", "b"],
            "value": [1.0, 3.0, 5.0],
        }
    )
    out = ratio_to_report(
        ray.data.from_arrow(t).repartition(2), "event_type", "value", "event_id"
    ).to_pandas()
    got = {r["event_id"]: (r["group_total_e4"], r["share_ppm"]) for _, r in out.iterrows()}
    assert got == {1: (40_000, 250_000), 2: (40_000, 750_000), 3: (50_000, 1_000_000)}


def test_group_transition_counts(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import group_transition_counts

    # user 1: a -> b -> a ; user 2: b -> b ; user 3: single event (no pair)
    t = pa.table(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:00:30",
                 "2024-01-01 00:03:00", "2024-01-01 00:00:10"]
            ),
            "event_type": ["a", "b", "a", "b", "b", "a"],
        }
    )
    out = group_transition_counts(
        ray.data.from_arrow(t).repartition(4), "user_id", "ts", "event_type", "event_id"
    ).to_pandas()
    got = {(r["prev_type"], r["next_type"]): r["n"] for _, r in out.iterrows()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_interarrival_stats(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import interarrival_stats

    t = pa.table(
        {
            "user_id": [1, 1, 1, 2, 3],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
                 "2024-01-01 00:01:10", "2024-01-01 05:00:00",
                 "2024-01-01 06:00:00"]
            ),
        }
    )
    out = (
        interarrival_stats(
            ray.data.from_arrow(t).repartition(3), "user_id", "ts", "event_id"
        )
        .to_pandas()
        .set_index("user_id")
    )
    # users 2 and 3 have one event each -> dropped
    assert sorted(out.index) == [1]
    assert out.loc[1, "n_gaps"] == 2
    assert out.loc[1, "sum_gap_us"] == 70_000_000
    assert out.loc[1, "max_gap_us"] == 60_000_000


def test_activity_streaks(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import activity_streaks

    # user 1: days 0,1,2 and 5 -> 4 active days, 2 streaks, longest 3
    # user 2: day 9 twice (same day) -> 1 active day, 1 streak of 1
    t = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["1970-01-01 03:00", "1970-01-02 07:00", "1970-01-03 01:00",
                 "1970-01-06 23:59", "1970-01-10 05:00", "1970-01-10 18:00"]
            ),
        }
    )
    out = (
        activity_streaks(ray.data.from_arrow(t).repartition(4), "user_id", "ts")
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "n_active_days"] == 4
    assert out.loc[1, "n_streaks"] == 2
    assert out.loc[1, "longest_streak"] == 3
    assert out.loc[2, "n_active_days"] == 1
    assert out.loc[2, "n_streaks"] == 1
    assert out.loc[2, "longest_streak"] == 1


def test_group_rank_tie_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import group_rank

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4, 5],
            "event_type": ["a", "a", "a", "a", "b"],
            "value": [9.0, 9.0, 5.0, 1.0, 3.0],
        }
    )
    out = (
        group_rank(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
    )
    # ties share rank 1; next rank skips to 3
    assert out.loc[1, "rnk"] == 1 and out.loc[2, "rnk"] == 1
    assert out.loc[3, "rnk"] == 3
    assert out.loc[4, "rnk"] == 4
    assert out.loc[5, "rnk"] == 1


def test_global_order_index(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.windows import global_order_index

    # global row_number over (value, id): ties on value break by id
    t = pa.table(
        {
            "event_id": [10, 11, 12, 13, 14, 15],
            "value": [0.5, 0.1, 0.5, 0.9, 0.1, 0.1],
        }
    )
    out = (
        global_order_index(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
    )
    # sorted (value, id): (0.1,11) (0.1,14) (0.1,15) (0.5,10) (0.5,12) (0.9,13)
    assert out.loc[11, "row_idx"] == 1
    assert out.loc[14, "row_idx"] == 2
    assert out.loc[15, "row_idx"] == 3
    assert out.loc[10, "row_idx"] == 4
    assert out.loc[12, "row_idx"] == 5
    assert out.loc[13, "row_idx"] == 6
    assert sorted(out["row_idx"]) == [1, 2, 3, 4, 5, 6]


def test_peak_concurrency_two_phase_scan(ray_session):
    """Carry across day partitions: spans with no in-day deltas report the
    carry; peaks match a brute-force sweep."""
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.windows import peak_concurrency

    DAY = 100  # small "day" for the test
    intervals = [
        (0, 10),     # day 0
        (5, 250),    # spans days 0-2
        (8, 9),      # day 0: peak 3 at us 8-9
        (150, 160),  # day 1: with the spanner -> 2
        (320, 330),  # day 3
    ]
    ds = ray.data.from_items(
        [{"start_us": s, "end_us": e} for s, e in intervals]
    )
    out = peak_concurrency(ds, "start_us", "end_us", day_us=DAY, n_parts=4)
    got = dict(zip(out["day"], out["peak"]))

    # brute force: concurrency at every integer instant
    hi = max(e for _, e in intervals) + 2
    conc = np.zeros(hi, dtype=int)
    for s, e in intervals:
        conc[s : e + 1] += 1
    exp = {}
    for day in range(0, (hi // DAY) + 1):
        window = conc[day * DAY : (day + 1) * DAY]
        if day * DAY <= max(e for _, e in intervals) + 1:
            exp[day] = int(window.max()) if len(window) else 0
    # operator reports days between first and last delta day
    assert got == {d: exp[d] for d in got}
    assert got[0] == 3
    assert got[2] == 1   # span-only day: pure carry
    assert got[3] == 1


def test_interval_union_islands(ray_session):
    """Overlapping and touching intervals merge; gapped ones don't; the
    running-max (not last-end) defines overlap for contained intervals."""
    import ray.data

    from opentapioca_ray.stages.windows import interval_union_per_key

    rows = [
        # user 1: [0,10] + contained [2,3] + touching [10,15] -> one island
        {"u": 1, "s": 0, "e": 10},
        {"u": 1, "s": 2, "e": 3},
        {"u": 1, "s": 10, "e": 15},
        # gap, then [20,25]
        {"u": 1, "s": 20, "e": 25},
        # user 2: containment chain [0,100] ⊃ [1,2] ⊃ ... then [50,60]
        {"u": 2, "s": 0, "e": 100},
        {"u": 2, "s": 1, "e": 2},
        {"u": 2, "s": 50, "e": 60},
        {"u": 2, "s": 150, "e": 151},
    ]
    out = interval_union_per_key(
        ray.data.from_items(rows), "u", "s", "e", n_parts=4
    ).take_all()
    got = {r["u"]: (r["covered"], r["n_islands"]) for r in out}
    assert got[1] == (20, 2)  # [0,15] + [20,25]
    assert got[2] == (101, 2)  # [0,100] + [150,151]


def test_next_greater_sparse_table_descent(ray_session):
    """Vectorized next-greater matches a brute-force scan, including key
    walls, duplicate values, and last-in-segment rows."""
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.windows import next_greater_event

    rng = np.random.default_rng(13)
    rows = []
    eid = 0
    for u in range(7):
        for _ in range(rng.integers(1, 60)):
            rows.append(
                {
                    "user_id": u,
                    "event_id": eid,
                    "us": int(rng.integers(0, 500)),
                    "value_e4": int(rng.integers(0, 12)),  # many ties
                }
            )
            eid += 1
    out = next_greater_event(
        ray.data.from_items(rows).repartition(5),
        key_column="user_id",
        order_columns=("us", "event_id"),
        value_column="value_e4",
        n_parts=4,
    ).take_all()
    got = {r["event_id"]: r["wait_us"] for r in out}

    exp = {}
    for a in rows:
        cands = [
            b
            for b in rows
            if b["user_id"] == a["user_id"]
            and (b["us"], b["event_id"]) > (a["us"], a["event_id"])
            and b["value_e4"] > a["value_e4"]
        ]
        if cands:
            nxt = min(cands, key=lambda b: (b["us"], b["event_id"]))
            exp[a["event_id"]] = nxt["us"] - a["us"]
        else:
            exp[a["event_id"]] = -1
    assert got == exp


def test_rolling_median_full_windows(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import numpy as np
    import __ray_entry__ as entry
    import duckdb

    out = entry.queries()["rolling_median"]("/root/testdata/sf0.001")
    got = {r["event_id"]: r["med5_e4"] for r in out.take_all()}
    # brute force via pandas rolling on the raw table
    con = duckdb.connect()
    df = con.execute(
        "SELECT event_id, user_id, epoch_us(ts) us, "
        "CAST(round(value*10000,0) AS BIGINT) v "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        "ORDER BY user_id, us, event_id"
    ).fetchdf()
    exp = {}
    for _, g in df.groupby("user_id"):
        vals = g["v"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(4, len(vals)):
            exp[int(ids[i])] = int(np.sort(vals[i - 4 : i + 1])[2])
    assert got == exp


def test_decayed_engagement_brute_force(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry
    import duckdb

    out = entry.queries()["decayed_engagement"]("/root/testdata/sf0.001")
    got = {r["user_id"]: r["score_e4"] for r in out.take_all()}
    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) us, "
        "CAST(round(value*10000,0) AS BIGINT) v "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    t_max = max(r[1] for r in rows)
    hl = 7 * 86_400_000_000
    exp: dict[int, int] = {}
    for uid, us, v in rows:
        k = min((t_max - us) // hl, 62)
        exp[uid] = exp.get(uid, 0) + (v >> k)
    assert got == exp
    assert all(s >= 0 for s in got.values())
