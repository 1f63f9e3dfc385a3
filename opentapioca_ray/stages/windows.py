"""Windowed / temporal operators over event tables.

Operators Ray Data's Dataset API lacks natively, expressed as compositions
of map_batches (+ combiner) and keyed groupby shuffles, per the driver
brief's custom-operator guidance:

- `tumbling_window_agg` — fixed-width window aggregate: window key computed
  per batch, per-batch Arrow group-by combiner, then a small groupby-sum
  merge (shuffle rows ~= #windows x #keys per batch, not #events).
- `sessionize` — gap-based session windows per user: one
  `groupby(user_id).map_groups` exchange; within a group everything is
  numpy (sort, diff, cumsum) — partitioning assumption: one user's events
  fit in one group (bounded; salt by time-range for pathological users).
- `asof_join_events` — per left event, the most recent right event with
  ts <= left ts for the same user (DuckDB ASOF JOIN semantics): both sides
  tagged + unioned + one groupby(user_id) exchange, searchsorted inside.

Timestamps are returned as epoch microseconds (int64) so results compare
bit-exactly against SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col) -> "pa.Array":
    # normalize the unit first: sources differ (parquet: us, from_items: s/ns)
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def tumbling_window_agg(
    events_ds,
    ts_column: str = "ts",
    key_column: str = "event_type",
    value_column: str = "value",
    window_us: int = 3_600_000_000,
):
    """-> (window_start_us, key, n, total_value) per fixed window."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("window_start_us", pa.int64()), (key_column, pa.string()),
                 ("n", pa.int64()), ("total_value", pa.float64())]
            ).empty_table()
        us = _ts_us(batch.column(ts_column)).to_numpy(zero_copy_only=False)
        win = pa.array((us // window_us) * window_us, type=pa.int64())
        t = pa.table(
            {
                "window_start_us": win,
                key_column: batch.column(key_column),
                value_column: batch.column(value_column),
            }
        )
        g = t.group_by(["window_start_us", key_column]).aggregate(
            [([], "count_all"), (value_column, "sum")]
        )
        return pa.table(
            {
                "window_start_us": g.column("window_start_us"),
                key_column: g.column(key_column),
                "n": g.column("count_all"),
                "total_value": g.column(f"{value_column}_sum"),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start_us", key_column])
        .aggregate(Sum("n", alias_name="n"), Sum("total_value", alias_name="total_value"))
    )


def sessionize(
    events_ds,
    user_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    gap_us: int = 1_800_000_000,
):
    """Gap-based sessions per user -> (user_id, session_index, start_us,
    end_us, n_events, total_value). A new session starts when the gap to the
    previous event of the same user exceeds `gap_us`."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_column].astype("datetime64[us]").astype("int64").to_numpy()
        order = np.lexsort((df["event_id"].to_numpy(), ts)) if "event_id" in df else np.argsort(ts, kind="stable")
        ts = ts[order]
        vals = df[value_column].to_numpy()[order]
        new = np.concatenate(([False], np.diff(ts) > gap_us))
        sid = np.cumsum(new)
        n_sessions = sid[-1] + 1 if len(sid) else 0
        starts = np.zeros(n_sessions, dtype=np.int64)
        ends = np.zeros(n_sessions, dtype=np.int64)
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.bincount(sid, weights=vals, minlength=n_sessions)
        firsts = new.copy()
        firsts[0] = True
        bounds = np.flatnonzero(firsts)
        starts = ts[bounds]
        ends = ts[np.concatenate((bounds[1:] - 1, [len(ts) - 1]))]
        return pd.DataFrame(
            {
                "user_id": np.full(n_sessions, int(df[user_column].iloc[0]), dtype=np.int64),
                "session_index": np.arange(n_sessions, dtype=np.int64),
                "start_us": starts,
                "end_us": ends,
                "n_events": counts.astype(np.int64),
                "total_value": sums,
            }
        )

    return events_ds.groupby(user_column).map_groups(per_user, batch_format="pandas")


def asof_join_events(
    left_ds,
    right_ds,
    user_column: str = "user_id",
    ts_column: str = "ts",
):
    """For each left event: the greatest right-event ts <= left ts for the
    same user (DuckDB `ASOF JOIN` semantics, inner). Returns
    (event_id, ts_us, match_ts_us, lag_us).

    Both sides are tagged and unioned so matching needs exactly one
    groupby(user) exchange; within a group a vectorized searchsorted finds
    every match at once."""

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.schema(
                    [("user_id", pa.int64()), ("event_id", pa.int64()),
                     ("ts_us", pa.int64()), ("side", pa.int8())]
                ).empty_table()
            return pa.table(
                {
                    "user_id": b.column(user_column).cast(pa.int64()),
                    "event_id": b.column("event_id").cast(pa.int64()),
                    "ts_us": _ts_us(b.column(ts_column)),
                    "side": pa.array([side] * b.num_rows, type=pa.int8()),
                }
            )

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0]
        right = df[df["side"] == 1]
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype=np.int64),
                "ts_us": pd.Series(dtype=np.int64),
                "match_ts_us": pd.Series(dtype=np.int64),
                "lag_us": pd.Series(dtype=np.int64),
            }
        )
        if left.empty or right.empty:
            return empty
        rts = np.sort(right["ts_us"].to_numpy())
        lts = left["ts_us"].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        if not ok.any():
            return empty
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy()[ok],
                "ts_us": lts[ok],
                "match_ts_us": rts[idx[ok]],
                "lag_us": lts[ok] - rts[idx[ok]],
            }
        )

    return unioned.groupby("user_id").map_groups(per_user, batch_format="pandas")
