"""Keyed snapshot diff (delta detection between two table versions).

The reconciliation half of the delta-ingestion story (SURVEY §2.10): given
an OLD and a NEW snapshot of the same logical table, emit one row per key
whose state changed — `added` (new only), `removed` (old only), `changed`
(both present, payload differs). Unchanged keys are dropped, so the output
is the delta a downstream `compact_by_key` / re-index run would consume
(reference semantics: the dump-vs-stream divergence a re-run + upsert
repairs, taggerfactory.py:103-120 last-write-wins).

Scale shape: both snapshots are tagged with a source bit and unioned — no
join; ONE coarse exchange on the key co-locates each key's (at most two)
rows; the partition kernel classifies ALL its keys in one vectorized pass.
Payloads are compared as int64 units so the delta is exact and
SQL-oracle-checkable (FULL OUTER JOIN parity).

Assumption: each key appears at most once per snapshot (snapshot = the
compacted state of the table, which `compact_by_key` guarantees).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MISSING = -1  # sentinel for "no row on this side" (payload units are >= 0)

_DIFF_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("status", pa.string()),
        ("old_units", pa.int64()),
        ("new_units", pa.int64()),
    ]
)


def _tag(ds, key_column: str, units_column: str, src: int):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_column not in batch.column_names:
            return pa.schema(
                [("key", pa.int64()), ("units", pa.int64()), ("src", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "key": batch.column(key_column).cast(pa.int64()),
                "units": batch.column(units_column).cast(pa.int64()),
                "src": pa.array(
                    np.full(batch.num_rows, src, dtype=np.int64)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_column: str, units_column: str):
    """Delta rows (key, status, old_units, new_units); missing side =
    MISSING (-1). `status` in {'added', 'removed', 'changed'}."""
    from opentapioca_ray.stages.exchange import coarse_group_apply

    tagged = _tag(old_ds, key_column, units_column, 0).union(
        _tag(new_ds, key_column, units_column, 1)
    )

    def diff_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "key": pd.Series(dtype=np.int64),
                "status": pd.Series(dtype=object),
                "old_units": pd.Series(dtype=np.int64),
                "new_units": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        keys = df["key"].to_numpy(dtype=np.int64)
        units = df["units"].to_numpy(dtype=np.int64)
        src = df["src"].to_numpy(dtype=np.int64)
        order = np.lexsort((src, keys))
        keys, units, src = keys[order], units[order], src[order]
        new = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [len(keys)])))
        # singleton keys: added (src 1) or removed (src 0)
        single = starts[sizes == 1]
        s_keys = keys[single]
        s_added = src[single] == 1
        # paired keys: old row at start (src 0 sorts first), new at start+1
        both = starts[sizes == 2]
        both = both[(src[both] == 0) & (src[both + 1] == 1)]  # contract guard
        old_u, new_u = units[both], units[both + 1]
        ch = old_u != new_u
        out_key = np.concatenate((s_keys, keys[both][ch]))
        out_status = np.concatenate(
            (
                np.where(s_added, "added", "removed"),
                np.full(int(ch.sum()), "changed", dtype=object),
            )
        )
        out_old = np.concatenate(
            (np.where(s_added, MISSING, units[single]), old_u[ch])
        )
        out_new = np.concatenate(
            (np.where(s_added, units[single], MISSING), new_u[ch])
        )
        if len(out_key) == 0:
            return empty
        return pd.DataFrame(
            {
                "key": out_key,
                "status": out_status,
                "old_units": out_old,
                "new_units": out_new,
            }
        )

    return coarse_group_apply(tagged, "key", diff_partition)


def three_way_merge(
    base_ds,
    ours_ds,
    theirs_ds,
    key_column: str,
    value_columns: list[str],
    n_parts: int | None = None,
):
    """Three-way snapshot reconciliation — the multi-writer merge audit:
    for every key in base ∪ ours ∪ theirs, classify the two replicas'
    edits against the common ancestor:

      unchanged      — neither replica differs from base
      ours_only      — only ours changed (theirs still = base)
      theirs_only    — only theirs changed
      both_same      — both changed to the SAME value (clean convergence)
      conflict       — both changed, to different values
      added/removed  — key missing from base and/or a replica

    Values compare as the '|'-join of `value_columns` (the
    table_checksum serialization). ONE coarse exchange on the key with
    three tagged slim inputs; the kernel is a per-key pivot, vectorized.
    Output: (merge_status, n_keys) counts plus per-status key min/max so
    a follow-up diff can range-scan just the conflicts."""
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
    )

    union_schema = pa.schema(
        [("k", pa.int64()), ("val", pa.string()), ("side", pa.int64())]
    )

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or key_column not in batch.column_names:
                return union_schema.empty_table()
            import pyarrow.compute as pc

            cols = []
            for c in value_columns:
                col = batch.column(c).combine_chunks()
                if not (
                    pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)
                ):
                    col = pc.cast(col, pa.string())
                cols.append(col)
            joined = (
                cols[0]
                if len(cols) == 1
                else pc.binary_join_element_wise(*cols, "|")
            )
            return pa.table(
                {
                    "k": batch.column(key_column).cast(pa.int64()),
                    "val": joined,
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int64)
                    ),
                }
            )

        return fn

    unioned = (
        base_ds.map_batches(tag(0), batch_format="pyarrow")
        .union(ours_ds.map_batches(tag(1), batch_format="pyarrow"))
        .union(theirs_ds.map_batches(tag(2), batch_format="pyarrow"))
    )

    part_schema = {
        "merge_status": pd.Series(dtype=object),
        "n_keys": pd.Series(dtype=np.int64),
        "min_key": pd.Series(dtype=np.int64),
        "max_key": pd.Series(dtype=np.int64),
    }

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "side" not in df.columns:
            return pd.DataFrame(part_schema)
        k = df["k"].to_numpy(dtype=np.int64)
        side = df["side"].to_numpy(dtype=np.int64)
        val = df["val"].to_numpy()
        order = np.lexsort((side, k))
        k, side, val = k[order], side[order], val[order]
        new = np.concatenate(([True], k[1:] != k[:-1]))
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        n_seg = len(starts)
        # pivot: per key, the value on each side (None if absent)
        vals = np.full((n_seg, 3), None, dtype=object)
        vals[seg, side] = val
        b, o, t = vals[:, 0], vals[:, 1], vals[:, 2]
        status = np.empty(n_seg, dtype=object)
        has_b = b != None  # noqa: E711  (vectorized None compare)
        has_o = o != None  # noqa: E711
        has_t = t != None  # noqa: E711
        o_chg = has_b & has_o & (o != b)
        t_chg = has_b & has_t & (t != b)
        status[:] = "unchanged"
        status[o_chg & ~t_chg] = "ours_only"
        status[~o_chg & t_chg] = "theirs_only"
        status[o_chg & t_chg & (o == t)] = "both_same"
        status[o_chg & t_chg & (o != t)] = "conflict"
        status[has_b & (~has_o | ~has_t)] = "removed"
        status[~has_b] = "added"
        keys = k[starts]
        out = pd.DataFrame({"merge_status": status, "key": keys})
        agg = out.groupby("merge_status", sort=True).agg(
            n_keys=("key", "size"),
            min_key=("key", "min"),
            max_key=("key", "max"),
        )
        return agg.reset_index()

    partials = coarse_group_apply(unioned, "k", classify, n_parts=n_parts)
    return coarse_groupby_agg(
        partials,
        ["merge_status"],
        {
            "n_keys": ("n_keys", "sum"),
            "min_key": ("min_key", "min"),
            "max_key": ("max_key", "max"),
        },
        n_parts=n_parts,
    )
