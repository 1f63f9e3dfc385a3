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
