"""Combiner-first aggregation operators.

Ray Data's `groupby(key).aggregate(...)` shuffles every input row to its
key's reducer. For high-cardinality facts over a bounded key space that is
wasted exchange volume: a map-side combiner (partial aggregate per batch)
shrinks the shuffle to at most |distinct keys| rows PER BLOCK before the
all-to-all — the classic combiner pattern the driver brief mandates
("pre-aggregate inside map_batches before a groupby").

- `partial_sum_count`: per-batch Arrow `group_by` partials -> one small
  groupby-sum. Exchange volume drops from O(rows) to
  O(blocks x distinct keys in block).
- `histogram_quantiles`: exact type-1 quantiles of a bounded-cardinality
  integer column via a (value -> count) histogram built with the same
  combiner; only the histogram (|distinct values| rows) is ever collected.
  DuckDB's `quantile_disc` implements the same type-1 definition, which is
  what makes the driver oracle exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _partial(batch: pa.Table, key: str, sum_cols: list[str]) -> pa.Table:
    cols = [key] + [c for c in sum_cols if c != key]
    names = [key] + [f"_psum_{c}" for c in sum_cols] + ["_pcount"]
    if batch.num_rows == 0:
        # keep the schema so downstream blocks stay mergeable
        fields = [batch.schema.field(key)] + [
            batch.schema.field(c) for c in sum_cols
        ] + [pa.field("_pcount", pa.int64())]
        return pa.schema(
            [pa.field(n, f.type) for n, f in zip(names, fields)]
        ).empty_table()
    aggs = [(c, "sum") for c in sum_cols] + [(key, "count")]
    out = pa.TableGroupBy(batch.select(cols), key).aggregate(aggs)
    return out.rename_columns(names)


def partial_sum_count(ds, key: str, sum_cols: list[str], alias: dict | None = None):
    """groupby(key) with Sum(sum_cols...) + Count, combiner-first.

    Returns a dataset with columns `key, <alias.get(c, 'sum_'+c)>...,
    <alias.get('count', 'count')>`. Semantically identical to
    `ds.groupby(key).aggregate(Sum(c)..., Count())` but the all-to-all moves
    partial rows, not facts."""
    from ray.data.aggregate import Sum

    alias = alias or {}
    partials = ds.map_batches(
        lambda b: _partial(b, key, sum_cols), batch_format="pyarrow"
    )
    merged = partials.groupby(key).aggregate(
        *(
            [Sum(f"_psum_{c}", alias_name=alias.get(c, f"sum_{c}")) for c in sum_cols]
            + [Sum("_pcount", alias_name=alias.get("count", "count"))]
        )
    )
    return merged


_HISTOGRAM_LIMIT = 5_000_000  # distinct values the driver may hold


def histogram_quantiles(
    ds, value_column: str, probs: list[float], limit: int = _HISTOGRAM_LIMIT
) -> pa.Table:
    """Exact type-1 (inverse empirical CDF) quantiles of an integer-valued
    column: smallest x whose cumulative count reaches ceil(p * n).

    Distributed work is ONE combiner pass + a groupby over distinct values;
    only the aggregated histogram lands on the driver (guarded by `limit` —
    quantiles of genuinely continuous columns need a sketch, not this).
    Returns an Arrow table (p_e4: int64, value: int64) with p scaled by 1e4
    so the join key is integral on both the Ray and SQL sides."""
    hist_ds = partial_sum_count(ds.select_columns([value_column]), value_column, [])
    import ray

    tables = [ray.get(r) for r in hist_ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows and value_column in t.column_names]
    if not tables:
        return pa.table(
            {"p_e4": pa.array([], type=pa.int64()), "value": pa.array([], type=pa.int64())}
        )
    hist = pa.concat_tables(tables)
    if hist.num_rows > limit:
        raise ValueError(
            f"histogram cardinality {hist.num_rows} exceeds driver limit {limit}; "
            "use a quantile sketch for continuous columns"
        )
    vals = hist.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = hist.column("count").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    ranks = np.ceil(np.asarray(probs, dtype=np.float64) * n).astype(np.int64)
    ranks = np.clip(ranks, 1, n)
    idx = np.searchsorted(cum, ranks, side="left")
    return pa.table(
        {
            "p_e4": pa.array(
                [int(round(p * 10_000)) for p in probs], type=pa.int64()
            ),
            "value": pa.array(vals[idx], type=pa.int64()),
        }
    )


def distinct_count(ds, group_column: str, value_column: str, alias: str = "n_distinct"):
    """Exact COUNT(DISTINCT value) per group, the scalable way: per-batch
    unique (group, value) pairs (combiner), ONE groupby dedup over unique
    pairs, then a combiner-first count per group. No per-group Python sets,
    no driver collect; exchange volume is bounded by the number of DISTINCT
    pairs, not input rows. (Approximate HLL is the sketch path when even
    distinct pairs are too many; exactness here is what the oracle checks.)"""

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or group_column not in batch.column_names:
            return batch
        return (
            batch.select([group_column, value_column])
            .group_by([group_column, value_column])
            .aggregate([])
        )

    pairs = ds.map_batches(uniq_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Count

    dedup = pairs.groupby([group_column, value_column]).aggregate(
        Count(alias_name="_one")
    )

    def drop_one(batch: pa.Table) -> pa.Table:
        if "_one" in batch.column_names:
            return batch.drop_columns("_one")
        return batch

    dedup = dedup.map_batches(drop_one, batch_format="pyarrow")
    return partial_sum_count(dedup, group_column, [], alias={"count": alias})
