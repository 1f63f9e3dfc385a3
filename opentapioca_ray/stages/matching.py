"""One-to-one assignment over scored candidate pairs.

After blocking + scoring, ER pipelines often need each record matched to AT
MOST ONE partner. The deterministic, shuffle-friendly rule is the
RECIPROCAL BEST HIT: keep pair (u, v) iff v is u's best-scoring partner AND
u is v's best (ties broken by partner id), the bipartite-matching heuristic
classical record-linkage systems use (Christen, "Data Matching", 2012,
ch. 6 one-to-one assignment). Unlike greedy global matching it needs no
sequential pass, so it distributes as two grouped argmins + one pair merge.

Scale shape: symmetrize pairs (2 rows per pair), reuse the combiner-first
`group_arg_extreme` (per-batch winners -> coarse exchange), then ONE coarse
(u, v) exchange counts how many directions chose the same pair — mutual
pairs appear exactly twice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def mutual_best_match(
    pairs_ds,
    u_column: str = "u",
    v_column: str = "v",
    score_column: str = "lev",
    ascending: bool = True,
):
    """(u, v, score) candidate pairs -> the reciprocal-best subset, same
    columns, u < v. `ascending=True` treats smaller scores as better
    (distances); False for similarities."""
    from opentapioca_ray.stages.aggregates import group_arg_extreme
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    def symmetrize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or u_column not in batch.column_names:
            return pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("s", pa.int64())]
            ).empty_table()
        u = batch.column(u_column).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(v_column).to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column(score_column).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(np.concatenate((u, v))),
                "b": pa.array(np.concatenate((v, u))),
                "s": pa.array(np.concatenate((s, s))),
            }
        )

    sym = pairs_ds.map_batches(symmetrize, batch_format="pyarrow")
    best = group_arg_extreme(
        sym, ["a"], ["s", "b"], ["b"], ascending=ascending
    )

    def canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("s", pa.int64())]
            ).empty_table()
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.minimum(a, b)),
                "v": pa.array(np.maximum(a, b)),
                "s": pa.array(s),
            }
        )

    canonical = best.map_batches(canon, batch_format="pyarrow")
    counted = coarse_groupby_agg(
        canonical, ["u", "v"], {"s": ("s", "max"), "n_dir": ("s", "size")}
    )

    def mutual(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_dir" not in batch.column_names:
            return pa.schema(
                [
                    (u_column, pa.int64()),
                    (v_column, pa.int64()),
                    (score_column, pa.int64()),
                ]
            ).empty_table()
        n = batch.column("n_dir").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(n == 2))
        return pa.table(
            {
                u_column: t.column("u"),
                v_column: t.column("v"),
                score_column: t.column("s"),
            }
        )

    return counted.map_batches(mutual, batch_format="pyarrow")
