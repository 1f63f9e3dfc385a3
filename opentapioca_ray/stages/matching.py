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


def to_fixed_point(
    arr: np.ndarray, scale: int | None, what: str
) -> np.ndarray:
    """Int64 scores for the exchange kernels. Integer inputs pass through;
    float inputs REQUIRE an explicit `scale` (fixed-point units,
    np.round(s * scale) — the repo-wide convention) because a bare int64
    cast would truncate similarities like 0.93 to 0 and silently degrade
    'best partner' to a smallest-id tie-break."""
    if np.issubdtype(arr.dtype, np.floating):
        if scale is None:
            raise TypeError(
                f"{what} is float-typed; pass an integer scale= to convert "
                "to fixed-point units (values become round(x * scale))"
            )
        return np.round(arr * float(scale)).astype(np.int64)
    return arr.astype(np.int64)


def mutual_best_match(
    pairs_ds,
    u_column: str = "u",
    v_column: str = "v",
    score_column: str = "lev",
    ascending: bool = True,
    score_scale: int | None = None,
):
    """(u, v, score) candidate pairs -> the reciprocal-best subset, same
    columns, u < v. `ascending=True` treats smaller scores as better
    (distances); False for similarities. Scores compare as int64: float
    score columns must pass `score_scale` (fixed-point units; the output
    score column is in those units)."""
    from opentapioca_ray.stages.aggregates import group_arg_extreme
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    def symmetrize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or u_column not in batch.column_names:
            return pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("s", pa.int64())]
            ).empty_table()
        u = batch.column(u_column).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(v_column).to_numpy(zero_copy_only=False).astype(np.int64)
        s = to_fixed_point(
            batch.column(score_column).to_numpy(zero_copy_only=False),
            score_scale,
            score_column,
        )
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


def survivorship(
    assign_ds,
    attr_ds,
    id_column: str,
    attr_columns: list[str],
    node_column: str = "node",
    component_column: str = "component",
):
    """Canonical-record merge (survivorship): per cluster and attribute,
    the MAJORITY value — most frequent wins, ties break on the lexically
    smallest value — the deterministic merge rule record-linkage systems
    apply after clustering (Christen 2012, ch. 6 data fusion). Output:
    (component, attr, value, n_votes).

    Scale shape: ONE reduce-side join attaches the component to each
    member's attributes (shuffle_join — neither side broadcast); the
    melted (component, attr, value) votes reduce with the combiner
    counter, and the winner per (component, attr) is the combiner-first
    grouped argmin on (-votes, value)."""
    from opentapioca_ray.stages.aggregates import (
        group_arg_extreme,
        partial_multi_sum_count,
    )
    from opentapioca_ray.stages.relational import shuffle_join

    joined = shuffle_join(
        attr_ds.select_columns([id_column] + attr_columns),
        assign_ds,
        id_column,
        node_column,
        [component_column],
        how="inner",
    )

    def melt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or component_column not in batch.column_names:
            return pa.schema(
                [
                    ("component", pa.int64()),
                    ("attr", pa.string()),
                    ("value", pa.string()),
                ]
            ).empty_table()
        comp = batch.column(component_column).cast(pa.int64())
        parts = []
        for col in attr_columns:
            vals = batch.column(col).to_numpy(zero_copy_only=False)
            parts.append(
                pa.table(
                    {
                        "component": comp,
                        "attr": pa.array(
                            np.full(batch.num_rows, col, dtype=object),
                            type=pa.string(),
                        ),
                        "value": pa.array(
                            np.asarray([str(x) for x in vals], dtype=object),
                            type=pa.string(),
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    votes = partial_multi_sum_count(
        joined.map_batches(melt, batch_format="pyarrow"),
        ["component", "attr", "value"],
        [],
        alias={"count": "n_votes"},
    )

    def neg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_votes" not in batch.column_names:
            return pa.schema(
                [
                    ("component", pa.int64()),
                    ("attr", pa.string()),
                    ("value", pa.string()),
                    ("n_votes", pa.int64()),
                    ("_neg", pa.int64()),
                ]
            ).empty_table()
        n = batch.column("n_votes").cast(pa.int64())
        import pyarrow.compute as pc

        return batch.append_column("_neg", pc.negate(n))

    winners = group_arg_extreme(
        votes.map_batches(neg, batch_format="pyarrow"),
        ["component", "attr"],
        ["_neg", "value"],
        ["n_votes"],
        ascending=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "component" not in batch.column_names:
            return pa.schema(
                [
                    ("component", pa.int64()),
                    ("attr", pa.string()),
                    ("value", pa.string()),
                    ("n_votes", pa.int64()),
                ]
            ).empty_table()
        return batch.select(["component", "attr", "value", "n_votes"])

    return winners.map_batches(finish, batch_format="pyarrow")
