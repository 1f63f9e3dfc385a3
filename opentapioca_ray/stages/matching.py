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
from opentapioca_ray.stages.exchange import arrow_blocks


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


def key_window_pairs(
    ds,
    id_column: str,
    block_column: str,
    window: int,
    carry_columns: list[str],
    n_parts: int | None = None,
):
    """Numeric-key window blocking: within each block, candidate pairs
    (u, v) with u < v <= u + `window` (key VALUE distance, not rank), both
    sides' `carry_columns` attached with `_u` / `_v` suffixes. A classic
    cheap blocking scheme when the numeric id correlates with record
    locality; one coarse exchange, two-pointer pair expansion per block
    (searchsorted, no per-row loop)."""
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        segment_starts,
    )

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)}
        for c in carry_columns:
            cols[f"{c}_u"] = pd.Series(dtype=object)
            cols[f"{c}_v"] = pd.Series(dtype=object)
        empty = pd.DataFrame(cols)
        if df.empty:
            return empty
        blocks = df[block_column].to_numpy()
        ids = df[id_column].to_numpy(dtype=np.int64)
        _, bcodes = np.unique(blocks, return_inverse=True)
        order = np.lexsort((ids, bcodes))
        bcodes, ids = bcodes[order], ids[order]
        df = df.iloc[order]
        starts = segment_starts(bcodes)
        ends = np.concatenate((starts[1:], [len(bcodes)]))
        ai_all, bi_all = [], []
        for s, e in zip(starts, ends):
            k = ids[s:e]
            hi = np.searchsorted(k, k + window, side="right")
            n_nb = hi - np.arange(1, len(k) + 1)
            if n_nb.sum() <= 0:
                continue
            n_nb = np.maximum(n_nb, 0)
            iu = np.repeat(np.arange(len(k)), n_nb)
            # offsets 1..n_nb[i] per i
            off = np.arange(int(n_nb.sum())) - np.repeat(
                np.cumsum(n_nb) - n_nb, n_nb
            )
            ju = iu + 1 + off
            ai_all.append(iu + s)
            bi_all.append(ju + s)
        if not ai_all:
            return empty
        ai = np.concatenate(ai_all)
        bi = np.concatenate(bi_all)
        out = {"u": ids[ai], "v": ids[bi]}
        for c in carry_columns:
            vals = df[c].to_numpy()
            out[f"{c}_u"] = vals[ai]
            out[f"{c}_v"] = vals[bi]
        return pd.DataFrame(out)

    slim = ds.select_columns(
        [id_column, block_column] + [c for c in carry_columns if c != id_column]
    )
    return coarse_group_apply(slim, block_column, pair_partition, n_parts=n_parts)


def fs_weights(pairs_ds, label_column: str, agreement_columns: list[str]):
    """Fellegi-Sunter conditional agreement weights (Fellegi & Sunter 1969;
    Christen 2012 ch. 6): per comparison field, m = P(agree | match),
    u = P(agree | non-match), and the log2 agreement / disagreement
    weights. Combiner-first: each batch melts to (field, label, agree)
    partial counts; only the 4-row-per-field count table ever reduces —
    O(fields) driver state regardless of pair volume.

    Output: (field, m, u, w_agree, w_disagree) in round-6 units."""
    import pyarrow.compute as pc

    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    melt_schema = pa.schema(
        [
            ("field", pa.string()),
            ("label", pa.int8()),
            ("agree", pa.int8()),
            ("_n", pa.int64()),
        ]
    )

    def melt_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or label_column not in batch.column_names:
            return melt_schema.empty_table()
        lab = pc.cast(batch.column(label_column), pa.int8())
        parts = []
        for c in agreement_columns:
            parts.append(
                pa.table(
                    {
                        "field": pa.array(
                            np.full(batch.num_rows, c, dtype=object),
                            type=pa.string(),
                        ),
                        "label": lab,
                        "agree": pc.cast(batch.column(c), pa.int8()),
                    }
                )
            )
        melted = pa.concat_tables(parts)
        out = pa.TableGroupBy(melted, ["field", "label", "agree"]).aggregate(
            [("field", "count")]
        )
        return out.rename_columns(["field", "label", "agree", "_n"])

    counts = coarse_groupby_agg(
        pairs_ds.map_batches(melt_partial, batch_format="pyarrow"),
        ["field", "label", "agree"],
        {"count": ("_n", "sum")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("field", pa.string()),
                ("m", pa.float64()),
                ("u", pa.float64()),
                ("w_agree", pa.float64()),
                ("w_disagree", pa.float64()),
            ]
        )
        if batch.num_rows == 0 or "field" not in batch.column_names:
            return schema.empty_table()
        df = batch.to_pandas()
        rows = []
        for field, g in df.groupby("field", sort=True):
            c = {
                (int(r["label"]), int(r["agree"])): int(r["count"])
                for _, r in g.iterrows()
            }
            m_den = c.get((1, 1), 0) + c.get((1, 0), 0)
            u_den = c.get((0, 1), 0) + c.get((0, 0), 0)
            m = c.get((1, 1), 0) / m_den if m_den else None
            u = c.get((0, 1), 0) / u_den if u_den else None

            def _w(num, den):
                # degenerate categories (all/none agree) have no finite
                # weight: NULL, mirroring the SQL twin's CASE guards
                if num is None or den is None or num <= 0 or den <= 0:
                    return None
                return round(float(np.log2(num / den)), 6)

            rows.append(
                {
                    "field": field,
                    "m": round(m, 6) if m is not None else None,
                    "u": round(u, 6) if u is not None else None,
                    "w_agree": _w(m, u),
                    "w_disagree": _w(
                        None if m is None else 1 - m,
                        None if u is None else 1 - u,
                    ),
                }
            )
        return pa.Table.from_pylist(rows, schema=schema)

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow")


_STABLE_EMPTY = pa.schema(
    [
        ("proposer", pa.int64()),
        ("acceptor", pa.int64()),
        ("score", pa.int64()),
    ]
)


def stable_match(
    edges_ds,
    proposer_column: str = "proposer",
    acceptor_column: str = "acceptor",
    score_column: str = "score",
    rounds: int = 8,
    n_parts: int | None = None,
):
    """Gale-Shapley deferred acceptance (Gale & Shapley 1962) over scored
    candidate edges: each free proposer offers to its next-best remaining
    acceptor (smaller score = better, ties by acceptor id), each acceptor
    (capacity 1) tentatively holds the (score, proposer-id)-minimum offer
    and frees the rest. Unlike `mutual_best_match` (which drops every
    non-reciprocal pair) deferred acceptance keeps proposing down the
    preference lists, so contested acceptors end up with a STABLE
    one-to-one assignment. `rounds` is fixed so the SQL twin unrolls the
    trajectory exactly; duplicate (proposer, acceptor) edges collapse to
    their min score first.

    Scale shape: ONE coarse exchange ranks each proposer's preference
    list; each round is a single broadcast-filtered pass over the ranked
    edges (emit rank == ptr rows of free proposers) plus a driver merge of
    NODE-bounded state (one pointer per proposer, one held offer per
    acceptor) — the k-means/HITS driver-state convention: per-round driver
    traffic is O(proposers), the edge lists themselves never leave the
    cluster."""
    import ray

    from .exchange import coarse_group_apply, right_size, segment_starts

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "proposer": pd.Series(dtype=np.int64),
                "acceptor": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.int64),
                "rnk": pd.Series(dtype=np.int64),
            }
        )
        if df.empty or proposer_column not in df.columns:
            return empty
        p = df[proposer_column].to_numpy(dtype=np.int64)
        a = df[acceptor_column].to_numpy(dtype=np.int64)
        s = df[score_column].to_numpy(dtype=np.int64)
        # min score per (proposer, acceptor): sort puts it first
        o = np.lexsort((s, a, p))
        p, a, s = p[o], a[o], s[o]
        first = np.concatenate(
            ([True], (p[1:] != p[:-1]) | (a[1:] != a[:-1]))
        )
        p, a, s = p[first], a[first], s[first]
        # preference rank within proposer by (score, acceptor)
        o = np.lexsort((a, s, p))
        p, a, s = p[o], a[o], s[o]
        starts = segment_starts(p)
        seg = np.cumsum(
            np.concatenate(([True], p[1:] != p[:-1]))
        ) - 1
        rnk = np.arange(len(p), dtype=np.int64) - starts[seg]
        return pd.DataFrame(
            {"proposer": p, "acceptor": a, "score": s, "rnk": rnk}
        )

    slim = edges_ds.select_columns(
        [proposer_column, acceptor_column, score_column]
    )
    ranked = right_size(
        coarse_group_apply(
            slim, proposer_column, rank_partition, n_parts=n_parts
        ).materialize()
    )

    # node-bounded driver state
    props = np.zeros(0, dtype=np.int64)  # sorted proposer universe
    ptr = np.zeros(0, dtype=np.int64)
    matched = np.zeros(0, dtype=bool)
    held_a = np.zeros(0, dtype=np.int64)
    held_p = np.zeros(0, dtype=np.int64)
    held_s = np.zeros(0, dtype=np.int64)

    for _ in range(rounds):
        state_ref = ray.put((props, ptr, matched))

        def propose(batch: pa.Table, _ref=state_ref) -> pa.Table:
            empty = pa.schema(
                [
                    ("proposer", pa.int64()),
                    ("acceptor", pa.int64()),
                    ("score", pa.int64()),
                ]
            ).empty_table()
            if batch.num_rows == 0 or "proposer" not in batch.column_names:
                return empty
            pr, pt, mt = ray.get(_ref)
            p = batch.column("proposer").to_numpy(zero_copy_only=False)
            rnk = batch.column("rnk").to_numpy(zero_copy_only=False)
            if len(pr):
                pos = np.minimum(np.searchsorted(pr, p), len(pr) - 1)
                known = pr[pos] == p
                ptr_p = np.where(known, pt[pos], 0)
                free = np.where(known, ~mt[pos], True)
            else:  # first round: everyone is free at rank 0
                ptr_p = np.zeros(len(p), dtype=np.int64)
                free = np.ones(len(p), dtype=bool)
            keep = (rnk == ptr_p) & free
            if not keep.any():
                return empty
            return batch.select(["proposer", "acceptor", "score"]).filter(
                pa.array(keep)
            )

        tables = list(
            arrow_blocks(ranked.map_batches(propose, batch_format="pyarrow"))
        )
        tables = [
            t for t in tables if t.num_rows and "proposer" in t.column_names
        ]
        if not tables:
            break
        prop = pa.concat_tables(tables)
        pp = prop.column("proposer").to_numpy(zero_copy_only=False)
        aa = prop.column("acceptor").to_numpy(zero_copy_only=False)
        ss = prop.column("score").to_numpy(zero_copy_only=False)

        # grow the proposer universe (first round) and advance pointers of
        # everyone who consumed an option this round
        new = pp[~np.isin(pp, props)] if len(props) else pp
        if len(new):
            props = np.concatenate((props, np.unique(new)))
            order = np.argsort(props, kind="mergesort")
            props, ptr, matched = (
                props[order],
                np.concatenate((ptr, np.zeros(len(np.unique(new)), np.int64)))[
                    order
                ],
                np.concatenate(
                    (matched, np.zeros(len(np.unique(new)), bool))
                )[order],
            )
        ptr[np.searchsorted(props, np.unique(pp))] += 1

        # deferred acceptance: held offers compete with this round's
        cat_a = np.concatenate((held_a, aa))
        cat_p = np.concatenate((held_p, pp))
        cat_s = np.concatenate((held_s, ss))
        o = np.lexsort((cat_p, cat_s, cat_a))
        cat_a, cat_p, cat_s = cat_a[o], cat_p[o], cat_s[o]
        firsts = np.concatenate(([True], cat_a[1:] != cat_a[:-1]))
        held_a, held_p, held_s = cat_a[firsts], cat_p[firsts], cat_s[firsts]
        matched = np.isin(props, held_p)

    return pa.table(
        {
            "proposer": pa.array(held_p),
            "acceptor": pa.array(held_a),
            "score": pa.array(held_s),
        }
    ).cast(_STABLE_EMPTY)
