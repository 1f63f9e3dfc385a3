"""Pair-graph hygiene operators for ER clustering.

Between pair generation and connected components, production ER pipelines
reshape the match graph: EXPAND it where blocking missed pairs that
transitivity suggests (2-hop candidates), and SPARSIFY it so one hub
record cannot glue unrelated clusters into a mega-component (the
classic CC failure mode at corpus scale). Both operate on slim (u, v)
edge lists and never touch record payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _symmetrize(pairs_ds, weight_column: str | None = None, weight_scale: int | None = None):
    def fn(batch: pa.Table) -> pa.Table:
        from opentapioca_ray.stages.matching import to_fixed_point

        cols = [("a", pa.int64()), ("b", pa.int64())]
        if weight_column:
            cols.append(("w", pa.int64()))
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema(cols).empty_table()
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "a": pa.array(np.concatenate((u, v))),
            "b": pa.array(np.concatenate((v, u))),
        }
        if weight_column:
            w = to_fixed_point(
                batch.column(weight_column).to_numpy(zero_copy_only=False),
                weight_scale,
                weight_column,
            )
            out["w"] = pa.array(np.concatenate((w, w)))
        return pa.table(out)

    return pairs_ds.map_batches(fn, batch_format="pyarrow")


def two_hop_pairs(pairs_ds, max_degree: int = 1024, n_parts: int | None = None):
    """Candidate expansion: node pairs joined through >= 1 common neighbor
    but NOT already edges — (u, v, n_mids) with the common-neighbor count.
    The transitive candidates a second matching round scores when blocking
    recall is suspect.

    ONE exchange on the middle node pairs each partition's neighbor lists
    vectorized; a second slim (u, v) merge both counts middles AND
    anti-joins the original edges (edges ride in with a -BIG tag, so any
    group containing one nets negative and drops — no separate join).
    Nodes above `max_degree` are skipped as middles (a hub's neighbor
    pairs are quadratic; the skip is the same documented skew guard as
    everywhere else)."""
    from opentapioca_ray.stages.exchange import coarse_group_apply, coarse_groupby_agg
    from opentapioca_ray.stages.triangles import _segment_pairs

    sym = _symmetrize(pairs_ds)

    def neighbor_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "u": pd.Series(dtype=np.int64),
                "v": pd.Series(dtype=np.int64),
                "tag": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        mids = df["a"].to_numpy(dtype=np.int64)
        nbrs = df["b"].to_numpy(dtype=np.int64)
        order = np.lexsort((nbrs, mids))
        mids, nbrs = mids[order], nbrs[order]
        # drop duplicate (mid, nbr) and cap hub degrees
        first = np.concatenate(
            ([True], (mids[1:] != mids[:-1]) | (nbrs[1:] != nbrs[:-1]))
        )
        mids, nbrs = mids[first], nbrs[first]
        new = np.concatenate(([True], mids[1:] != mids[:-1]))
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        deg = np.bincount(seg)
        keep = deg[seg] <= max_degree
        mids, nbrs = mids[keep], nbrs[keep]
        li, ri = _segment_pairs(mids)
        if len(li) == 0:
            return empty
        return pd.DataFrame(
            {
                "u": nbrs[li],  # nbrs ascend within a mid segment: u < v
                "v": nbrs[ri],
                "tag": np.ones(len(li), dtype=np.int64),
            }
        )

    cands = coarse_group_apply(sym, "a", neighbor_pairs, n_parts=n_parts)

    def edges_tagged(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("tag", pa.int64())]
            ).empty_table()
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.minimum(u, v)),
                "v": pa.array(np.maximum(u, v)),
                "tag": pa.array(np.full(len(u), -(1 << 40), dtype=np.int64)),
            }
        )

    tagged = cands.union(pairs_ds.map_batches(edges_tagged, batch_format="pyarrow"))
    merged = coarse_groupby_agg(
        tagged, ["u", "v"], {"n_mids": ("tag", "sum")}, n_parts=n_parts
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_mids" not in batch.column_names:
            return pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("n_mids", pa.int64())]
            ).empty_table()
        n = batch.column("n_mids").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(n > 0))  # existing edges net negative
        import pyarrow.compute as pc

        return pa.table(
            {
                "u": pc.cast(t.column("u"), pa.int64()),
                "v": pc.cast(t.column("v"), pa.int64()),
                "n_mids": pc.cast(t.column("n_mids"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def sparsify_edges(
    pairs_ds,
    weight_column: str,
    k: int = 2,
    ascending: bool = True,
    n_parts: int | None = None,
    weight_scale: int | None = None,
):
    """Degree-capped sparsification: each node nominates its `k`
    best-weighted incident edges (ties by partner id); an edge survives if
    EITHER endpoint nominated it. Bounds every node's degree at 2k-ish
    before connected components, killing hub-glued mega-clusters while
    keeping each record's strongest matches (mutual-kNN graph
    construction, standard before clustering).

    ONE exchange on the node ranks all its incident edges vectorized; one
    slim (u, v) merge dedups dual nominations. Weights compare as int64:
    float weight columns must pass `weight_scale` (fixed-point units; the
    output weight column is in those units)."""
    from opentapioca_ray.stages.exchange import coarse_group_apply, coarse_groupby_agg

    sym = _symmetrize(pairs_ds, weight_column, weight_scale)

    def nominate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "u": pd.Series(dtype=np.int64),
                "v": pd.Series(dtype=np.int64),
                "w": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        w = df["w"].to_numpy(dtype=np.int64)
        wkey = w if ascending else -w
        order = np.lexsort((b, wkey, a))
        a, b, w = a[order], b[order], w[order]
        new = np.concatenate(([True], a[1:] != a[:-1]))
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        pos = np.arange(len(a), dtype=np.int64) - starts[seg]
        keep = pos < k
        a, b, w = a[keep], b[keep], w[keep]
        return pd.DataFrame(
            {"u": np.minimum(a, b), "v": np.maximum(a, b), "w": w}
        )

    nominated = coarse_group_apply(sym, "a", nominate, n_parts=n_parts)
    merged = coarse_groupby_agg(
        nominated, ["u", "v"], {weight_column: ("w", "max")}, n_parts=n_parts
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema(
                [
                    ("u", pa.int64()),
                    ("v", pa.int64()),
                    (weight_column, pa.int64()),
                ]
            ).empty_table()
        import pyarrow.compute as pc

        return pa.table(
            {
                "u": pc.cast(batch.column("u"), pa.int64()),
                "v": pc.cast(batch.column("v"), pa.int64()),
                weight_column: pc.cast(batch.column(weight_column), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def _peel_kernel(u: np.ndarray, v: np.ndarray, k: int, rounds: int):
    """In-memory fixed-round k-core peel: drop edges with an endpoint of
    degree < k, up to `rounds` times (a fixpoint makes further rounds
    identity, so early exit never changes the result)."""
    for _ in range(rounds):
        if len(u) == 0:
            break
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        deg = np.bincount(inv)
        iu, iv = inv[: len(u)], inv[len(u):]
        keep = (deg[iu] >= k) & (deg[iv] >= k)
        if keep.all():
            break
        u, v = u[keep], v[keep]
    return u, v


def kcore_degrees(
    edges,
    k: int = 2,
    rounds: int = 12,
    local_threshold: int = 2_000_000,
    n_parts=None,
):
    """Fixed-round k-core peel (Seidman 1983 coreness, bounded-round form
    mirroring the repo's 16-iteration PageRank contract): repeatedly drop
    edges touching a node of degree < k, `rounds` times. Because a
    fixpoint is stable, the output is well-defined whether or not the
    peel converged, and the SQL twin unrolls the identical rounds.

    Input: (u, v) edge rows (distinct). Output: (node, degree) of the
    surviving subgraph. Distributed shape per round: ONE combiner degree
    roll-up + TWO coarse semi-joins (edges keyed by u, then v) — all
    integer, nothing driver-side. Small graphs (< `local_threshold`
    edges, e.g. after an upstream multiplicity filter) collapse to a
    single-partition numpy kernel, the same escape hatch cc.py uses;
    `local_threshold=0` forces the distributed path (tests do)."""
    from opentapioca_ray.stages.exchange import (
        coarse_groupby_agg,
        coarse_semi_join,
        right_size,
    )

    deg_schema = pa.schema([("node", pa.int64()), ("degree", pa.int64())])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        u = batch.column("u").cast(pa.int64()).combine_chunks()
        v = batch.column("v").cast(pa.int64()).combine_chunks()
        return pa.table({"node": pa.concat_arrays([u, v])})

    def final_degrees(ds):
        return coarse_groupby_agg(
            ds.map_batches(explode, batch_format="pyarrow"),
            ["node"],
            {"degree": ("node", "size")},
            n_parts=n_parts,
        ).map_batches(
            lambda b: (
                pa.table(
                    {
                        "node": b.column("node").cast(pa.int64()),
                        "degree": b.column("degree").cast(pa.int64()),
                    }
                )
                if b.num_rows and "node" in b.column_names
                else deg_schema.empty_table()
            ),
            batch_format="pyarrow",
        )

    edges = edges.materialize()
    if edges.count() <= local_threshold:
        def local(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "u" not in t.column_names:
                return deg_schema.empty_table()
            u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            u, v = _peel_kernel(u, v, k, rounds)
            nodes, inv = (
                np.unique(np.concatenate([u, v]), return_inverse=True)
                if len(u)
                else (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
            )
            return pa.table(
                {
                    "node": pa.array(nodes.astype(np.int64)),
                    "degree": pa.array(np.bincount(inv).astype(np.int64))
                    if len(u)
                    else pa.array([], pa.int64()),
                }
            )

        return edges.repartition(1).map_batches(
            local, batch_format="pyarrow", batch_size=None
        )

    for _ in range(rounds):
        core = coarse_groupby_agg(
            edges.map_batches(explode, batch_format="pyarrow"),
            ["node"],
            {"c": ("node", "size")},
            n_parts=n_parts,
        ).map_batches(
            lambda b: (
                b.filter(pa.compute.greater_equal(b.column("c"), k)).select(
                    ["node"]
                )
                if b.num_rows and "node" in b.column_names
                else pa.schema([("node", pa.int64())]).empty_table()
            ),
            batch_format="pyarrow",
        ).materialize()
        # Re-block both sides each round: union+groupby preserves input
        # block counts, so without this the 2-semi-join round TRIPLES the
        # block count every iteration (4 -> 3^rounds blocks — observed as
        # a 26GB driver-memory sort on a 400-edge test graph).
        core = right_size(core)
        edges = coarse_semi_join(
            edges, "u", core, _EDGE_SCHEMA, keys_column="node", n_parts=n_parts
        )
        edges = right_size(
            coarse_semi_join(
                edges, "v", core, _EDGE_SCHEMA, keys_column="node", n_parts=n_parts
            ).materialize()
        )
    return final_degrees(edges)
