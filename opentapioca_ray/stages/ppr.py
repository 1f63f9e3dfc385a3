"""Personalized PageRank (random walk with restart; Jeh & Widom WWW'03)
with EXACT integer arithmetic: scores are e12 mass units, per-edge
contribution is rank(u) // deg(u) (floor), damping is (x * 85) // 100,
and ALL lost mass (the 15%, dangling and flooring dust) teleports back to
the seed set — a pure integer function of the edge set, replayed by
unrolled SQL CTEs with no float-accumulation-order risk (the repo's
iterative-oracle recipe, cf. HITS e9 scores).

ER use: seed-set expansion — rank the graph neighborhood of a handful of
known entities to harvest match candidates (locality means untouched
nodes stay at exactly 0 and never materialize).

Scale shape: ONE coarse exchange attaches out-degrees (edges co-located
by src); each iteration is one streaming pass over the adjacency against
the broadcast (node, rank) state + an O(touched nodes) driver merge —
the node-bounded driver-state convention (HITS/WL/MIS). Touched-node
count is bounded by the R-hop ball of the seeds, typically << |V|."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from opentapioca_ray.stages.exchange import arrow_blocks

_PPR_SCHEMA = pa.schema([("node", pa.int64()), ("ppr", pa.int64())])

TOTAL_MASS = 1_000_000_000_000  # e12


def ppr_scores(edges_ds, seeds: list[int], iterations: int = 8,
               n_parts: int | None = None):
    """`iterations` integer-exact PPR rounds over a DISTINCT
    both-direction (src, dst) edge table with uniform out-weights.
    Returns a pyarrow Table (node, ppr) for nodes with nonzero mass."""
    import ray

    from .exchange import coarse_group_apply, default_n_parts

    n_edges = edges_ds.count()
    if n_parts is None:
        n_parts = max(4, min(default_n_parts(), n_edges // 8192 + 1))

    def attach_deg(df):
        import pandas as pd

        if df.empty or "src" not in df.columns:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("src", "dst", "deg")}
            )
        src = df["src"].to_numpy(dtype=np.int64)
        dst = df["dst"].to_numpy(dtype=np.int64)
        order = np.argsort(src, kind="mergesort")
        src, dst = src[order], dst[order]
        new = np.concatenate(([True], src[1:] != src[:-1]))
        seg = np.cumsum(new) - 1
        counts = np.bincount(seg)
        return pd.DataFrame({"src": src, "dst": dst, "deg": counts[seg]})

    adj = coarse_group_apply(
        edges_ds, "src", attach_deg, n_parts=n_parts, batch_format="pandas"
    ).materialize()

    seeds_arr = np.array(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    share = TOTAL_MASS // len(seeds_arr)
    nodes = seeds_arr.copy()
    rank = np.full(len(seeds_arr), share, dtype=np.int64)

    for _ in range(iterations):
        state_ref = ray.put((nodes, rank))

        def contrib(batch: pa.Table, _ref=state_ref) -> pa.Table:
            schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return schema.empty_table()
            nd, rk = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            deg = batch.column("deg").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(nd, src), len(nd) - 1)
            r = np.where(nd[pos] == src, rk[pos], 0)
            live = r > 0
            if not live.any():
                return schema.empty_table()
            per_edge = r[live] // deg[live]
            d = dst[live]
            order = np.argsort(d, kind="mergesort")
            d, per_edge = d[order], per_edge[order]
            starts = np.flatnonzero(
                np.concatenate(([True], d[1:] != d[:-1]))
            )
            sums = np.add.reduceat(per_edge, starts)
            return pa.table(
                {
                    "node": pa.array(d[starts].astype(np.int64)),
                    "c": pa.array(sums.astype(np.int64)),
                }
            )

        tabs = list(
            arrow_blocks(adj.map_batches(contrib, batch_format="pyarrow"))
        )
        tabs = [t for t in tabs if t.num_rows and "node" in t.column_names]
        if tabs:
            t = pa.concat_tables(tabs)
            n = t.column("node").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            order = np.argsort(n, kind="mergesort")
            n, c = n[order], c[order]
            starts = np.flatnonzero(np.concatenate(([True], n[1:] != n[:-1])))
            nodes = n[starts].astype(np.int64)
            damped = (np.add.reduceat(c, starts) * 85) // 100
        else:
            nodes = np.zeros(0, dtype=np.int64)
            damped = np.zeros(0, dtype=np.int64)
        lost = TOTAL_MASS - int(damped.sum())
        # teleport ALL lost mass to the seeds (uniform, floor dust dropped)
        add = lost // len(seeds_arr)
        merged_nodes = np.union1d(nodes, seeds_arr)
        rank = np.zeros(len(merged_nodes), dtype=np.int64)
        if len(nodes):
            rank[np.searchsorted(merged_nodes, nodes)] += damped
        rank[np.searchsorted(merged_nodes, seeds_arr)] += add
        nodes = merged_nodes
        keep = rank > 0
        nodes, rank = nodes[keep], rank[keep]

    return pa.table(
        {"node": pa.array(nodes), "ppr": pa.array(rank)}
    ).cast(_PPR_SCHEMA)
