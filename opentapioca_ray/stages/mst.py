"""Distributed minimum spanning forest via Borůvka rounds.

The clustering backbone operator (single-link dendrograms, network
design): each round every component selects its minimum outgoing edge,
all selected edges join the forest, and touched components merge —
O(log V) rounds regardless of size (Borůvka 1926; the standard
distributed MST recipe).

Determinism: edge weights are made DISTINCT by lexicographic tie-break
(w, u, v) packed into one int64 (w * 2^42 + u * 2^21 + v, requiring
ids < 2^21 and w < 2^21 — asserted), so the MST is unique and the
DuckDB oracle can verify it by the cut property: an edge belongs to the
unique MST iff its endpoints are NOT connected using strictly lighter
edges alone (one recursive CTE over (edge, reached-node) pairs).

Scale shape per round: component labels attach to both edge endpoints
through two lookup exchanges (same tagged-union shape as LPA/HITS), the
per-component minimum packs into ONE keyed min-aggregation, and the
component-merge graph — at most one edge per component — contracts
DRIVER-SIDE with a tiny union-find over O(#components) pairs, which
shrinks geometrically. Edges themselves never leave the cluster."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_B21 = np.int64(1 << 21)

_EDGE_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())]
)


def _pack(w, u, v):
    return (w * _B21 + u) * _B21 + v


def minimum_spanning_forest(
    edges_ds,
    u_column: str = "u",
    v_column: str = "v",
    w_column: str = "w",
    max_rounds: int = 12,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Borůvka MSF over undirected weighted edges (int64 weights,
    ids and weights < 2^21). Returns the forest edges (u, v, w)."""
    import ray

    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
        default_n_parts,
        right_size,
    )

    def slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or u_column not in batch.column_names:
            return _EDGE_SCHEMA.empty_table()
        u = batch.column(u_column).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(v_column).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column(w_column).to_numpy(zero_copy_only=False).astype(np.int64)
        assert (u < _B21).all() and (v < _B21).all() and (w < _B21).all()
        return pa.table({"u": pa.array(u), "v": pa.array(v), "w": pa.array(w)})

    edges = right_size(
        edges_ds.map_batches(slim, batch_format="pyarrow").materialize()
    )
    if n_parts is None:
        n_parts = max(4, min(default_n_parts(), edges.count() // 8192 + 1))

    # comp: node -> component label, driver-resident dict of O(V) ints?
    # NO — labels stay distributed; only the per-round merge graph
    # (<= #components edges) reaches the driver. Labels are broadcast as
    # a sorted-array lookup per round (bounded by the node table).
    def init_nodes(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("u").combine_chunks(),
                        batch.column("v").combine_chunks(),
                    ]
                )
            }
        )

    nodes = (
        coarse_groupby_agg(
            edges.map_batches(init_nodes, batch_format="pyarrow"),
            ["node"],
            {"__n": ("node", "size")},
            n_parts=n_parts,
        )
        .drop_columns(["__n"])
        .to_pandas()["node"]
        .to_numpy(np.int64)
    )
    nodes = np.sort(nodes)
    comp = nodes.copy()  # component label per node (sorted-array lookup)

    forest: list[tuple] = []
    for _ in range(max_rounds):
        lab_ref = ray.put((nodes, comp))

        def min_out(batch: pa.Table) -> pa.Table:
            """per-batch partial: for each component, the packed minimum
            outgoing edge (both directions considered)."""
            schema = pa.schema([("c", pa.int64()), ("pk", pa.int64())])
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return schema.empty_table()
            nds, cmp_ = ray.get(lab_ref)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            cu = cmp_[np.searchsorted(nds, u)]
            cv = cmp_[np.searchsorted(nds, v)]
            keep = cu != cv
            if not keep.any():
                return schema.empty_table()
            u, v, w, cu, cv = u[keep], v[keep], w[keep], cu[keep], cv[keep]
            pk = _pack(w, u, v)
            c = np.concatenate([cu, cv])
            pk2 = np.concatenate([pk, pk])
            df = pd.DataFrame({"c": c, "pk": pk2})
            return pa.Table.from_pandas(
                df.groupby("c", sort=False)["pk"].min().reset_index(),
                preserve_index=False,
            ).cast(schema)

        sel = coarse_groupby_agg(
            edges.map_batches(min_out, batch_format="pyarrow"),
            ["c"],
            {"pk": ("pk", "min")},
            n_parts=n_parts,
        ).to_pandas()  # <= one row per component
        if sel.empty:
            break
        pk = np.unique(sel["pk"].to_numpy(np.int64))
        v_sel = (pk % _B21).astype(np.int64)
        u_sel = ((pk // _B21) % _B21).astype(np.int64)
        w_sel = (pk // (_B21 * _B21)).astype(np.int64)
        forest.extend(zip(u_sel.tolist(), v_sel.tolist(), w_sel.tolist()))
        # contract: tiny union-find over (comp(u), comp(v)) pairs
        cu = comp[np.searchsorted(nodes, u_sel)]
        cv = comp[np.searchsorted(nodes, v_sel)]
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(cu.tolist(), cv.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-label union keeps labels deterministic
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        # relabel: python work bounded by #components (shrinks 2x+/round),
        # the per-node map is one C-level pandas lookup
        uniq = np.unique(comp)
        root_map = {int(c): find(int(c)) for c in uniq}
        roots = pd.Series(comp).map(root_map).to_numpy(np.int64)
        if (roots == comp).all():
            break
        comp = roots
    out = pd.DataFrame(sorted(forest), columns=["u", "v", "w"])
    return out.astype(np.int64)
