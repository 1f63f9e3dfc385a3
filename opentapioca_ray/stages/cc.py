"""Connected components over a match-edge Dataset.

Large-star / small-star alternation (Kiveris et al., "Connected Components
in MapReduce and Beyond") expressed as Ray Data groupby-aggregate shuffles —
the clustering step mandated by the north rule (BASELINE.json): converges in
O(log n) rounds, each round is one `groupby(node).map_groups` exchange; the
driver loop stops when the edge multiset hash stabilizes. A union-find
`connected_components_local` provides the oracle for tests.

Edges are undirected (u, v) int64 pairs; output is (node, component) where
component = min node id of the cluster (singletons excluded — callers union
them back in if needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _large_star_group(df: pd.DataFrame) -> pd.DataFrame:
    u = int(df["u"].iloc[0])
    neigh = df["v"].to_numpy()
    m = min(u, int(neigh.min()))
    bigger = neigh[neigh > u]
    if len(bigger) == 0:
        return pd.DataFrame({"u": [], "v": []}, dtype=np.int64)
    return pd.DataFrame({"u": bigger.astype(np.int64), "v": np.int64(m)})


def _small_star_group(df: pd.DataFrame) -> pd.DataFrame:
    # group key u; neighbors all have v <= u
    u = int(df["u"].iloc[0])
    neigh = np.unique(df["v"].to_numpy())
    m = min(u, int(neigh.min()))
    nodes = np.union1d(neigh, [u])
    nodes = nodes[nodes != m]
    if len(nodes) == 0:
        return pd.DataFrame({"u": [], "v": []}, dtype=np.int64)
    return pd.DataFrame({"u": nodes.astype(np.int64), "v": np.int64(m)})


def _both_directions(batch: pa.Table) -> pa.Table:
    fwd = pa.table({"u": batch.column("u"), "v": batch.column("v")})
    rev = pa.table({"u": batch.column("v"), "v": batch.column("u")})
    return pa.concat_tables([fwd, rev])


def _high_low(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    u = batch.column("u")
    v = batch.column("v")
    hi = pc.max_element_wise(u, v)
    lo = pc.min_element_wise(u, v)
    return pa.table({"u": hi, "v": lo})


def _as_arrow(block) -> pa.Table:
    """`to_arrow_refs` hands back pandas blocks unconverted when the lineage
    ends in a pandas-format op (Ray 2.49) — normalize defensively."""
    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    return block


def _edge_digest(ds) -> tuple[int, int]:
    """Cheap convergence check: (row count, sum of u*31+v mod 2^61)."""
    import pyarrow.compute as pc

    count = 0
    acc = 0
    for ref in ds.to_arrow_refs():
        import ray

        t = _as_arrow(ray.get(ref))
        count += t.num_rows
        if t.num_rows:
            u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            acc = (acc + int((u * 31 + v).sum())) % ((1 << 61) - 1)
    return count, acc


def connected_components(edges_ds, max_rounds: int = 30, local_threshold: int = 200_000):
    """edges Dataset (u, v) -> assignments Dataset (node, component).

    Scale-adaptive: when the (deduplicated) edge set fits comfortably on one
    node (< `local_threshold` edges) the transitive closure runs as a single
    union-find task — match edges are a tiny fraction of input rows, so this
    is the common case even for huge corpora. Above the threshold it runs
    the large-star/small-star shuffle rounds (O(log n) groupby exchanges);
    each round: large-star (groupby over both directions) then small-star
    (groupby over high->low edges); stop when the edge digest is stable.
    Pass `local_threshold=0` to force the distributed path (tests do).
    """
    import ray

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= local_threshold:
        import ray.data

        pairs: list[tuple[int, int]] = []
        for ref in edges_ds.to_arrow_refs():
            t = _as_arrow(ray.get(ref))
            if t.num_rows == 0 or "u" not in t.column_names:
                continue
            pairs.extend(
                zip(t.column("u").to_pylist(), t.column("v").to_pylist())
            )
        comp = connected_components_local(pairs)
        items = [{"node": int(n), "component": int(c)} for n, c in sorted(comp.items())]
        if not items:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
            )
        return ray.data.from_items(items)

    # every input node must appear in the output even if its edges are
    # self-loops (dropped by the star rounds) — union self-assignments in
    # before the final min-aggregate
    def _self_assign(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_tables(
            [
                pa.table({"node": batch.column("u").cast(pa.int64())}),
                pa.table({"node": batch.column("v").cast(pa.int64())}),
            ]
        ).column("node")
        return pa.table({"node": nodes, "component": nodes})

    self_assign = edges_ds.map_batches(_self_assign, batch_format="pyarrow")

    ds = edges_ds.map_batches(_high_low, batch_format="pyarrow")
    prev_digest = None
    for _ in range(max_rounds):
        # large-star
        ds = (
            ds.map_batches(_both_directions, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        # small-star over (max -> min) orientation
        ds = (
            ds.map_batches(_high_low, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pandas")
        )
        ds = ds.materialize()
        digest = _edge_digest(ds)
        if digest == prev_digest:
            break
        prev_digest = digest
    # converged: every edge is (node -> root)
    out = ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("u"), "component": b.column("v")}
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min

    return (
        out.union(self_assign)
        .groupby("node")
        .aggregate(Min("component", alias_name="component"))
    )


def connected_components_local(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle for tests."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {node: find(node) for node in parent}
