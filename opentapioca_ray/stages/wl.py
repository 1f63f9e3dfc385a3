"""Weisfeiler-Lehman label refinement (1-WL color refinement; Weisfeiler
& Lehman 1968, Shervashidze et al. JMLR 2011): each node's label becomes
the hash of (own label, sorted multiset of neighbor labels), iterated a
fixed number of rounds. The resulting colors are structural fingerprints —
nodes with the same final label have isomorphic R-hop neighborhoods, the
standard cheap signature for structure-aware dedup/blocking of graph-shaped
records and the feature map of the WL graph kernel.

Determinism/SQL parity: labels are uint64; round 0 = degree; round t+1 =
md5_u64(lab_t || ':' || join(sorted neighbor labs, ',')) — the exact string
DuckDB rebuilds with string_agg(... ORDER BY ...) and md5().

Scale shape: ONE coarse exchange co-locates each node's neighbor rows
(n_parts auto-sized to the edge count, and NOT re-blocked afterwards —
repartition would split a node's rows across blocks and break the
partition kernels' whole-node assumption); each round is one streaming
pass over the adjacency blocks with the label table broadcast, plus an
O(nodes) driver merge — the node-bounded driver-state convention shared
with HITS/k-means/LPA. Signature strings are built vectorized
(ListArray + binary_join); md5 runs once per distinct signature."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from opentapioca_ray.stages.exchange import arrow_blocks

_WL_SCHEMA = pa.schema([("node", pa.int64()), ("wl", pa.uint64())])


def _collect_node_u64(tables) -> tuple[np.ndarray, np.ndarray]:
    tabs = [t for t in tables if t.num_rows and "node" in t.column_names]
    if not tabs:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    t = pa.concat_tables(tabs)
    n = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    w = t.column("wl").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(n, kind="mergesort")
    return n[order], w[order]


def wl_labels(edges_ds, rounds: int = 3, n_parts: int | None = None):
    """`rounds` WL refinement rounds over a DISTINCT both-direction
    (src, dst) edge table. Returns a pyarrow Table (node, wl) of final
    uint64 colors."""
    import ray

    from .exchange import coarse_group_apply, default_n_parts

    n_edges = edges_ds.count()
    if n_parts is None:
        n_parts = max(4, min(default_n_parts(), n_edges // 8192 + 1))

    adj = coarse_group_apply(
        edges_ds, "src", lambda df: df, n_parts=n_parts,
        batch_format="pandas",
    ).materialize()

    def degree(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return _WL_SCHEMA.empty_table()
        src = batch.column("src").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {"node": pa.array(u.astype(np.int64)),
             "wl": pa.array(c.astype(np.uint64))}
        )

    nodes, labs = _collect_node_u64(
        arrow_blocks(adj.map_batches(degree, batch_format="pyarrow"))
    )

    for _ in range(rounds):
        state_ref = ray.put((nodes, labs))

        def refine(batch: pa.Table, _ref=state_ref) -> pa.Table:
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return _WL_SCHEMA.empty_table()
            from opentapioca_ray.stages.sketches import _md5_u64

            nd, lb = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            lab_nbr = lb[np.searchsorted(nd, dst)]
            order = np.lexsort((lab_nbr, src))
            src_s, lab_s = src[order], lab_nbr[order]
            starts = np.flatnonzero(
                np.concatenate(([True], src_s[1:] != src_s[:-1]))
            )
            offs = np.concatenate((starts, [len(src_s)])).astype(np.int64)
            lists = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(lab_s.astype(str), type=pa.string()),
            )
            own = lb[np.searchsorted(nd, src_s[starts])]
            sig = pc.binary_join_element_wise(
                pa.array(own.astype(str), type=pa.string()),
                pc.binary_join(lists, ","),
                ":",
            )
            new_lab = _md5_u64(sig.to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "node": pa.array(src_s[starts].astype(np.int64)),
                    "wl": pa.array(new_lab, type=pa.uint64()),
                }
            )

        nodes, labs = _collect_node_u64(
            arrow_blocks(adj.map_batches(refine, batch_format="pyarrow"))
        )

    return pa.table(
        {"node": pa.array(nodes), "wl": pa.array(labs, type=pa.uint64())}
    ).cast(_WL_SCHEMA)
