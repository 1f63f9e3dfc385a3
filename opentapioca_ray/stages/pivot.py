"""Correlation clustering via parallel CC-Pivot (Ailon, Charikar & Newman
2008; parallel rounds per Chierichetti, Dalvi & Kumar, KDD 2014): each
round the active local priority minima become pivots (exactly one Luby
MIS round — see stages/mis.py), every active non-pivot node adjacent to a
pivot joins its smallest-priority pivot neighbor, and both retire. Unlike
connected components (stages/cc.py), which merges everything reachable,
pivot clustering respects NON-edges — the ER cluster-repair step that
splits over-merged near-duplicate groups left by a noisy match graph
(reference analogue: the greedy mention-group resolution in opentapioca's
classifier.py:260-339, which also commits the locally best mention first).

Determinism/SQL parity: priority(v) = md5_u64(str(v)) on both sides;
pivot test is strict `<` (ties retire in a later round); assignment picks
the (priority, node)-lexicographic minimum pivot neighbor; rounds are
fixed so the DuckDB twin unrolls them; nodes still active after `rounds`
become singletons on both sides.

Scale shape: ONE coarse exchange co-locates each node's neighbor rows;
each round is two streaming passes over the adjacency (min alive-neighbor
priority, then pivot-neighbor argmin) against broadcast node state, plus
O(nodes) driver merges — the node-bounded driver-state convention
(HITS/k-means/WL/MIS)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from opentapioca_ray.stages.exchange import arrow_blocks

_PIVOT_SCHEMA = pa.schema(
    [("node", pa.int64()), ("cluster", pa.int64()), ("pivot_round", pa.int64())]
)

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def pivot_clusters(edges_ds, rounds: int = 4, n_parts: int | None = None):
    """`rounds` parallel pivot rounds over a DISTINCT both-direction
    (src, dst) edge table. Returns a pyarrow Table
    (node, cluster, pivot_round): cluster = the pivot's node id (pivots
    cluster to themselves); survivors of all `rounds` are singletons with
    pivot_round = `rounds`."""
    import ray

    from .exchange import coarse_group_apply, default_n_parts
    from .sketches import _md5_u64

    n_edges = edges_ds.count()
    if n_parts is None:
        n_parts = max(4, min(default_n_parts(), n_edges // 8192 + 1))

    adj = coarse_group_apply(
        edges_ds, "src", lambda df: df, n_parts=n_parts,
        batch_format="pandas",
    ).materialize()

    def nodes_of(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.table(
            {
                "node": pa.array(
                    np.unique(
                        batch.column("src").to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                )
            }
        )

    parts = list(
        arrow_blocks(adj.map_batches(nodes_of, batch_format="pyarrow"))
    )
    tabs = [t for t in parts if t.num_rows and "node" in t.column_names]
    if not tabs:
        return _PIVOT_SCHEMA.empty_table()
    nodes = np.unique(
        np.concatenate(
            [t.column("node").to_numpy(zero_copy_only=False) for t in tabs]
        )
    ).astype(np.int64)
    pri = _md5_u64(nodes)
    alive = np.ones(len(nodes), dtype=bool)
    cluster = np.full(len(nodes), -1, dtype=np.int64)
    out_round = np.full(len(nodes), np.int64(rounds), dtype=np.int64)

    for rnd in range(rounds):
        if not alive.any():
            break
        state_ref = ray.put((nodes, pri, alive))

        def min_nbr(batch: pa.Table, _ref=state_ref) -> pa.Table:
            schema = pa.schema([("node", pa.int64()), ("mh", pa.uint64())])
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return schema.empty_table()
            nd, pr, al = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(nd, src)
            dp = np.searchsorted(nd, dst)
            keep = al[sp] & al[dp]
            if not keep.any():
                return schema.empty_table()
            src, dh = src[keep], pr[dp[keep]]
            order = np.lexsort((dh, src))
            src, dh = src[order], dh[order]
            starts = np.flatnonzero(
                np.concatenate(([True], src[1:] != src[:-1]))
            )
            return pa.table(
                {
                    "node": pa.array(src[starts].astype(np.int64)),
                    "mh": pa.array(dh[starts], type=pa.uint64()),
                }
            )

        tabs = list(
            arrow_blocks(adj.map_batches(min_nbr, batch_format="pyarrow"))
        )
        tabs = [t for t in tabs if t.num_rows and "node" in t.column_names]
        mh = np.full(len(nodes), _U64_MAX, dtype=np.uint64)
        if tabs:
            t = pa.concat_tables(tabs)
            p = np.searchsorted(
                nodes, t.column("node").to_numpy(zero_copy_only=False)
            )
            np.minimum.at(
                mh, p, t.column("mh").to_numpy(zero_copy_only=False)
            )
        piv = alive & (pri < mh)
        if not piv.any():
            break
        cluster[piv] = nodes[piv]
        out_round[piv] = rnd

        asg_ref = ray.put((nodes, pri, alive, piv))

        def pivot_nbr(batch: pa.Table, _ref=asg_ref) -> pa.Table:
            schema = pa.schema(
                [
                    ("node", pa.int64()),
                    ("h", pa.uint64()),
                    ("piv", pa.int64()),
                ]
            )
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return schema.empty_table()
            nd, pr, al, pv = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            sp = np.searchsorted(nd, src)
            dp = np.searchsorted(nd, dst)
            keep = al[sp] & ~pv[sp] & pv[dp]
            if not keep.any():
                return schema.empty_table()
            src, dstn = src[keep], dst[keep]
            dh = pr[dp[keep]]
            order = np.lexsort((dstn, dh, src))
            src, dh, dstn = src[order], dh[order], dstn[order]
            starts = np.flatnonzero(
                np.concatenate(([True], src[1:] != src[:-1]))
            )
            return pa.table(
                {
                    "node": pa.array(src[starts].astype(np.int64)),
                    "h": pa.array(dh[starts], type=pa.uint64()),
                    "piv": pa.array(dstn[starts].astype(np.int64)),
                }
            )

        tabs = list(
            arrow_blocks(adj.map_batches(pivot_nbr, batch_format="pyarrow"))
        )
        tabs = [t for t in tabs if t.num_rows and "node" in t.column_names]
        assigned = np.zeros(len(nodes), dtype=bool)
        if tabs:
            t = pa.concat_tables(tabs)
            an = t.column("node").to_numpy(zero_copy_only=False)
            ah = t.column("h").to_numpy(zero_copy_only=False)
            ap = t.column("piv").to_numpy(zero_copy_only=False)
            order = np.lexsort((ap, ah, an))
            an, ap = an[order], ap[order]
            starts = np.flatnonzero(
                np.concatenate(([True], an[1:] != an[:-1]))
            )
            p = np.searchsorted(nodes, an[starts])
            cluster[p] = ap[starts]
            out_round[p] = rnd
            assigned[p] = True
        alive &= ~(piv | assigned)

    # survivors of all rounds are deterministic singletons
    cluster[alive] = nodes[alive]
    return pa.table(
        {
            "node": pa.array(nodes),
            "cluster": pa.array(cluster),
            "pivot_round": pa.array(out_round),
        }
    ).cast(_PIVOT_SCHEMA)
