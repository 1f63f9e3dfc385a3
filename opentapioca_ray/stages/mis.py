"""Maximal independent set via Luby's algorithm (Luby 1986): each round,
an alive node joins the MIS iff its priority beats every alive neighbor's;
MIS members and their neighbors leave the pool. The classic parallel
symmetry-breaker — in ER pipelines it schedules CONFLICT-FREE merge waves
(no two adjacent cluster-merge operations in the same wave) and picks
canonical representatives in dense match graphs.

Determinism/SQL parity: priority(v) = md5_u64(str(v)) — both sides derive
the identical uint64, so the strict `<` comparison (ties -> neither joins,
resolved in a later round) replays exactly; rounds are fixed so the DuckDB
twin unrolls them.

Scale shape: ONE coarse exchange co-locates each node's neighbor rows
(edge-count-sized partitions, not re-blocked — the WL lesson); each round
is two streaming passes over the adjacency (min alive-neighbor priority,
then MIS-neighbor marking) against broadcast node state, plus O(nodes)
driver merges — the node-bounded driver-state convention (HITS/k-means/
WL)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from opentapioca_ray.stages.exchange import arrow_blocks

_MIS_SCHEMA = pa.schema([("node", pa.int64()), ("mis_round", pa.int64())])

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def luby_mis(edges_ds, rounds: int = 6, n_parts: int | None = None):
    """`rounds` Luby rounds over a DISTINCT both-direction (src, dst)
    edge table. Returns a pyarrow Table (node, mis_round) of the MIS
    members found (nodes still alive after `rounds` are unreported;
    the fixed count keeps the SQL twin exact)."""
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

    # node universe from one adjacency pass (node-bounded)
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
    nodes = np.unique(
        np.concatenate(
            [
                t.column("node").to_numpy(zero_copy_only=False)
                for t in parts
                if t.num_rows and "node" in t.column_names
            ]
        )
    ).astype(np.int64)
    pri = _md5_u64(nodes)
    alive = np.ones(len(nodes), dtype=bool)

    out_nodes: list[np.ndarray] = []
    out_rounds: list[np.ndarray] = []
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
        mis = alive & (pri < mh)
        if not mis.any():
            break
        out_nodes.append(nodes[mis])
        out_rounds.append(np.full(int(mis.sum()), rnd, dtype=np.int64))

        mis_ref = ray.put(nodes[mis])

        def mis_nbrs(batch: pa.Table, _ref=mis_ref) -> pa.Table:
            schema = pa.schema([("node", pa.int64())])
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return schema.empty_table()
            m = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            hit = np.isin(dst, m)
            return pa.table(
                {"node": pa.array(np.unique(src[hit]).astype(np.int64))}
            )

        tabs = list(
            arrow_blocks(adj.map_batches(mis_nbrs, batch_format="pyarrow"))
        )
        removed = [nodes[mis]]
        for t in tabs:
            if t.num_rows and "node" in t.column_names:
                removed.append(t.column("node").to_numpy(zero_copy_only=False))
        alive &= ~np.isin(nodes, np.unique(np.concatenate(removed)))

    if not out_nodes:
        return _MIS_SCHEMA.empty_table()
    return pa.table(
        {
            "node": pa.array(np.concatenate(out_nodes)),
            "mis_round": pa.array(np.concatenate(out_rounds)),
        }
    ).cast(_MIS_SCHEMA)
