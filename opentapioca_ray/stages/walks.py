"""Deterministic random walks over a graph (node2vec-style sampling).

Graph-embedding pipelines (DeepWalk, node2vec — public algorithms) train
on walk corpora: sequences of nodes from short random walks. In a
distributed, resumable engine the walks must be REPRODUCIBLE, so the
"random" next-hop choice is derandomized the same way the repo's
sampling operators are: from node n at step t, walker w moves to the
neighbor m minimizing md5(f"{w}:{t}:{m}") — a fixed pseudo-random
priority per (walker, step, candidate), independent of execution order,
replayable in SQL with the shared md5-u64 convention.

Scale shape: positions are a (walker, node) dataset; every step is ONE
lookup-join exchange keyed on the current node (edge rows + position
rows tagged together; each node's whole adjacency lives in its
partition), where the kernel expands candidates with a vectorized merge,
hashes them batch-wise, and keeps the per-walker argmin. Cost per step
is one md5 per (walker, incident edge) — the price of reproducibility."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WALK_SCHEMA = pa.schema(
    [("walker", pa.int64()), ("step", pa.int64()), ("node", pa.int64())]
)

_POS_SCHEMA = pa.schema([("walker", pa.int64()), ("node", pa.int64())])


def random_walks(
    edges_ds,
    steps: int = 4,
    u_column: str = "u",
    v_column: str = "v",
    n_parts: int | None = None,
):
    """One `steps`-hop deterministic walk per distinct node of the
    undirected edge set. Returns a Dataset of (walker, step, node) rows,
    step 0 being the start node."""
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
        default_n_parts,
        right_size,
    )

    dir_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def both_dirs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or u_column not in batch.column_names:
            return dir_schema.empty_table()
        u = batch.column(u_column).cast(pa.int64()).combine_chunks()
        v = batch.column(v_column).cast(pa.int64()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([u, v]), "dst": pa.concat_arrays([v, u])}
        )

    directed = right_size(
        coarse_groupby_agg(
            edges_ds.map_batches(both_dirs, batch_format="pyarrow"),
            ["src", "dst"],
            {"__n": ("src", "size")},
            n_parts=n_parts,
        )
        .drop_columns(["__n"])
        .materialize()
    )
    if n_parts is None:
        n_parts = max(4, min(default_n_parts(), directed.count() // 8192 + 1))

    def tag_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pa.schema(
                [
                    ("src", pa.int64()),
                    ("dst", pa.int64()),
                    ("walker", pa.int64()),
                    ("__is_edge", pa.int64()),
                ]
            ).empty_table()
        n = batch.num_rows
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "walker": pa.array(np.zeros(n, dtype=np.int64)),
                "__is_edge": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "walker" not in batch.column_names:
            return pa.schema(
                [
                    ("src", pa.int64()),
                    ("dst", pa.int64()),
                    ("walker", pa.int64()),
                    ("__is_edge", pa.int64()),
                ]
            ).empty_table()
        n = batch.num_rows
        return pa.table(
            {
                "src": batch.column("node"),
                "dst": pa.array(np.zeros(n, dtype=np.int64)),
                "walker": batch.column("walker"),
                "__is_edge": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    edges_tagged = directed.map_batches(
        tag_edges, batch_format="pyarrow"
    ).materialize()

    def init_pos(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return _POS_SCHEMA.empty_table()
        return pa.table(
            {"walker": batch.column("src"), "node": batch.column("src")}
        )

    positions = right_size(
        coarse_groupby_agg(
            directed.map_batches(init_pos, batch_format="pyarrow"),
            ["walker"],
            {"node": ("node", "min")},
            n_parts=n_parts,
        ).materialize()
    )

    def step_kernel(t: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "walker": pd.Series(dtype=np.int64),
                    "node": pd.Series(dtype=np.int64),
                }
            )
            if df.empty or "__is_edge" not in df.columns:
                return empty
            edges = df[df["__is_edge"] == 1][["src", "dst"]]
            pos = df[df["__is_edge"] == 0][["src", "walker"]]
            if edges.empty or pos.empty:
                return empty
            cand = pos.merge(edges, on="src", how="inner")
            if cand.empty:
                return empty
            from opentapioca_ray.stages.sketches import _md5_u64

            w = cand["walker"].to_numpy(dtype=np.int64)
            m = cand["dst"].to_numpy(dtype=np.int64)
            seed = np.char.add(
                np.char.add(w.astype(str), f":{t}:"), m.astype(str)
            )
            hv = _md5_u64(seed)
            order = np.lexsort((m, hv, w))
            w, m = w[order], m[order]
            first = np.concatenate(([True], w[1:] != w[:-1]))
            return pd.DataFrame({"walker": w[first], "node": m[first]})

        return fn

    walk_rows = [positions]
    for t in range(steps):
        union = edges_tagged.union(
            positions.map_batches(tag_pos, batch_format="pyarrow")
        )
        positions = right_size(
            coarse_group_apply(
                union, "src", step_kernel(t), n_parts=n_parts
            ).materialize()
        )
        walk_rows.append(positions)

    out = None
    for i, p in enumerate(walk_rows):
        step_ds = p.map_batches(
            lambda b, step=i: pa.table(
                {
                    "walker": b.column("walker"),
                    "step": pa.array(
                        np.full(b.num_rows, step, dtype=np.int64)
                    ),
                    "node": b.column("node"),
                }
            )
            if b.num_rows and "walker" in b.column_names
            else _WALK_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        out = step_ds if out is None else out.union(step_ds)
    return out
