"""Meta-blocking: block purging + CBS edge weights + weighted node pruning.

The standard redundancy-positive blocking refinement (Papadakis et al.,
"Meta-Blocking: Taking Entity Resolution to the Next Level", TKDE 2014):
treat every block as a clique of comparisons, weight each candidate pair by
a co-occurrence scheme (here CBS — Common Blocks Scheme, the number of
shared blocks), and prune per node against its mean incident weight (WNP).
This repo uses the RECIPROCAL variant (an edge survives only if it clears
BOTH endpoints' thresholds) — the precision-oriented form.

Scale shape: the purge (drop blocks bigger than `max_block_size`) bounds
per-block pair fan-out at C(cap, 2); weights come from the same
two-exchange pair-count pipeline as every gram operator (one coarse
exchange on the block key — co-location makes the purge exact — one coarse
(u, v) merge); node thresholds are an O(nodes) roll-up of the edge list;
threshold attachment is two more coarse exchanges (edges keyed by u, then
by v) with the slim node-stats table riding the same shuffle — nothing is
ever broadcast or collected on the driver. The WNP comparison is pure
integer math (w * degree >= weight_sum), so the DuckDB twin matches
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EDGE_EMPTY = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("cbs", pa.int64())]
).empty_table()


def _cbs_edges(ds, id_column, text_column, k, max_block_size, n_parts,
               scheme: str = "cbs"):
    """(u, v, w) candidate edges over distinct word-k-gram blocks purged
    at `max_block_size` docs, weighted by the chosen co-occurrence
    scheme (Papadakis et al., TKDE 2014):

    - "cbs": w = number of shared blocks (integer).
    - "arcs": w = sum over shared blocks of 1e6 // C(nb, 2) — the
      Aggregate Reciprocal Comparisons Scheme in fixed-point e6 units
      (rare blocks vote with more weight); exact integer math so the
      DuckDB twin matches bit-for-bit."""
    from opentapioca_ray.stages.dedup import gram_doc_rows
    from opentapioca_ray.stages.exchange import coarse_group_apply, coarse_groupby_agg
    from opentapioca_ray.stages.triangles import _segment_pairs

    rows = ds.map_batches(
        lambda b: gram_doc_rows(b, id_column, text_column, k).select(
            ["gram", "doc_id"]
        ),
        batch_format="pyarrow",
    )

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in ("u", "v", "w")})
        if df.empty:
            return empty
        codes, _ = pd.factorize(df["gram"].to_numpy())
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        o = np.lexsort((ids, codes))
        codes, ids = codes[o], ids[o]
        # all rows of a block co-locate -> the purge is globally exact
        sizes = np.bincount(codes)
        keep = sizes[codes] <= max_block_size
        codes, ids = codes[keep], ids[keep]
        li, ri = _segment_pairs(codes)
        if len(li) == 0:
            return empty
        _, inv = np.unique(ids, return_inverse=True)
        packed = (inv[li].astype(np.uint64) << np.uint64(32)) | inv[ri].astype(
            np.uint64
        )
        if scheme == "arcs":
            nb = sizes[codes[li]].astype(np.int64)
            term = 1_000_000 // (nb * (nb - 1) // 2)
            _, idx0, pinv = np.unique(
                packed, return_index=True, return_inverse=True
            )
            # exact: terms <= 1e6, per-pair counts bounded by shared
            # blocks, so the float64 bincount sum stays < 2^53
            w = np.bincount(pinv, weights=term.astype(np.float64)).astype(
                np.int64
            )
        else:
            _, idx0, w = np.unique(packed, return_index=True, return_counts=True)
            w = w.astype(np.int64)
        return pd.DataFrame({"u": ids[li[idx0]], "v": ids[ri[idx0]], "w": w})

    partial = coarse_group_apply(rows, "gram", pair_partition, n_parts=n_parts)
    return coarse_groupby_agg(
        partial, ["u", "v"], {"w": ("w", "sum")}, n_parts=n_parts
    )


def _attach_node_stats(edges, stats, node_column, edge_names, s_name, d_name, n_parts):
    """Edges gain (`s_name`, `d_name`) = the weight sum / degree of their
    `node_column` endpoint, via ONE coarse exchange on that endpoint with
    the slim (node, s, d) table riding the same shuffle — the reduce-side
    lookup-join shape (Ray's hash join is avoided repo-wide; see
    tests/conftest gotchas). `edge_names` is passed explicitly so no
    schema() call forces plan execution."""
    from opentapioca_ray.stages.exchange import coarse_group_apply
    union_fields = [(c, pa.int64()) for c in edge_names] + [
        ("__s", pa.int64()),
        ("__d", pa.int64()),
        ("__is_stat", pa.bool_()),
    ]
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema([(c, pa.int64()) for c in edge_names] + [
        (s_name, pa.int64()),
        (d_name, pa.int64()),
    ])

    def edge_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or node_column not in batch.column_names:
            return union_schema.empty_table()
        n = batch.num_rows
        cols = {c: batch.column(c).cast(pa.int64()) for c in edge_names}
        cols["__s"] = pa.nulls(n, pa.int64())
        cols["__d"] = pa.nulls(n, pa.int64())
        cols["__is_stat"] = pa.array(np.zeros(n, dtype=bool))
        return pa.table(cols).cast(union_schema)

    def stat_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return union_schema.empty_table()
        n = batch.num_rows
        cols = {
            c: (
                batch.column("node").cast(pa.int64())
                if c == node_column
                else pa.nulls(n, pa.int64())
            )
            for c in edge_names
        }
        cols["__s"] = batch.column("s").cast(pa.int64())
        cols["__d"] = batch.column("d").cast(pa.int64())
        cols["__is_stat"] = pa.array(np.ones(n, dtype=bool))
        return pa.table(cols).cast(union_schema)

    unioned = edges.map_batches(edge_rows, batch_format="pyarrow").union(
        stats.map_batches(stat_rows, batch_format="pyarrow")
    )

    def merge_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__is_stat" not in t.column_names:
            return out_schema.empty_table()
        isk = t.column("__is_stat").to_numpy(zero_copy_only=False).astype(bool)
        data = t.filter(pa.array(~isk))
        if data.num_rows == 0:
            return out_schema.empty_table()
        keys = t.filter(pa.array(isk))
        kn = keys.column(node_column).to_numpy(zero_copy_only=False)
        ks = keys.column("__s").to_numpy(zero_copy_only=False)
        kd = keys.column("__d").to_numpy(zero_copy_only=False)
        o = np.argsort(kn)
        kn, ks, kd = kn[o], ks[o], kd[o]
        dn = data.column(node_column).to_numpy(zero_copy_only=False)
        # every edge endpoint has a stats row by construction
        idx = np.searchsorted(kn, dn)
        cols = {c: data.column(c) for c in edge_names}
        cols[s_name] = pa.array(ks[idx].astype(np.int64))
        cols[d_name] = pa.array(kd[idx].astype(np.int64))
        return pa.table(cols).cast(out_schema)

    return coarse_group_apply(
        unioned, node_column, merge_partition, n_parts=n_parts,
        batch_format="pyarrow",
    )


def metablocking_wnp_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 3,
    max_block_size: int = 24,
    n_parts=None,
    scheme: str = "cbs",
):
    """Candidate pairs surviving reciprocal weighted node pruning over
    scheme-weighted ("cbs" or "arcs"), purged k-gram blocks. Output:
    (u, v, <scheme>) — the weight column is named after the scheme
    ("cbs" counts, "arcs" fixed-point e6)."""
    from opentapioca_ray.stages.exchange import coarse_groupby_agg, right_size

    # Materialize: `edges` is consumed three times downstream (stats roll-up
    # + both attach passes) and `stats` twice; left lazy, each consumption
    # re-runs the whole two-shuffle gram-pair pipeline (measured 19.8s ->
    # 4.5s at sf0.001). right_size re-blocks the shuffle output so the
    # chained union exchanges don't inherit a blocks >> rows layout.
    edges = right_size(
        _cbs_edges(ds, id_column, text_column, k, max_block_size, n_parts,
                   scheme=scheme)
        .materialize()
    )

    def explode(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("node", pa.int64()), ("w", pa.int64())])
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return schema.empty_table()
        u = batch.column("u").cast(pa.int64())
        v = batch.column("v").cast(pa.int64())
        w = batch.column("w").cast(pa.int64())
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [u.combine_chunks(), v.combine_chunks()]
                ),
                "w": pa.concat_arrays(
                    [w.combine_chunks(), w.combine_chunks()]
                ),
            }
        )

    stats = right_size(
        coarse_groupby_agg(
            edges.map_batches(explode, batch_format="pyarrow"),
            ["node"],
            {"s": ("w", "sum"), "d": ("w", "size")},
            n_parts=n_parts,
        ).materialize()
    )
    # Reciprocal WNP = (w >= mean_u) AND (w >= mean_v): prune each side
    # AS ITS stats attach, so the second exchange carries only the first
    # side's survivors (~10% of edges at the default config) instead of
    # every edge plus two extra stat columns.
    with_u = _attach_node_stats(
        edges, stats, "u", ["u", "v", "w"], "su", "du", n_parts
    )

    def prune_u(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())]
        )
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return schema.empty_table()
        w = batch.column("w").to_numpy(zero_copy_only=False)
        su = batch.column("su").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(w * du >= su))
        return pa.table(
            {
                "u": t.column("u").cast(pa.int64()),
                "v": t.column("v").cast(pa.int64()),
                "w": t.column("w").cast(pa.int64()),
            }
        )

    both = _attach_node_stats(
        with_u.map_batches(prune_u, batch_format="pyarrow"),
        stats,
        "v",
        ["u", "v", "w"],
        "sv",
        "dv",
        n_parts,
    )

    def prune_v(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), (scheme, pa.int64())]
        ).empty_table()
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return empty
        w = batch.column("w").to_numpy(zero_copy_only=False)
        sv = batch.column("sv").to_numpy(zero_copy_only=False)
        dv = batch.column("dv").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(w * dv >= sv))
        return pa.table(
            {
                "u": t.column("u").cast(pa.int64()),
                "v": t.column("v").cast(pa.int64()),
                scheme: t.column("w").cast(pa.int64()),
            }
        )

    return both.map_batches(prune_v, batch_format="pyarrow")
