"""Mergeable sketches for when exact answers stop fitting.

`distinct_count` (stages/aggregates.py) is exact but its exchange volume is
the number of DISTINCT (group, value) pairs — at 100 TB that can itself be
the bottleneck. The KMV (K-minimum-values) sketch bounds the exchange at
K rows per (group, block): keep the K smallest 64-bit hashes of the values;
the K-th smallest hash h estimates the distinct count as
(K-1) * 2^64 / h (Bar-Yossef et al., RANDOM'02). The sketch is a true
combiner — merging two sketches is "union, keep K smallest" — so it
composes with the same coarse-exchange machinery as every other aggregate
here. Relative error ~ 1/sqrt(K-2) (~6% at K=256).

Hashes are the big-endian first 8 bytes of md5(str(value)) — the same
convention as simhash/hash_sample — which makes the DuckDB oracle EXACT:
the SQL twin recomputes the identical sketch via
('0x' || substr(md5(v::VARCHAR), 1, 16))::UBIGINT, so the driver checks a
hash match, not an accuracy band. Groups with fewer than K distinct values
report their exact count (the sketch holds every hash).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_TWO64 = 18446744073709551616.0  # 2^64, exact in float64


def _md5_u64(values: np.ndarray) -> np.ndarray:
    """Big-endian first 8 md5 digest bytes of str(value), as uint64 —
    hashed once per DISTINCT value in the batch (md5 is the cost center)."""
    uniq, inv = np.unique(values.astype(str), return_inverse=True)
    digests = b"".join(hashlib.md5(s.encode("utf-8")).digest()[:8] for s in uniq)
    return np.frombuffer(digests, dtype=">u8").astype(np.uint64)[inv]


def _k_smallest(g: np.ndarray, hv: np.ndarray, k: int):
    """Per-group K smallest DISTINCT hashes of (group, hash) rows.
    Returns (g, hv) filtered, sorted by (g, hv) — one vectorized pass."""
    order = np.lexsort((hv, g))
    g, hv = g[order], hv[order]
    keep = np.concatenate(([True], (g[1:] != g[:-1]) | (hv[1:] != hv[:-1])))
    g, hv = g[keep], hv[keep]
    new = np.concatenate(([True], g[1:] != g[:-1]))
    seg_start = np.flatnonzero(new)
    seg_id = np.cumsum(new) - 1
    pos = np.arange(len(g), dtype=np.int64) - seg_start[seg_id]
    mask = pos < k
    return g[mask], hv[mask]


def approx_distinct(
    ds,
    group_column: str,
    value_column: str,
    k: int = 256,
    alias: str = "n_approx",
):
    """Approximate COUNT(DISTINCT value) per group via a KMV sketch:
    per-batch partial sketch (combiner, <= k rows per group per block),
    ONE coarse exchange on the group key, per-partition sketch merge +
    estimate. Deterministic — the DuckDB twin reproduces it bit-for-bit."""
    from opentapioca_ray.stages.exchange import coarse_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or group_column not in batch.column_names:
            return pa.table(
                {
                    group_column: pa.array([], type=pa.string()),
                    "_hv": pa.array([], type=pa.uint64()),
                }
            )
        g = batch.column(group_column).to_numpy(zero_copy_only=False)
        vals = batch.column(value_column).to_numpy(zero_copy_only=False)
        hv = _md5_u64(vals)
        g2, hv2 = _k_smallest(g, hv, k)
        return pa.table(
            {
                group_column: pa.array(g2.astype(str)),
                "_hv": pa.array(hv2, type=pa.uint64()),
            }
        )

    partials = ds.select_columns([group_column, value_column]).map_batches(
        partial, batch_format="pyarrow"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {group_column: pd.Series(dtype=object), alias: pd.Series(dtype=np.int64)}
        )
        if df.empty or group_column not in df.columns:
            return empty
        g = df[group_column].to_numpy()
        hv = df["_hv"].to_numpy(dtype=np.uint64)
        g2, hv2 = _k_smallest(g, hv, k)
        if len(g2) == 0:
            return empty
        new = np.concatenate(([True], g2[1:] != g2[:-1]))
        seg_start = np.flatnonzero(new)
        seg_end = np.concatenate((seg_start[1:], [len(g2)]))
        m = seg_end - seg_start
        kth = hv2[seg_end - 1].astype(np.float64)  # K-th smallest when m == k
        # operand order mirrors the SQL twin exactly: (k-1) * 2^64 / kth,
        # then half-up via floor(x + 0.5) (numpy round is half-even, SQL
        # round is half-away — floor(+0.5) is the portable spelling)
        est = np.floor((k - 1) * _TWO64 / kth + 0.5)
        n = np.where(m < k, m.astype(np.float64), est).astype(np.int64)
        return pd.DataFrame({group_column: g2[seg_start], alias: n})

    return coarse_group_apply(partials, group_column, finalize)
