"""2-D Pareto frontier (skyline) with an algebraic combiner.

The multi-objective selection operator (Börzsönyi et al., ICDE 2001):
keep every point no other point dominates (>= in the maximized
dimension, <= in the minimized one, strict somewhere). Skylines compose:
a point dominated inside one block is dominated globally, so each block
can emit only its LOCAL skyline — the global frontier is the skyline of
the union of local skylines, which for random data is logarithmic-sized.
That makes the operator a pure combiner pass: per-batch vectorized sweep
-> one keyed merge of candidate pairs -> one final sweep over a provably
tiny candidate set. Per-pair occurrence counts survive exactly because a
globally-surviving pair is in EVERY block's local skyline wherever it
occurs (nothing dominates it anywhere)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PAIR_SCHEMA = pa.schema(
    [("maxv", pa.int64()), ("minv", pa.int64()), ("n", pa.int64())]
)


def skyline_sweep(maxv: np.ndarray, minv: np.ndarray, n: np.ndarray):
    """Exact 2-D skyline of weighted distinct pairs (maximize `maxv`,
    minimize `minv`). Returns filtered (maxv, minv, n). Vectorized:
    per-level min, then a strictly-decreasing cummin sweep."""
    if len(maxv) == 0:
        return maxv, minv, n
    # merge duplicate pairs
    order = np.lexsort((minv, -maxv))
    mx, mn, w = maxv[order], minv[order], n[order]
    pair_first = np.concatenate(
        ([True], (mx[1:] != mx[:-1]) | (mn[1:] != mn[:-1]))
    )
    seg = np.cumsum(pair_first) - 1
    w = np.bincount(seg, weights=w).astype(np.int64)
    mx, mn = mx[pair_first], mn[pair_first]
    # within a maxv level only the smallest minv survives (strict minv
    # dominance at equal maxv); rows are sorted (maxv desc, minv asc)
    lvl_first = np.concatenate(([True], mx[1:] != mx[:-1]))
    keep_lvl = lvl_first.copy()
    # sweep across levels: a level survives iff its minv is strictly
    # below every strictly-greater level's minv
    lv_mn = mn[lvl_first]
    prev = np.concatenate(([np.iinfo(np.int64).max], np.minimum.accumulate(lv_mn)[:-1]))
    lvl_keep = lv_mn < prev
    keep = np.zeros(len(mx), dtype=bool)
    keep[np.flatnonzero(lvl_first)[lvl_keep]] = True
    return mx[keep], mn[keep], w[keep]


def pareto_frontier(
    ds,
    max_column: str,
    min_column: str,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Distributed 2-D skyline over int64 columns: per-batch local sweep
    (combiner), keyed candidate merge, final sweep. Returns a DataFrame
    (maxv, minv, n) — the non-dominated pairs with their occurrence
    counts."""
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or max_column not in batch.column_names:
            return _PAIR_SCHEMA.empty_table()
        mx = batch.column(max_column).to_numpy(zero_copy_only=False).astype(np.int64)
        mn = batch.column(min_column).to_numpy(zero_copy_only=False).astype(np.int64)
        mx, mn, n = skyline_sweep(mx, mn, np.ones(len(mx), dtype=np.int64))
        return pa.table(
            {"maxv": pa.array(mx), "minv": pa.array(mn), "n": pa.array(n)}
        )

    cand = coarse_groupby_agg(
        ds.map_batches(local, batch_format="pyarrow"),
        ["maxv", "minv"],
        {"n": ("n", "sum")},
        n_parts=n_parts,
    ).to_pandas()  # union of local skylines: ~log-sized per block
    mx, mn, n = skyline_sweep(
        cand["maxv"].to_numpy(dtype=np.int64),
        cand["minv"].to_numpy(dtype=np.int64),
        cand["n"].to_numpy(dtype=np.int64),
    )
    return pd.DataFrame({"maxv": mx, "minv": mn, "n": n})
