"""Distributed 2-D skyline (Pareto frontier).

Classic distribute-then-merge skyline (Börzsönyi et al., "The Skyline
Operator", ICDE 2001; the partition/merge scheme every distributed variant
uses): the skyline of a union is a subset of the union of per-partition
skylines, so each block prefilters locally — O(block log block), zero
communication — and only the per-block survivors (≈ O(log n) rows each for
non-adversarial data) reach the single tiny merge partition. Nothing
proportional to the input ever moves: at 100 TB the merge input is
(#blocks × tens) of rows.

Dominance (maximize `max_col`, minimize `min_col`): B dominates A iff
B.max >= A.max AND B.min <= A.min with at least one strict. Exact ties on
both keys dominate neither way — all duplicates of a frontier point are
kept (the SQL twin's group-min formulation matches this)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(mx: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Keep mask of the non-dominated rows: sort by (mx desc, mn asc),
    then a row survives iff its mn equals its mx-group's min AND beats the
    running min of all strictly-greater-mx groups."""
    n = len(mx)
    if n == 0:
        return np.zeros(0, dtype=bool)
    o = np.lexsort((mn, -mx))
    ms, ds = mx[o], mn[o]
    new = np.concatenate(([True], ms[1:] != ms[:-1]))
    gid = np.cumsum(new) - 1
    gmin = ds[np.flatnonzero(new)]  # mn asc within group -> first is min
    prev = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(gmin)[:-1])
    )
    keep_sorted = (ds == gmin[gid]) & (ds < prev[gid])
    keep = np.zeros(n, dtype=bool)
    keep[o] = keep_sorted
    return keep


def skyline2d(ds, max_column: str, min_column: str):
    """Rows on the (maximize `max_column`, minimize `min_column`) Pareto
    frontier. Both columns must cast to int64 for the exact tie logic
    (timestamps/dates do; floats are compared via their int64 order-map
    bits)."""

    def _cols(batch: pa.Table):
        mxc = batch.column(max_column)
        if pa.types.is_floating(mxc.type):
            f = mxc.to_numpy(zero_copy_only=False).astype(np.float64)
            # monotone order-preserving int64 view of float64 (all finite)
            bits = f.view(np.int64)
            mx = np.where(bits < 0, np.int64(-1) - (bits & np.int64(0x7FFFFFFFFFFFFFFF)), bits)
        else:
            mx = mxc.cast(pa.int64()).to_numpy(zero_copy_only=False)
        mn = batch.column(min_column).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return mx, mn

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or max_column not in batch.column_names:
            return batch
        mx, mn = _cols(batch)
        return batch.filter(pa.array(_skyline_mask(mx, mn)))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    # survivors are tiny: one merge partition sees them all
    return pruned.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )
