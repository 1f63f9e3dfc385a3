"""Grid-bucketed spatial neighbor self-join (fixed-radius near pairs).

The ε-neighborhood join every spatial / embedding-projection workload
needs: all point pairs within L∞ distance ε, found without an all-pairs
scan by snapping points to an ε-sized grid — any qualifying pair lives
in the same or an adjacent cell, so probing the 3x3 neighborhood is
LOSSLESS. This is the repo's one bounded-replication exchange: the probe
side is duplicated at most 9x (constant), every other stage ships each
row once. L∞ on e6 fixed-point coordinates keeps the distance check and
the output exact integers (the oracle is the plain quadratic join).

Skew guard: cells larger than `max_cell_size` points are truncated on
the HOME side with the drop logged (dense hotspots need a finer grid,
not an O(hot^2) kernel) — same convention as every pair stage here."""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)

_PAIR_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("linf_e6", pa.int64())]
)

# cell coordinates pack into one int64 exchange key; coordinates are e6
# fixed-point so |cell| <= 2^62 / _CELL_PACK never binds in practice
_CELL_PACK = np.int64(1 << 21)


def grid_neighbor_join(
    ds,
    id_column: str,
    x_column: str,
    y_column: str,
    eps_e6: int,
    max_cell_size: int = 50_000,
    n_parts: int | None = None,
):
    """All (u, v, linf_e6) pairs with u < v and L∞ distance <= eps_e6
    over int64 e6 coordinates. One bounded-replication exchange."""
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
    )

    eps = np.int64(eps_e6)

    tag_schema = pa.schema(
        [
            ("cell", pa.int64()),
            ("id", pa.int64()),
            ("x", pa.int64()),
            ("y", pa.int64()),
            ("home", pa.int64()),
        ]
    )

    def replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_column not in batch.column_names:
            return tag_schema.empty_table()
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column(x_column).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_column).to_numpy(zero_copy_only=False).astype(np.int64)
        cx = np.floor_divide(x, eps)
        cy = np.floor_divide(y, eps)
        outs = []
        # home copy (dx = dy = 0) + 8 probe copies into the neighbors
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx) * _CELL_PACK + (cy + dy)
                outs.append(
                    pa.table(
                        {
                            "cell": pa.array(cell),
                            "id": pa.array(ids),
                            "x": pa.array(x),
                            "y": pa.array(y),
                            "home": pa.array(
                                np.full(
                                    len(ids),
                                    1 if (dx == 0 and dy == 0) else 0,
                                    dtype=np.int64,
                                )
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    tagged = ds.map_batches(replicate, batch_format="pyarrow")

    def cell_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ("u", "v", "linf_e6")}
        )
        if df.empty or "cell" not in df.columns:
            return empty
        cell = pd.factorize(df["cell"].to_numpy())[0]
        ids = df["id"].to_numpy(dtype=np.int64)
        x = df["x"].to_numpy(dtype=np.int64)
        y = df["y"].to_numpy(dtype=np.int64)
        home = df["home"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, -home, cell))
        cell, ids, x, y, home = (
            a[order] for a in (cell, ids, x, y, home)
        )
        bounds = np.flatnonzero(
            np.concatenate(([True], cell[1:] != cell[:-1], [True]))
        )
        us, vs, ds_ = [], [], []
        n_dropped = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            h = np.arange(s, e)[home[s:e] == 1]
            if len(h) > max_cell_size:
                n_dropped += len(h) - max_cell_size
                h = h[:max_cell_size]
            p = np.arange(s, e)  # probes include the home copies' cellmates
            if len(h) == 0 or len(p) == 0:
                continue
            ii = np.repeat(h, len(p))
            jj = np.tile(p, len(h))
            keep = (
                (ids[ii] < ids[jj])
                & (np.abs(x[ii] - x[jj]) <= eps)
                & (np.abs(y[ii] - y[jj]) <= eps)
            )
            if keep.any():
                us.append(ids[ii[keep]])
                vs.append(ids[jj[keep]])
                ds_.append(
                    np.maximum(
                        np.abs(x[ii[keep]] - x[jj[keep]]),
                        np.abs(y[ii[keep]] - y[jj[keep]]),
                    )
                )
        if n_dropped:
            logger.warning(
                "grid_neighbor_join: %d home rows dropped by max_cell_size=%d "
                "(dense cell; use a finer eps grid for full recall)",
                n_dropped,
                max_cell_size,
            )
        if not us:
            return empty
        return pd.DataFrame(
            {
                "u": np.concatenate(us),
                "v": np.concatenate(vs),
                "linf_e6": np.concatenate(ds_),
            }
        )

    raw = coarse_group_apply(tagged, "cell", cell_pairs, n_parts=n_parts)
    # a pair is found once per cell that holds one HOME endpoint with the
    # other in reach — up to twice (u's cell and v's cell): one keyed merge
    # dedupes; linf is identical wherever found
    return coarse_groupby_agg(
        raw, ["u", "v"], {"linf_e6": ("linf_e6", "min")}, n_parts=n_parts
    )
