"""Coarse-partition exchange primitives.

`groupby(key).map_groups(fn)` collapses when keys are numerous and groups
are tiny (per-group pandas/task overhead dominates — the classic Ray Data
tiny-group failure at millions of users/nodes/blocks). The fix, used by
every wide stage in this repo: shuffle by a COARSE key (hash(key) % P) so
each group holds MANY whole logical groups, then run ONE vectorized numpy
kernel per partition that processes all its logical groups at once.

Partitioning assumption (documented per the driver brief): all rows of one
logical key land in one coarse partition — guaranteed by hashing the key —
and a partition's rows fit in a worker's heap (P is sized so corpus/P does;
raise `n_parts` for bigger corpora; skewed single keys need the caller's
own skew guard, e.g. the sorted-neighborhood cap in stages/pairs.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


_HASH_KEY = "opentapioca_ray0"  # fixed 16 bytes: deterministic across procs


def _coarse_codes(key_col, n_parts: int) -> pa.Array:
    """Deterministic hash(key) % n_parts as an int64 Arrow array (stable
    across worker processes — never builtin hash())."""
    if isinstance(key_col, pa.ChunkedArray):
        key_col = key_col.combine_chunks()
    if pa.types.is_string(key_col.type) or pa.types.is_large_string(key_col.type):
        # one C-level SipHash pass over the column (pd.util.hash_array with
        # a fixed key) — not a per-row Python crc32 loop
        import pandas as pd_  # noqa: PLC0415

        vals = key_col.to_numpy(zero_copy_only=False)
        codes = pd_.util.hash_array(vals, hash_key=_HASH_KEY) % np.uint64(n_parts)
        return pa.array(codes.astype(np.int64), type=pa.int64())
    vals = key_col.cast(pa.int64())
    if n_parts & (n_parts - 1) == 0:
        part = pc.bit_wise_and(vals, pa.scalar(n_parts - 1, pa.int64()))
    else:
        part = pc.subtract(
            vals, pc.multiply(pc.divide(vals, n_parts), pa.scalar(n_parts, pa.int64()))
        )
        part = pc.if_else(pc.less(part, 0), pc.add(part, n_parts), part)
    return part.combine_chunks() if isinstance(part, pa.ChunkedArray) else part


def default_n_parts(n_parts: int | None = None) -> int:
    """P defaults to ~4 partitions per CPU (power of two): enough groups to
    balance, few enough that per-partition kernel launches stay cheap."""
    if n_parts is not None:
        return n_parts
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    p = 1
    while p < cpus * 4:
        p *= 2
    return min(p, 1024)


def coarse_group_apply(
    ds,
    key_column: str,
    partition_fn,
    n_parts: int | None = None,
    batch_format: str = "pandas",
):
    """One keyed shuffle: rows land in hash(key) % P partitions;
    `partition_fn` receives ALL rows of one partition (many whole logical
    groups) and must handle them vectorized. Replaces per-tiny-key
    `groupby(key).map_groups`."""
    n_parts = default_n_parts(n_parts)

    def add_part(batch: pa.Table) -> pa.Table:
        if key_column not in batch.column_names:
            return batch  # schema-less empty block (Ray 2.49 shuffle output)
        return batch.append_column("__part", _coarse_codes(batch.column(key_column), n_parts))

    def drop_part_fn(group):
        if isinstance(group, pd.DataFrame):
            group = group.drop(columns="__part", errors="ignore")
        elif isinstance(group, pa.Table) and "__part" in group.column_names:
            group = group.drop_columns("__part")
        return partition_fn(group)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(drop_part_fn, batch_format=batch_format)
    )


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where a new logical group starts in a sorted key array."""
    if len(sorted_keys) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(
        np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1]))
    ).astype(np.int64)


def segment_ids(sorted_keys: np.ndarray) -> np.ndarray:
    """Dense 0..G-1 group id per row of a sorted key array."""
    if len(sorted_keys) == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1]))
    return np.cumsum(new, dtype=np.int64) - 1
