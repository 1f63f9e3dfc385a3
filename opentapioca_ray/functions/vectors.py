"""Arrow list<float> column <-> numpy matrix, without per-row Python.

Embedding columns ride through the object store as Arrow `list<float>`
(or `fixed_size_list`). The naive `np.array(col.to_pylist())` round-trips
every element through Python objects — O(n*d) boxing on the hottest ANN /
embedding-dedup path. `flatten()` + `reshape` reads the underlying values
buffer directly (one copy at most, for dtype cast), which is what every
batch kernel here should use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n,) Arrow list<float> column -> (n, d) numpy matrix.

    Requires rectangular, null-free lists (the embedding-table contract);
    raises ValueError on ragged input rather than silently mangling rows.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
    else:
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(lengths[0])
        if not (lengths == d).all():
            raise ValueError("ragged embedding column")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, d)


def matrix_to_list(mat: np.ndarray) -> pa.ListArray:
    """(n, d) numpy matrix -> Arrow list<float64> column (flat buffer +
    arithmetic offsets; no per-row Python lists)."""
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    n, d = mat.shape
    values = pa.array(mat.ravel(), type=pa.float64())
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, values)
