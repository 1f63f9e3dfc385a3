"""Document chunking for training-data preparation.

Splitting a corpus into fixed-size overlapping chunks is the first step of
most LLM pre-training pipelines (context-window packing, embedding
indexing, retrieval corpora). The reference engine processes whole items
(reference `opentapioca/readers/dumpreader.py` streams full entities); this
module is part of the beyond-reference training-data surface.

Scale notes: chunking is embarrassingly parallel — a pure `map_batches`
fan-out with NO exchange; each output chunk row carries (id, chunk_idx)
so downstream stages can repartition on either. The kernel is vectorized
per chunk ordinal (one Arrow `utf8_slice_codeunits` call over all docs
that still have text at that offset), so per-batch work is O(max_chunks)
kernel calls, not O(rows) Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _empty(id_column: str, id_type: pa.DataType) -> pa.Table:
    return pa.schema(
        [
            pa.field(id_column, id_type),
            pa.field("chunk_idx", pa.int64()),
            pa.field("chunk_text", pa.string()),
        ]
    ).empty_table()


def chunk_documents(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    size: int = 200,
    stride: int = 150,
):
    """Fixed-size character chunks with overlap (`stride` <= `size` gives
    `size - stride` overlapping characters between consecutive chunks).

    A document of length L yields ceil(L / stride) chunks starting at
    0, stride, 2*stride, ... (every start < L); empty documents yield no
    chunks. Offsets are Unicode code points (= SQL `substring` character
    semantics)."""
    if stride <= 0:
        raise ValueError("stride must be positive")

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return _empty(id_column, pa.int64())
        batch = batch.combine_chunks()
        id_type = batch.schema.field(id_column).type
        lens = pc.utf8_length(batch.column(text_column)).to_numpy(
            zero_copy_only=False
        )
        pieces = []
        k = 0
        while True:
            start = k * stride
            mask = lens > start
            if not mask.any():
                break
            sub = batch.filter(pa.array(mask))
            chunk = pc.utf8_slice_codeunits(
                sub.column(text_column), start=start, stop=start + size
            )
            pieces.append(
                pa.table(
                    {
                        id_column: sub.column(id_column),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64)
                        ),
                        "chunk_text": chunk,
                    }
                )
            )
            k += 1
        if not pieces:
            return _empty(id_column, id_type)
        return pa.concat_tables(pieces)

    return ds.map_batches(kernel, batch_format="pyarrow")
