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


def pack_sequences(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    budget: int = 512,
    part_size: int = 128,
):
    """Greedy sequence packing: assign documents (in id order) to training
    sequences of at most `budget` whitespace tokens — the standard
    pre-training step that concatenates short documents so context windows
    aren't wasted on padding.

    Packing is inherently sequential (each assignment depends on the
    running total), so it is done per deterministic id-range partition
    (`part = id // part_size`): partitions pack independently and in
    parallel, global sequence identity is (part, seq). One coarse exchange
    on `part` co-locates each range; the greedy scan inside a partition is
    a single pass over its sorted ids. A document longer than `budget`
    gets a sequence of its own (never split — splitting is
    `chunk_documents`' job upstream).

    Returns (part, seq, id, n_tok); rule: new sequence when
    acc + n_tok > budget, else accumulate."""
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401 (parity with module imports)

    from opentapioca_ray.functions.textstats import whitespace_token_lists
    from opentapioca_ray.stages.exchange import coarse_group_apply

    def tok_counts(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("part", pa.int64()), pa.field(id_column, pa.int64()),
             pa.field("n_tok", pa.int64())]
        )
        if batch.num_rows == 0 or id_column not in batch.column_names:
            return schema.empty_table()
        toks = whitespace_token_lists(batch, text_column)
        n_tok = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "part": pa.array(ids // part_size),
                id_column: pa.array(ids),
                "n_tok": pa.array(n_tok.astype(np.int64)),
            }
        )

    def pack_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "part": pd.Series(dtype=np.int64),
                "seq": pd.Series(dtype=np.int64),
                id_column: pd.Series(dtype=np.int64),
                "n_tok": pd.Series(dtype=np.int64),
            }
        )
        if df.empty or "part" not in df.columns:
            return empty
        df = df.sort_values(["part", id_column])
        parts = df["part"].to_numpy(dtype=np.int64)
        ntoks = df["n_tok"].to_numpy(dtype=np.int64)
        seqs = np.empty(len(df), dtype=np.int64)
        cur_part, seq, acc = None, 0, 0
        # greedy accumulate-with-reset is data-dependent sequential by
        # nature; the loop runs once per doc of THIS partition only
        for i in range(len(df)):
            if parts[i] != cur_part:
                cur_part, seq, acc = parts[i], 0, ntoks[i]
            elif acc + ntoks[i] > budget:
                seq, acc = seq + 1, ntoks[i]
            else:
                acc += ntoks[i]
            seqs[i] = seq
        return pd.DataFrame(
            {
                "part": parts,
                "seq": seqs,
                id_column: df[id_column].to_numpy(dtype=np.int64),
                "n_tok": ntoks,
            }
        )

    counted = ds.map_batches(tok_counts, batch_format="pyarrow")
    return coarse_group_apply(counted, "part", pack_partition)
