"""Winnowing document fingerprints and fingerprint-sharing pairs.

Implements the MOSS fingerprint selection of Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003):
hash every word-k-gram of a document, slide a window of `w` consecutive
gram hashes, and in each window select the minimal hash (rightmost position
on ties). The selected set is a deterministic, position-robust ~1/(w+1)
sample of the gram stream with the winnowing guarantee: any shared run of
at least w+k-1 tokens between two documents yields at least one shared
fingerprint.

Scale shape (the whole point vs. exact n-gram joins): only the SELECTED
fingerprints — a (2/(w+1)) fraction of the grams — ever leave the worker,
so the blocking exchange moves ~5x less data than `gram_doc_rows` at w=4
while preserving long-match recall. Selection itself is per-document and
per-batch (zero shuffles); the pair count is the standard two-exchange
shape: one coarse exchange on the fingerprint hash (with a doc-frequency
purge guarding hot/boilerplate fingerprints), one coarse (u, v) merge.

Grams/tokenization are byte-identical to stages/dedup.py (`_gram_pieces`:
reference tagger separator, short docs collapse to one whole-doc gram) and
the hash is the shared md5-u64 convention (`sketches._md5_u64`), so a
DuckDB oracle reproduces every fingerprint bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from opentapioca_ray.stages.dedup import _gram_pieces
from opentapioca_ray.stages.sketches import _md5_u64

_FP_EMPTY = pa.schema([("fp", pa.int64()), ("doc_id", pa.int64())]).empty_table()
_PAIR_EMPTY = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("n_shared", pa.int64())]
).empty_table()


def winnow_fingerprint_rows(
    batch: pa.Table,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 3,
    w: int = 4,
) -> pa.Table:
    """Distinct (fp, doc_id) winnowing fingerprints of one batch.

    Vectorized across ALL docs of the batch at once: the rightmost-min
    window scan runs as `w` shifted numpy compares over the flat gram-hash
    array (within-doc positions gate cross-doc reads), never a per-doc
    Python loop. A doc with fewer than w grams contributes its single
    global-min fingerprint (the m < w degenerate window), matching the
    paper's guarantee edge case. `fp` is the md5-u64 hash bit-cast to
    int64 (same 64 bits; DuckDB compares the UBIGINT form)."""
    ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
    res = _gram_pieces(ids, batch.column(text_column).to_pylist(), k)
    if res is None:
        return _FP_EMPTY
    all_docs, all_grams = res
    # stable doc-major order keeps each doc's window grams positional
    o = np.argsort(all_docs, kind="stable")
    d = all_docs[o]
    hv = _md5_u64(all_grams.take(pa.array(o)).to_numpy(zero_copy_only=False))
    n = len(d)
    seg_new = np.concatenate(([True], d[1:] != d[:-1]))
    seg_start = np.flatnonzero(seg_new)
    seg_id = np.cumsum(seg_new) - 1
    p = np.arange(n, dtype=np.int64) - seg_start[seg_id]  # pos within doc
    m_row = np.bincount(seg_id)[seg_id]  # grams in this row's doc
    # rightmost minimal hash over the window [i-w+1, i]: scan shifts from
    # oldest (s=w-1) to newest (s=0); `<=` lets newer positions win ties
    best_hv = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
    best_off = np.zeros(n, dtype=np.int64)
    for s in range(w - 1, -1, -1):
        if s == 0:
            cand, valid = hv, None
        else:
            cand = np.zeros(n, dtype=np.uint64)
            cand[s:] = hv[:-s]
            valid = p >= s
        upd = cand <= best_hv if valid is None else valid & (cand <= best_hv)
        best_hv[upd] = cand[upd]
        best_off[upd] = s
    # full windows end at p >= w-1; a doc with m < w grams has exactly one
    # (short) window, ending at its last gram
    is_end = (p >= w - 1) | ((m_row < w) & (p == m_row - 1))
    sel = np.unique(np.flatnonzero(is_end) - best_off[is_end])
    sd, shv = d[sel], hv[sel]
    o2 = np.lexsort((shv, sd))
    sd, shv = sd[o2], shv[o2]
    keep = np.concatenate(([True], (sd[1:] != sd[:-1]) | (shv[1:] != shv[:-1])))
    return pa.table(
        {
            "fp": pa.array(shv[keep].view(np.int64)),
            "doc_id": pa.array(ids[sd[keep]]),
        }
    )


def winnow_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 3,
    w: int = 4,
    max_doc_freq: int = 32,
    min_shared: int = 2,
    n_parts=None,
):
    """Doc pairs sharing >= `min_shared` winnowing fingerprints.

    One coarse exchange on the fingerprint hash — every holder of a
    fingerprint co-locates, so the per-partition doc frequency IS global
    and the `max_doc_freq` purge (boilerplate guard, standard in
    fingerprint indexes) is exact — then one coarse (u, v) merge sums the
    per-partition shared counts. Pair volume is capped by
    C(max_doc_freq, 2) per fingerprint."""
    from opentapioca_ray.stages.exchange import coarse_group_apply, coarse_groupby_agg
    from opentapioca_ray.stages.triangles import _segment_pairs

    fps = ds.map_batches(
        lambda b: winnow_fingerprint_rows(b, id_column, text_column, k, w),
        batch_format="pyarrow",
    )

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ("u", "v", "n")}
        )
        if df.empty:
            return empty
        codes, _ = pd.factorize(df["fp"].to_numpy())
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        o = np.lexsort((ids, codes))
        codes, ids = codes[o], ids[o]
        keep = np.bincount(codes)[codes] <= max_doc_freq
        codes, ids = codes[keep], ids[keep]
        li, ri = _segment_pairs(codes)
        if len(li) == 0:
            return empty
        # (fp, doc) rows are globally distinct, ids ascend within an fp
        # segment -> ids[li] < ids[ri]; count shared fps per packed pair
        _, inv = np.unique(ids, return_inverse=True)
        packed = (inv[li].astype(np.uint64) << np.uint64(32)) | inv[ri].astype(
            np.uint64
        )
        _, idx0, cnt = np.unique(packed, return_index=True, return_counts=True)
        return pd.DataFrame(
            {"u": ids[li[idx0]], "v": ids[ri[idx0]], "n": cnt.astype(np.int64)}
        )

    partial = coarse_group_apply(fps, "fp", pair_partition, n_parts=n_parts)
    summed = coarse_groupby_agg(
        partial, ["u", "v"], {"n_shared": ("n", "sum")}, n_parts=n_parts
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "u" not in batch.column_names:
            return _PAIR_EMPTY
        t = batch.filter(pc.greater_equal(batch.column("n_shared"), min_shared))
        return pa.table(
            {
                "u": t.column("u").cast(pa.int64()),
                "v": t.column("v").cast(pa.int64()),
                "n_shared": t.column("n_shared").cast(pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
