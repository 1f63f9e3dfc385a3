"""Shared-span detection: maximal duplicated token spans across documents.

The ExactSubstr family of LLM-corpus dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better") removes literal repeated
passages rather than whole near-dup documents. The suffix-array build of
the paper is a single-machine construction; the distributed equivalent
used here finds every maximal cross-document token span of length >= k
as DIAGONAL RUNS of matching positional k-grams:

  a span of L >= k shared tokens between docs u and v appears as exactly
  L - k + 1 positional k-gram matches that all sit on one diagonal
  (pos_u - pos_v constant) at consecutive pos_u — so grouping matches by
  (u, v, diagonal) and run-length-encoding consecutive pos_u recovers
  each maximal span once, with its length = run_length + k - 1.

Two coarse exchanges, both standard for this repo (stages/exchange.py):

  1. hash(gram) % P over positional k-gram rows — every occurrence of one
     gram co-locates, so the partition kernel emits all cross-document
     (u, v, pos_u, pos_v) matches with one segment cross-product. Hot
     grams (boilerplate headers) are dropped by an occurrence cap
     (`df_cap`), mirrored exactly in the SQL oracle; the kernel counts
     what it drops.
  2. hash(u, v) % P over match rows — every diagonal of one pair
     co-locates, so the islands kernel recovers maximal runs with one
     lexsort, no per-pair Python.

Reference anchor: OpenTapioca dedups at whole-mention granularity
(tagger.py builds per-mention candidate sets); shared spans are the
sub-document analogue this engine adds for training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_GRAM_POS_EMPTY = pa.schema(
    [("gram", pa.string()), ("doc_id", pa.int64()), ("pos", pa.int64())]
).empty_table()

_MATCH_EMPTY = pa.schema(
    [
        ("u", pa.int64()),
        ("v", pa.int64()),
        ("pu", pa.int64()),
        ("pv", pa.int64()),
    ]
).empty_table()

_SPAN_EMPTY = pa.schema(
    [
        ("u", pa.int64()),
        ("v", pa.int64()),
        ("u_start", pa.int64()),
        ("v_start", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
).empty_table()


def positional_gram_rows(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text", k: int = 8
) -> pa.Table:
    """Exploded POSITIONAL word-k-gram rows (gram, doc_id, pos) — unlike
    `dedup.gram_doc_rows` these are NOT deduped per doc and carry the
    0-based token offset of each window. Docs shorter than k tokens yield
    no rows (a span needs >= k tokens on both sides)."""
    import pyarrow.compute as pc

    from opentapioca_ray.functions.text import tokenize_flat

    if batch.num_rows == 0 or id_column not in batch.column_names:
        return _GRAM_POS_EMPTY
    ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_column).to_pylist()
    flat, counts = tokenize_flat([t or "" for t in texts])
    n = len(flat)
    if n < k:
        return _GRAM_POS_EMPTY
    counts = counts.astype(np.int64)
    doc_rep = np.repeat(np.arange(len(ids)), counts)
    flat_arr = pa.array(flat, type=pa.string())
    parts = [flat_arr.slice(j, n - k + 1) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = doc_rep[: n - k + 1] == doc_rep[k - 1 :]
    if not valid.any():
        return _GRAM_POS_EMPTY
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    win_docs = doc_rep[: n - k + 1]
    pos = np.arange(n - k + 1, dtype=np.int64) - offsets[win_docs]
    sel = pa.array(valid)
    return pa.table(
        {
            "gram": grams.filter(sel),
            "doc_id": pa.array(ids[win_docs[valid]], type=pa.int64()),
            "pos": pa.array(pos[valid], type=pa.int64()),
        }
    )


def _match_partition(df: pd.DataFrame, df_cap: int) -> pd.DataFrame:
    """All cross-document (u, v, pu, pv) gram matches of one gram-hash
    partition: dict-encode the grams once, then ONE segment cross-product
    over the sorted codes. Grams with more than `df_cap` total occurrences
    are dropped (boilerplate guard, mirrored in the oracle)."""
    if df.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ("u", "v", "pu", "pv")}
        )
    codes, _ = pd.factorize(df["gram"].to_numpy(), sort=False)
    doc = df["doc_id"].to_numpy(dtype=np.int64)
    pos = df["pos"].to_numpy(dtype=np.int64)
    order = np.argsort(codes, kind="stable")
    c_s, d_s, p_s = codes[order], doc[order], pos[order]
    new = np.concatenate(([True], c_s[1:] != c_s[:-1]))
    starts = np.flatnonzero(new).astype(np.int64)
    sizes = np.diff(np.append(starts, len(c_s)))
    keep = (sizes > 1) & (sizes <= df_cap)
    starts_k, sizes_k = starts[keep], sizes[keep]
    if not len(starts_k):
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ("u", "v", "pu", "pv")}
        )
    s2 = sizes_k * sizes_k
    total = int(s2.sum())
    base = np.repeat(starts_k, s2)
    sz = np.repeat(sizes_k, s2)
    cume = np.repeat(np.concatenate(([0], np.cumsum(s2)[:-1])), s2)
    within = np.arange(total, dtype=np.int64) - cume
    i = base + within // sz
    j = base + within % sz
    mask = i < j  # each unordered row pair once
    i, j = i[mask], j[mask]
    da, db = d_s[i], d_s[j]
    cross = da != db  # cross-document only (SQL twin: a.doc_id < b.doc_id)
    i, j, da, db = i[cross], j[cross], da[cross], db[cross]
    swap = da > db
    return pd.DataFrame(
        {
            "u": np.where(swap, db, da),
            "v": np.where(swap, da, db),
            "pu": np.where(swap, p_s[j], p_s[i]),
            "pv": np.where(swap, p_s[i], p_s[j]),
        }
    )


def _span_partition(df: pd.DataFrame, k: int, min_tokens: int) -> pd.DataFrame:
    """Maximal diagonal runs of one pair-hash partition: lexsort by
    (u, v, diagonal, pu); a run breaks where the pair, the diagonal, or
    the pu-consecutiveness breaks. Span length = run length + k - 1."""
    cols = ("u", "v", "u_start", "v_start", "n_tokens")
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    u = df["u"].to_numpy(dtype=np.int64)
    v = df["v"].to_numpy(dtype=np.int64)
    pu = df["pu"].to_numpy(dtype=np.int64)
    pv = df["pv"].to_numpy(dtype=np.int64)
    diag = pu - pv
    order = np.lexsort((pu, diag, v, u))
    u, v, pu, pv, diag = u[order], v[order], pu[order], pv[order], diag[order]
    breaks = np.concatenate(
        (
            [True],
            (u[1:] != u[:-1])
            | (v[1:] != v[:-1])
            | (diag[1:] != diag[:-1])
            | (pu[1:] != pu[:-1] + 1),
        )
    )
    starts = np.flatnonzero(breaks).astype(np.int64)
    run_len = np.diff(np.append(starts, len(u)))
    n_tokens = run_len + k - 1
    sel = n_tokens >= min_tokens
    return pd.DataFrame(
        {
            "u": u[starts][sel],
            "v": v[starts][sel],
            "u_start": pu[starts][sel],
            "v_start": pv[starts][sel],
            "n_tokens": n_tokens[sel],
        }
    )


def shared_spans(
    docs,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    min_tokens: int | None = None,
    df_cap: int = 64,
    n_parts: int | None = None,
):
    """Every maximal cross-document shared token span of length >=
    max(k, min_tokens), as (u, v, u_start, v_start, n_tokens) with u < v
    and 0-based token offsets. Two coarse exchanges end-to-end (gram hash,
    then pair hash); no driver collects; hot grams (> `df_cap` total
    occurrences) are excluded on BOTH sides of the oracle comparison."""
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        composite_codes,
        default_n_parts,
    )

    min_tokens = k if min_tokens is None else max(k, min_tokens)
    n_parts = default_n_parts(n_parts)
    grams = docs.map_batches(
        lambda b: positional_gram_rows(b, id_column, text_column, k),
        batch_format="pyarrow",
    )
    matches = coarse_group_apply(
        grams, "gram", lambda d: _match_partition(d, df_cap), n_parts=n_parts
    )

    def add_pair_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return _MATCH_EMPTY.append_column(
                "__part", pa.array([], type=pa.int64())
            )
        return batch.append_column(
            "__part", composite_codes(batch, ["u", "v"], n_parts)
        )

    def drop_part(df: pd.DataFrame) -> pd.DataFrame:
        return _span_partition(
            df.drop(columns="__part", errors="ignore"), k, min_tokens
        )

    return (
        matches.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(drop_part, batch_format="pandas")
    )
