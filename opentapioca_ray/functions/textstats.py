"""Text-analysis kernels for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All vectorized over Arrow batches (pyarrow.compute / numpy); deterministic.
These extend the reference's text handling (its only text stats are the BOW
likelihood, languagemodel.py:47-66) with the standard large-corpus
curation signals.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- language ID: marker-stopword voting (deterministic heuristic).
_LANG_MARKERS = {
    "en": {"the", "of", "and", "to", "in", "is", "that", "it", "for", "was"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "es": {"el", "los", "las", "de", "y", "es", "una", "en", "que", "por"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不", "人", "这"},
}
_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_BPE_RE = re.compile(r"\w+|[^\w\s]")
_EN_STOPWORDS = _LANG_MARKERS["en"]


def detect_language(text: str) -> str:
    """Best marker-vote language; ties broken by fixed language order;
    'und' (undetermined) when no marker hits."""
    words = set(_WS_RE.split(text.lower()))
    best_lang, best_score = "und", 0
    for lang in ("en", "fr", "de", "es", "zh"):
        score = len(words & _LANG_MARKERS[lang])
        if lang == "zh":
            score = sum(ch in _LANG_MARKERS["zh"] for ch in text)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def add_language_column(batch: pa.Table, text_column: str = "text") -> pa.Table:
    langs = [detect_language(t or "") for t in batch.column(text_column).to_pylist()]
    return batch.append_column("lang_id", pa.array(langs, type=pa.string()))


def quality_stats(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-doc quality signals: char/token counts, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio, and a single
    [0,1] quality score."""
    texts = batch.column(text_column).to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_tokens = np.zeros(n, np.int64)
    punct_ratio = np.zeros(n)
    stopword_ratio = np.zeros(n)
    upper_ratio = np.zeros(n)
    mean_token_len = np.zeros(n)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        toks = _WS_RE.split(t.strip()) if t.strip() else []
        n_tokens[i] = len(toks)
        if t:
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / len(t)
            upper_ratio[i] = sum(c.isupper() for c in t) / len(t)
        if toks:
            low = [w.lower() for w in toks]
            stopword_ratio[i] = sum(w in _EN_STOPWORDS for w in low) / len(toks)
            mean_token_len[i] = sum(len(w) for w in toks) / len(toks)
    # simple composite: reward mid-length docs with some stopwords, penalize
    # punctuation-heavy rows
    length_score = np.clip(n_tokens / 50.0, 0, 1)
    quality = np.clip(
        0.4 * length_score + 0.4 * np.clip(stopword_ratio * 5, 0, 1) + 0.2 * (1 - punct_ratio * 5),
        0,
        1,
    )
    out = batch
    for name, arr in [
        ("n_chars_calc", n_chars),
        ("n_tokens", n_tokens),
        ("mean_token_len", mean_token_len),
        ("punct_ratio", punct_ratio),
        ("stopword_ratio", stopword_ratio),
        ("upper_ratio", upper_ratio),
        ("quality_score", quality),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


def count_tokens(text: str) -> int:
    """BPE-ish token count: words + punctuation marks."""
    return len(_BPE_RE.findall(text))


def add_token_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    ws = pa.array(
        [len(_WS_RE.split(t.strip())) if (t or "").strip() else 0 for t in batch.column(text_column).to_pylist()],
        type=pa.int64(),
    )
    bpe = pa.array(
        [count_tokens(t or "") for t in batch.column(text_column).to_pylist()],
        type=pa.int64(),
    )
    return batch.append_column("ws_tokens", ws).append_column("bpe_tokens", bpe)


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint(text: str) -> int:
    """FNV-1a rolling hash over the whitespace-normalized token stream —
    an order-sensitive document fingerprint (exact-duplicate key that is
    whitespace-insensitive)."""
    h = _FP_OFFSET
    with np.errstate(over="ignore"):
        for tok in _WS_RE.split(text.strip()):
            for b in tok.encode("utf-8"):
                h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
            h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def add_fingerprint(batch: pa.Table, text_column: str = "text") -> pa.Table:
    fps = pa.array(
        [fingerprint(t or "") for t in batch.column(text_column).to_pylist()],
        type=pa.uint64(),
    )
    return batch.append_column("fingerprint", fps)


def whitespace_token_lists(batch: pa.Table, text_column: str = "text") -> pa.ListArray:
    """Whitespace tokens of trimmed text as one Arrow ListArray — parity
    with SQL `regexp_split_to_array(trim(text), '\\s+')`, with '' -> []."""
    txt = pc.utf8_trim_whitespace(batch.column(text_column).combine_chunks())
    toks = pc.utf8_split_whitespace(txt)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")  # '' splits to [''] in Arrow; SQL gives []
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)
    if len(offsets) > 1:
        new_counts = np.add.reduceat(
            np.concatenate([keep_np.astype(np.int64), [0]]), offsets[:-1]
        )
        new_counts[offsets[:-1] == offsets[1:]] = 0  # empty lists
    else:
        new_counts = np.zeros(0, dtype=np.int64)
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()), flat.filter(keep)
    )


def repetition_stats(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
    documents dominated by a few repeated n-grams are boilerplate. Emits
    EXACT integers only — n_bigrams, top_bigram_count (count of the most
    frequent word 2-gram), dup_trigram_tokens (trigram instances whose
    trigram occurs >= 2x in the doc) — so ratio thresholds like
    top_bigram_count / n_bigrams stay caller-side floats and the SQL twin
    matches bit-for-bit. Stateless map_batches kernel: no exchange."""
    import pandas as pd

    schema = pa.schema(
        [
            pa.field(id_column, pa.int64()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("top_bigram_count", pa.int64()),
            pa.field("dup_trigram_tokens", pa.int64()),
        ]
    )
    if batch.num_rows == 0 or text_column not in batch.column_names:
        return schema.empty_table()
    batch = batch.combine_chunks()
    toks = whitespace_token_lists(batch, text_column)
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    n_tok = np.diff(offsets)
    n_rows = batch.num_rows
    doc_rep = np.repeat(np.arange(n_rows), n_tok)
    ids = batch.column(id_column).to_numpy(zero_copy_only=False)
    top_bi = np.zeros(n_rows, dtype=np.int64)
    dup_tri = np.zeros(n_rows, dtype=np.int64)

    def _gram_counts(k: int):
        """(doc ordinal, gram string, count) for word k-grams, vectorized:
        Arrow slice + binary_join for composition, pandas groupby for the
        within-batch counting."""
        n = len(flat)
        if n < k:
            return None
        parts = [flat.slice(i, n - k + 1) for i in range(k)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = doc_rep[: n - k + 1] == doc_rep[k - 1 :]
        if not valid.any():
            return None
        df = pd.DataFrame(
            {
                "d": doc_rep[: n - k + 1][valid],
                "g": grams.to_numpy(zero_copy_only=False)[valid],
            }
        )
        return df.groupby(["d", "g"], sort=False).size().reset_index(name="c")

    bi = _gram_counts(2)
    if bi is not None:
        m = bi.groupby("d", sort=False)["c"].max()
        top_bi[m.index.to_numpy()] = m.to_numpy()
    tri = _gram_counts(3)
    if tri is not None:
        d = tri.loc[tri["c"] >= 2].groupby("d", sort=False)["c"].sum()
        dup_tri[d.index.to_numpy()] = d.to_numpy()
    return pa.table(
        {
            id_column: pa.array(ids.astype(np.int64)),
            "n_bigrams": pa.array(np.maximum(n_tok - 1, 0).astype(np.int64)),
            "top_bigram_count": pa.array(top_bi),
            "dup_trigram_tokens": pa.array(dup_tri),
        },
        schema=schema,
    )


def lexical_diversity(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-doc lexical-concentration stats over whitespace tokens, all
    exact int64: token count, distinct-token count, and the Simpson
    collision numerator sum(c_i * (c_i - 1)) (repeated-token pair mass —
    0 means every token distinct). Docs with no tokens are dropped so the
    output stays dense. Row-local: pure map_batches, no exchange."""
    import pandas as pd

    empty = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("n_unique", pa.int64()),
            pa.field("simpson_num", pa.int64()),
        ]
    ).empty_table()
    if batch.num_rows == 0 or text_column not in batch.column_names:
        return empty
    toks = whitespace_token_lists(batch, text_column)
    flat = toks.values.to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return empty
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    # per-(doc, token) multiplicities: exact two-level factorize (string
    # equality, no hashing — collisions would silently merge tokens)
    tok_codes, tok_uniques = pd.factorize(flat, sort=False)
    pair_key = doc_idx * np.int64(len(tok_uniques)) + tok_codes
    codes, _ = pd.factorize(pair_key, sort=False)
    c = np.bincount(codes).astype(np.int64)
    per_doc_of_code = np.zeros(len(c), dtype=np.int64)
    per_doc_of_code[codes] = doc_idx  # any occurrence maps code -> its doc
    n_unique = np.bincount(
        per_doc_of_code, minlength=batch.num_rows
    ).astype(np.int64)
    simpson = np.bincount(
        per_doc_of_code, weights=c * (c - 1), minlength=batch.num_rows
    ).astype(np.int64)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    has = counts > 0
    return pa.table(
        {
            "doc_id": pa.array(ids[has], type=pa.int64()),
            "n_tokens": pa.array(counts[has]),
            "n_unique": pa.array(n_unique[has]),
            "simpson_num": pa.array(simpson[has]),
        }
    )
