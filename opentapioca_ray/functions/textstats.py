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
