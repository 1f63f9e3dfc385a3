"""Vectorized American Soundex (NARA variant) — phonetic blocking keys.

Classic ER blocking: names that sound alike get the same 4-char code
(first letter + 3 digit classes), so typo'd / transliterated variants
land in one block without any pairwise string comparison. The reference
blocks candidates by exact surface tokens (tagger.py:61-69); phonetic
codes are the standard complementary pass every linkage toolkit ships.

NARA rules implemented (pinned by the canonical test vectors ROBERT→
R163, ASHCRAFT→A261, TYMCZAK→T522, PFISTER→P236, HONEYMAN→H555):
letters map to digit classes (AEIOUY→0, BFPV→1, CGJKQSXZ→2, DT→3, L→4,
MN→5, R→6); H/W are transparent (removed before run-collapse, so same
classes separated by H/W merge); vowels break runs then drop; the first
letter's whole run is consumed by the prefix letter.

The kernel is one pass over a flattened char array with word-boundary
masks — no per-word Python loop — exactly mirrored by the DuckDB SQL in
the oracle (translate + indexed list_filter collapse).
"""

from __future__ import annotations

import numpy as np

# char code -> soundex class byte, identity for H/W (transparent), 0xFF
# for anything non-alpha (callers pre-filter to [A-Za-z]+)
_MAP = np.full(128, 0xFF, dtype=np.uint8)
for _ch, _d in [
    ("AEIOUY", ord("0")),
    ("BFPV", ord("1")),
    ("CGJKQSXZ", ord("2")),
    ("DT", ord("3")),
    ("L", ord("4")),
    ("MN", ord("5")),
    ("R", ord("6")),
]:
    for _c in _ch:
        _MAP[ord(_c)] = _d
        _MAP[ord(_c.lower())] = _d
for _c in "HWhw":
    _MAP[ord(_c)] = ord(_c.upper())


def soundex(words: np.ndarray) -> np.ndarray:
    """Soundex codes for an object array of non-empty ASCII-alpha words.
    Returns an object array of 4-char codes. Fully vectorized: the whole
    batch is one flat uint32 codepoint array + boundary masks."""
    n = len(words)
    if n == 0:
        return np.empty(0, dtype=object)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    flat = np.frombuffer("".join(words).encode("utf-32-le"), dtype=np.uint32)
    wid = np.repeat(np.arange(n, dtype=np.int64), lens)
    first_pos = np.zeros(len(flat), dtype=bool)
    first_pos[np.cumsum(lens) - lens] = True
    codes = _MAP[np.minimum(flat, 127)]
    upper_first = np.char.upper(
        np.array([w[0] for w in words], dtype="U1")
    )  # per-word scalar pick, not a char scan

    # 1. drop H/W (transparent) except at position 0
    hw = (codes == ord("H")) | (codes == ord("W"))
    keep = ~hw | first_pos
    c1, w1, f1 = codes[keep], wid[keep], first_pos[keep]
    # 2. collapse adjacent equal classes within a word
    run_first = np.concatenate(
        ([True], (c1[1:] != c1[:-1]) | (w1[1:] != w1[:-1]))
    ) | f1
    # a kept H/W head must not merge with a following run (its class byte
    # can't equal a digit byte, so the generic rule already handles it)
    c2, w2 = c1[run_first], w1[run_first]
    # 3. drop the head group, then zeros (vowel classes)
    head = np.concatenate(([True], w2[1:] != w2[:-1]))
    keep3 = ~head & (c2 != ord("0"))
    c3, w3 = c2[keep3], w2[keep3]
    # 4. first 3 digits per word, scatter into an (n, 3) '0'-padded grid
    seg_start = np.concatenate(([True], w3[1:] != w3[:-1]))
    seg_id = np.cumsum(seg_start) - 1
    pos = np.arange(len(w3)) - np.flatnonzero(seg_start)[seg_id]
    take = pos < 3
    grid = np.full((n, 3), ord("0"), dtype=np.uint32)
    grid[w3[take], pos[take]] = c3[take]
    tail = grid.astype(np.uint8).tobytes().decode("ascii")
    tails = np.frombuffer(tail.encode("ascii"), dtype="S3").astype("U3")
    return np.char.add(upper_first, tails).astype(object)
