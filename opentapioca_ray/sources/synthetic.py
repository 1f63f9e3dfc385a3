"""Deterministic synthetic `files` corpus with planted near-dup clusters.

Generator for the conformance harness (FIXTURES.md §1/§5): seeded, no
wall-clock. Produces the input_hint-shaped files table plus ground-truth
labeled pairs — positives are planted near-duplicate variants of a base
file (token-level edits), negatives are files from different clusters.
Used by tests, the F1 harness and entry(); scales up for benchmarks.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd

from opentapioca_ray.functions.text import sha256_hex

_LANGS = ["py", "js", "java", "md"]


def _base_content(rng: np.random.RandomState, vocab: int, length: int) -> list[str]:
    return [f"tok{rng.randint(vocab)}_{i % 17}" for i in range(length)]


def _variant(rng: np.random.RandomState, tokens: list[str], edits: int) -> list[str]:
    out = list(tokens)
    for _ in range(edits):
        op = rng.randint(3)
        pos = rng.randint(len(out))
        if op == 0:
            out[pos] = f"edit{rng.randint(10**6)}"
        elif op == 1 and len(out) > 10:
            del out[pos]
        else:
            out.insert(pos, f"ins{rng.randint(10**6)}")
    return out


def synthesize_files(
    n_clusters: int = 40,
    cluster_size: int = 3,
    n_singletons: int = 40,
    length: int = 120,
    edits: int = 4,
    vocab: int = 5000,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (files_df, truth_df).

    files_df: input_hint schema + file_id + sha256.
    truth_df: (left_id, right_id, is_match) — all within-cluster pairs as
    positives plus an equal number of deterministic cross-cluster negatives.
    """
    rng = np.random.RandomState(seed)
    rows = []
    clusters: list[list[int]] = []
    fid = 0

    def add_file(tokens: list[str], cluster: int):
        nonlocal fid
        content = " ".join(tokens)
        repo = f"org{cluster % 10}/proj{cluster % 4}"
        path = f"src/pkg{fid % 7}/mod_{fid}.{_LANGS[fid % 4]}"
        rows.append(
            {
                "file_id": fid,
                "repo": repo,
                "path": path,
                "commit": hashlib.sha1(f"{repo}/{path}@{fid}".encode()).hexdigest(),
                "lang": _LANGS[fid % 4],
                "content": content,
                "sha256": sha256_hex(content),
            }
        )
        fid += 1
        return fid - 1

    for c in range(n_clusters):
        base = _base_content(rng, vocab, length)
        members = [add_file(base, c)]
        for _ in range(cluster_size - 1):
            members.append(add_file(_variant(rng, base, edits), c))
        clusters.append(members)
    for s in range(n_singletons):
        add_file(_base_content(rng, vocab, length), n_clusters + s)

    positives = [
        {"left_id": a, "right_id": b, "is_match": True}
        for members in clusters
        for a, b in itertools.combinations(sorted(members), 2)
    ]
    negatives = []
    all_ids = [m for members in clusters for m in members]
    want = len(positives)
    i = 0
    while len(negatives) < want:
        a = all_ids[i % len(all_ids)]
        b = all_ids[(i * 7 + 13) % len(all_ids)]
        ca = next(k for k, m in enumerate(clusters) if a in m)
        cb = next(k for k, m in enumerate(clusters) if b in m)
        if ca != cb:
            lo, hi = sorted((a, b))
            negatives.append({"left_id": lo, "right_id": hi, "is_match": False})
        i += 1
    truth = pd.DataFrame(positives + negatives).drop_duplicates(
        ["left_id", "right_id"]
    )
    return pd.DataFrame(rows), truth


def pairwise_f1(assignments: dict[int, int], truth: pd.DataFrame) -> dict:
    """Pairwise P/R/F1 of cluster assignments against labeled pairs:
    predicted-match iff both sides share a component."""
    tp = fp = fn = tn = 0
    for r in truth.itertuples():
        ca = assignments.get(r.left_id)
        cb = assignments.get(r.right_id)
        pred = ca is not None and ca == cb
        if r.is_match and pred:
            tp += 1
        elif r.is_match:
            fn += 1
        elif pred:
            fp += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp, "fp": fp, "fn": fn}
