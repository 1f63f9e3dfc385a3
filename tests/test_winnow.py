"""Winnowing fingerprints (Schleimer et al. 2003): selection kernel
properties and the distributed pair count."""

import numpy as np
import pyarrow as pa
import pytest


def _fps(texts, k=3, w=4):
    from opentapioca_ray.stages.winnow import winnow_fingerprint_rows

    batch = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    t = winnow_fingerprint_rows(batch, k=k, w=w)
    out = {}
    for doc, fp in zip(
        t.column("doc_id").to_pylist(), t.column("fp").to_pylist()
    ):
        out.setdefault(doc, set()).add(fp)
    return out


def _reference_winnow(tokens, k=3, w=4):
    """Row-by-row reference: rightmost minimal md5-u64 gram hash per
    window."""
    import hashlib

    if not tokens:
        return set()
    if len(tokens) < k:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hv = [
        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
        for g in grams
    ]
    m = len(hv)
    sel = set()
    for e in range(min(w, m) - 1, m):
        lo = max(0, e - w + 1)
        best = min(range(lo, e + 1), key=lambda j: (hv[j], -j))
        sel.add(best)
    return {np.uint64(hv[j]).astype(np.int64).item() for j in sel}


def test_matches_rowwise_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two",  # shorter than k -> single whole-doc gram
        "",  # empty -> no fingerprints
        "a b c d",  # m = 2 grams < w -> degenerate window
    ]
    got = _fps(texts)
    for i, t in enumerate(texts):
        want = _reference_winnow(t.split())
        assert got.get(i, set()) == want, f"doc {i}"


def test_winnowing_guarantee_shared_run():
    # any shared token run of length >= w + k - 1 = 6 must yield at least
    # one shared fingerprint (the paper's correctness property)
    run = "lorem ipsum dolor sit amet consectetur"  # 6 tokens
    a = "xx yy zz " + run + " pp qq"
    b = "mm nn " + run + " rr ss tt uu"
    got = _fps([a, b])
    assert got[0] & got[1]


def test_density_about_two_over_w_plus_one():
    rng = np.random.default_rng(7)
    toks = [f"w{int(x)}" for x in rng.integers(0, 50_000, size=2_000)]
    got = _fps([" ".join(toks)], k=3, w=4)
    n_grams = 2_000 - 2
    density = len(got[0]) / n_grams
    # expected 2/(w+1) = 0.4 for random hashes
    assert 0.3 < density < 0.5


def test_pairs_partition_invariant(ray_session):
    import ray.data

    from opentapioca_ray.stages.winnow import winnow_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [{"doc_id": i, "text": base + f" tail{i}"} for i in range(6)] + [
        {"doc_id": 100 + i, "text": f"solo{i} " * 10} for i in range(4)
    ]

    def run(nblocks):
        ds = ray.data.from_items(rows).repartition(nblocks)
        out = winnow_pairs(ds, min_shared=2).to_pandas()
        return set(
            zip(out["u"].tolist(), out["v"].tolist(), out["n_shared"].tolist())
        )

    one, many = run(1), run(5)
    assert one == many
    # the 6 near-identical docs must all pair up
    assert len([p for p in one if p[0] < 100 and p[1] < 100]) == 15
