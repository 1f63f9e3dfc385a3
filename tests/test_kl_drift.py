"""Token KL drift: exact micro-nat quantization vs a literal reference."""

import numpy as np


def _ref_kl(docs):
    from collections import Counter

    c0, c1 = Counter(), Counter()
    for doc_id, text in docs:
        toks = text.split()
        (c0 if doc_id % 2 == 0 else c1).update(toks)
    vocab = sorted(set(c0) | set(c1))
    t0, t1, v = sum(c0.values()), sum(c1.values()), len(vocab)
    kl = 0
    for w in vocab:
        p0 = (c0[w] + 1.0) / (t0 + v)
        p1 = (c1[w] + 1.0) / (t1 + v)
        kl += int(np.floor(1e6 * p0 * np.log(p0 / p1) + 0.5))
    return v, t0, t1, kl


def test_kl_drift_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import token_kl_drift

    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(20)]
    docs = []
    for d in range(30):
        # skew the odd half toward the low-index words -> nonzero drift
        probs = np.ones(20) / 20 if d % 2 == 0 else np.linspace(2, 0.1, 20)
        probs = probs / probs.sum()
        n = int(rng.integers(5, 30))
        docs.append((d, " ".join(rng.choice(words, size=n, p=probs))))

    v, t0, t1, kl = _ref_kl(docs)
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]
    ).repartition(3)
    out = token_kl_drift(ds).to_pandas()
    assert int(out["v"][0]) == v
    assert int(out["t0"][0]) == t0
    assert int(out["t1"][0]) == t1
    assert int(out["kl_e6"][0]) == kl
    assert kl != 0  # the planted skew must register as drift


def test_kl_drift_identical_halves_is_zero(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import token_kl_drift

    rows = [{"doc_id": d, "text": "alpha beta gamma"} for d in range(10)]
    out = token_kl_drift(ray.data.from_items(rows)).to_pandas()
    assert int(out["kl_e6"][0]) == 0
