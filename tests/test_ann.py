import numpy as np
import pytest


def make_vectors(n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim)


def brute_force_oracle(corpus, queries, k):
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = unit(queries) @ unit(corpus).T
    return [set(np.argsort(-sims[i])[:k]) for i in range(len(queries))]


def test_brute_force_topk_matches_oracle(ray_session):
    import ray.data

    from opentapioca_ray.stages.ann import brute_force_topk

    corpus = make_vectors()
    queries = corpus[:3] + 0.01
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": list(v)} for i, v in enumerate(corpus)]
    )
    out = brute_force_topk(ds, queries, [100, 101, 102], k=5).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["cosine"], r["vec_id"]))
    oracle = brute_force_oracle(corpus, queries, 5)
    for qi, qid in enumerate([100, 101, 102]):
        ids = {v for _, v in got[qid]}
        assert ids == oracle[qi]
        assert len(got[qid]) == 5


def test_ivf_recall(ray_session):
    import ray.data

    from opentapioca_ray.stages.ann import brute_force_topk, ivf_topk, train_centroids

    corpus = make_vectors(n=200, dim=8, seed=11)
    queries = corpus[:5] + 0.005
    items = [{"vec_id": i, "embedding": list(v)} for i, v in enumerate(corpus)]
    ds = ray.data.from_items(items)
    centroids = train_centroids(ds, n_centroids=8)
    out = ivf_topk(ds, queries, list(range(5)), centroids, k=5, nprobe=4).take_all()
    oracle = brute_force_oracle(corpus, queries, 5)
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # nearest neighbor (the perturbed self) must be found; recall@5 >= 3/5
    for qi in range(5):
        assert qi in got[qi]
        assert len(got[qi] & oracle[qi]) >= 3


def test_cosine_threshold_join(ray_session):
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.ann import cosine_threshold_join

    rows = [
        {"vec_id": 10, "embedding": [1.0, 0.0]},   # cos 1.0 with q0
        {"vec_id": 11, "embedding": [0.0, 1.0]},   # cos 0.0 with q0, 1.0 q1
        {"vec_id": 12, "embedding": [1.0, 1.0]},   # cos ~0.707 with both
    ]
    out = cosine_threshold_join(
        ray.data.from_items(rows).repartition(2),
        queries=np.array([[1.0, 0.0], [0.0, 1.0]]),
        query_ids=[0, 1],
        threshold=0.5,
    ).to_pandas()
    got = {(r["query_id"], r["vec_id"]): r["cos_e6"] for _, r in out.iterrows()}
    assert got == {
        (0, 10): 1_000_000,
        (0, 12): 707_107,
        (1, 11): 1_000_000,
        (1, 12): 707_107,
    }


def _pq_brute(corpus, queries, codebook, k):
    """Driver-side replay of pq_topk's exact integer semantics."""
    M, C, dsub = codebook.shape
    vz = np.rint(corpus * 1e6).astype(np.int64)
    qz = np.rint(queries * 1e6).astype(np.int64)
    codes = np.zeros((len(vz), M), dtype=np.int64)
    for m in range(M):
        d = (
            (vz[:, None, m * dsub : (m + 1) * dsub] - codebook[m][None]) ** 2
        ).sum(axis=2)
        codes[:, m] = d.argmin(axis=1)
    out = {}
    for qi in range(len(qz)):
        adc = np.zeros(len(vz), dtype=np.int64)
        for m in range(M):
            lut = ((qz[qi, m * dsub : (m + 1) * dsub][None] - codebook[m]) ** 2).sum(
                axis=1
            )
            adc += lut[codes[:, m]]
        order = sorted(range(len(vz)), key=lambda i: (adc[i], i))[:k]
        out[qi] = [(i, int(adc[i])) for i in order]
    return out


def test_pq_topk_exact_semantics(ray_session):
    import ray.data

    from opentapioca_ray.stages.ann import pq_topk

    corpus = make_vectors(n=300, dim=16, seed=5)
    queries = corpus[:4] + 0.003
    codebook = np.rint(corpus[10:18] * 1e6).astype(np.int64)  # (8, 16)
    codebook = np.stack([codebook[:, :8], codebook[:, 8:]])  # (M=2, C=8, 8)
    items = [{"vec_id": i, "embedding": list(v)} for i, v in enumerate(corpus)]
    out = pq_topk(
        ray.data.from_items(items).repartition(6),
        queries,
        list(range(4)),
        codebook,
        k=7,
    ).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["adc_e12"]))
    exp = _pq_brute(corpus, queries, codebook, 7)
    for qi in range(4):
        assert sorted(got[qi]) == sorted(exp[qi])


def test_pq_recall_against_brute_force(ray_session):
    """PQ with a 4x16 codebook over clustered data finds the perturbed
    self and keeps reasonable recall@5 — the approximation property."""
    import ray.data

    from opentapioca_ray.stages.ann import pq_topk

    rng = np.random.RandomState(9)
    centers = rng.randn(10, 16) * 3
    corpus = np.vstack([c + rng.randn(20, 16) * 0.05 for c in centers])
    queries = corpus[::40][:5] + 0.002
    codebook = np.stack(
        [
            np.rint(centers[:, :8] * 1e6).astype(np.int64),
            np.rint(centers[:, 8:] * 1e6).astype(np.int64),
        ]
    )
    items = [{"vec_id": i, "embedding": list(v)} for i, v in enumerate(corpus)]
    out = pq_topk(
        ray.data.from_items(items).repartition(4),
        queries,
        list(range(5)),
        codebook,
        k=20,
    ).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qi in range(5):
        # the query's own cluster (its 20 members) is what PQ must retrieve
        cluster = set(range((qi * 40 // 20) * 20, (qi * 40 // 20) * 20 + 20))
        assert len(got[qi] & cluster) >= 15


def test_hard_negatives_excludes_same_label(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.ann import hard_negatives

    # anchors 1/2 share label 0; 3/4 have label 1. vec 2 is identical to
    # vec 3 (cosine 1.0) — the hardest cross-label negative.
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [
                [1.0, 0.0],
                [0.0, 1.0],
                [0.0, 1.0],
                [1.0, 1.0],
            ],
            "label": [0, 0, 1, 1],
        }
    )
    out = hard_negatives(ray.data.from_pandas(df), k=1).to_pandas()
    got = {r.anchor_id: (r.neg_id, r.cosine, r.rank) for r in out.itertuples()}
    assert got[2] == (3, 1.0, 1)       # identical cross-label vector
    assert got[3] == (2, 1.0, 1)
    assert got[1][0] == 4              # 45 degrees beats orthogonal
    assert abs(got[1][1] - 0.707107) < 1e-6
    assert set(out["anchor_id"]) == {1, 2, 3, 4}
    # never a same-label or self pair
    lbl = dict(zip(df.vec_id, df.label))
    for r in out.itertuples():
        assert lbl[r.anchor_id] != lbl[r.neg_id]


def test_hard_negatives_single_label_empty(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.ann import hard_negatives

    df = pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [[1.0, 0.0], [0.0, 1.0]],
            "label": [7, 7],
        }
    )
    out = hard_negatives(ray.data.from_pandas(df), k=3).to_pandas()
    assert len(out) == 0


def test_mutual_best_cross_label(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.ann import mutual_best_cross_label

    # 1 (label 0) and 3 (label 1) are identical -> mutual best.
    # 2 (label 0) points at 3 as its best, but 3 prefers 1 -> not mutual.
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[0.0, 1.0], [1.0, 1.0], [0.0, 1.0]],
            "label": [0, 0, 1],
        }
    )
    out = mutual_best_cross_label(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.u, r.v, r.cosine) == (1, 3, 1.0)


def test_embedding_outliers_exact_integers(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.ann import embedding_outliers

    # label 0: x=[0.0] and [0.2] -> quantized 0 and 2000, n=2, sum=2000.
    # dist2 = (2*0 - 2000)^2 = 4e6 for both (symmetric).
    # label 1: single vector -> distance 0 (n*x - s = 0).
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[0.0], [0.2], [0.9]],
            "label": [0, 0, 1],
        }
    )
    out = (
        embedding_outliers(ray.data.from_pandas(df), scale=10_000)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.loc[1, "dist2_scaled"] == 2000**2
    assert out.loc[2, "dist2_scaled"] == 2000**2
    assert out.loc[3, "dist2_scaled"] == 0
    assert out.loc[1, "n"] == 2 and out.loc[3, "n"] == 1
