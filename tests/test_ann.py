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
