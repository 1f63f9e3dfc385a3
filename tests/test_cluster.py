import numpy as np


def blob_rows(n_per=40, dim=8, seed=7):
    """Three well-separated unit-sphere blobs."""
    rng = np.random.RandomState(seed)
    centers = np.eye(3, dim) * 10.0
    rows = []
    vid = 0
    for c in range(3):
        pts = centers[c] + rng.randn(n_per, dim) * 0.05
        for p in pts:
            rows.append({"vec_id": vid, "embedding": p.tolist(), "true": c})
            vid += 1
    return rows


def test_kmeans_recovers_blobs(ray_session):
    import ray.data

    from opentapioca_ray.stages.cluster import kmeans_assign, kmeans_fit

    rows = blob_rows()
    ds = ray.data.from_items(rows)
    cents = kmeans_fit(ds, k=3, iters=5)
    assert cents.shape == (3, 8)
    out = kmeans_assign(ds, cents).take_all()
    label = {r["vec_id"]: r["cluster"] for r in out}
    truth = {r["vec_id"]: r["true"] for r in rows}
    # every true blob maps to exactly one k-means cluster (purity 1.0)
    mapping = {}
    for vid, t in truth.items():
        mapping.setdefault(t, set()).add(label[vid])
    assert all(len(s) == 1 for s in mapping.values())
    assert len({next(iter(s)) for s in mapping.values()}) == 3


def test_kmeans_deterministic(ray_session):
    import ray.data

    from opentapioca_ray.stages.cluster import kmeans_fit

    ds = ray.data.from_items(blob_rows())
    a = kmeans_fit(ds, k=3, iters=3)
    b = kmeans_fit(ds, k=3, iters=3)
    assert np.array_equal(a, b)


def test_kmeans_assign_cosine_in_range(ray_session):
    import ray.data

    from opentapioca_ray.stages.cluster import kmeans_assign, kmeans_fit

    ds = ray.data.from_items(blob_rows(n_per=10))
    cents = kmeans_fit(ds, k=3, iters=2)
    out = kmeans_assign(ds, cents).take_all()
    assert all(-1.0 <= r["cosine"] <= 1.0 + 1e-12 for r in out)
    assert all(0 <= r["cluster"] < 3 for r in out)
