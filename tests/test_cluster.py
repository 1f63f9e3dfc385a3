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


def test_kmedoids_exact_assignment(ray_session):
    """k-medoids on planted L1 blobs: medoids land inside the blobs and
    every point maps to its own blob's medoid; deterministic reruns."""
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.cluster import kmedoids_fit_assign

    rng = np.random.default_rng(8)
    rows = []
    for b in range(3):
        center = np.zeros(4)
        center[b % 4] = 5.0
        for i in range(30):
            v = center + rng.normal(0, 0.05, 4)
            rows.append(
                {"vec_id": b * 100 + i, "embedding": list(v) + [0.0] * 4}
            )
    ds = ray.data.from_items(rows)
    out = kmedoids_fit_assign(ds, k=3, rounds=2, dims=4, n_parts=4)
    lab = dict(zip(out["vec_id"], out["medoid"]))
    # each blob resolves to one medoid, and medoids separate the blobs
    blobs = {b: {lab[b * 100 + i] for i in range(30)} for b in range(3)}
    for b, ms in blobs.items():
        assert len(ms) == 1, (b, ms)
        (m,) = ms
        assert b * 100 <= m < b * 100 + 30  # medoid is a blob member
    out2 = kmedoids_fit_assign(ds, k=3, rounds=2, dims=4, n_parts=4)
    assert out.sort_values("vec_id").reset_index(drop=True).equals(
        out2.sort_values("vec_id").reset_index(drop=True)
    )


def test_semdedup_keeps_one_per_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.cluster import semdedup

    # three identical-direction vectors (ids 1,2,3) + one far vector.
    # All land in one k=1 cluster; cosine(1,2)=cosine(1,3)=1 -> one
    # group keeps min id 1. Vector 9 is its own rep.
    rng = np.random.RandomState(0)
    base = rng.rand(8)
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 9],
            "embedding": [
                list(base),
                list(base * 2),
                list(base * 0.5),
                list(-base),
            ],
            "label": [0, 0, 0, 0],
        }
    )
    out = (
        semdedup(ray.data.from_pandas(df), tau=0.99, k=1, rounds=1, dims=4)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.loc[1, "keep"] == 1 and out.loc[1, "rep"] == 1
    assert out.loc[2, "keep"] == 0 and out.loc[2, "rep"] == 1
    assert out.loc[3, "keep"] == 0 and out.loc[3, "rep"] == 1
    assert out.loc[9, "keep"] == 1 and out.loc[9, "rep"] == 9


def test_silhouette_kmedoids_hand_case(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.cluster import silhouette_kmedoids

    # two tight groups on a line (dims=1): {0.0, 0.1} and {1.0, 1.1}.
    # k=2 medoids split them; for a member at distance a from its own
    # medoid and b from the other, s = (b-a)/max
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [[0.0], [0.1], [1.0], [1.1]],
            "label": [0, 0, 0, 0],
        }
    )
    out = (
        silhouette_kmedoids(ray.data.from_pandas(df), k=2, rounds=2, dims=1)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert len(out) == 4
    # the two medoid points themselves: a=0 -> s = 1e6
    assert (out["s_e6"] == 1_000_000).sum() == 2
    # non-medoid members: a=100000 units, b to the other medoid is large
    # -> s positive and well above 0.5e6 for this separation
    assert (out["s_e6"] > 500_000).all()
    assert set(out["medoid"].unique()).issubset({1, 2, 3, 4})
