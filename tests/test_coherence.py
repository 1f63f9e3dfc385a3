"""Embedding coherence: exact n-scaled distances vs a float reference."""

import numpy as np


def test_embedding_coherence_exact(ray_session):
    import ray.data

    from opentapioca_ray.stages.cluster import embedding_coherence

    rng = np.random.default_rng(29)
    rows = []
    # two tight clusters + planted outliers
    for lb, center in ((0, 0.2), (1, -0.3)):
        for i in range(40):
            v = center + rng.normal(0, 0.01, 8)
            rows.append({"label": lb, "embedding": [float(x) for x in v]})
    # outlier members, far from their label centroid
    rows.append({"label": 0, "embedding": [0.9] * 8})
    rows.append({"label": 1, "embedding": [0.9] * 8})

    scale = 10_000
    out = (
        embedding_coherence(
            ray.data.from_items(rows).repartition(3),
            scale=scale,
            outlier_dist_units=5_000,  # dist > 0.5
        )
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    # reference in exact ints
    for lb in (0, 1):
        X = np.array(
            [
                np.rint(np.array(r["embedding"]) * scale).astype(np.int64)
                for r in rows
                if r["label"] == lb
            ]
        )
        n = len(X)
        S = X.sum(axis=0)
        d2 = ((X * n - S) ** 2).sum(axis=1)
        thr = 5_000 * 5_000 * n * n
        assert out.loc[lb, "n"] == n
        assert out.loc[lb, "n_outliers"] == int((d2 > thr).sum())
        assert out.loc[lb, "max_d2"] == int(d2.max())
        assert out.loc[lb, "n_outliers"] == 1  # exactly the planted one
