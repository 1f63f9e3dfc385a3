"""Per-dimension embedding profile: exact integer stats."""

import numpy as np


def test_dim_profile_exact(ray_session):
    import ray.data

    from opentapioca_ray.stages.cluster import embedding_dim_profile

    rng = np.random.default_rng(43)
    V = rng.uniform(-1, 1, (50, 6))
    rows = [{"embedding": [float(x) for x in v]} for v in V]
    out = (
        embedding_dim_profile(
            ray.data.from_items(rows).repartition(3), scale=1000
        )
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    X = np.rint(V * 1000).astype(np.int64)
    assert list(out.index) == list(range(6))
    for d in range(6):
        assert out.loc[d, "n"] == 50
        assert out.loc[d, "sum_u"] == X[:, d].sum()
        assert out.loc[d, "sumsq_u"] == (X[:, d] ** 2).sum()
        assert out.loc[d, "min_u"] == X[:, d].min()
        assert out.loc[d, "max_u"] == X[:, d].max()
