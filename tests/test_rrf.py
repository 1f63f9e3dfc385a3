"""Reciprocal-rank fusion: exact integer terms, inner-join semantics."""

import numpy as np


def test_rrf_fuse_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import rrf_fuse

    rng = np.random.default_rng(23)
    ids = list(range(1, 41))
    perm_a = rng.permutation(ids)
    perm_b = rng.permutation(ids)
    ra = [{"id": int(v), "rn": i + 1} for i, v in enumerate(perm_a)]
    rb = [{"id": int(v), "rn": i + 1} for i, v in enumerate(perm_b)]
    # drop some ids from b -> must disappear from the fused output
    rb = [r for r in rb if r["id"] % 7 != 0]

    out = rrf_fuse(
        ray.data.from_items(ra).repartition(3),
        ray.data.from_items(rb).repartition(2),
        "id",
        k=60,
    ).to_pandas()
    got = out.set_index("id")
    rb_map = {r["id"]: r["rn"] for r in rb}
    ra_map = {r["id"]: r["rn"] for r in ra}
    expect_ids = {i for i in ids if i % 7 != 0}
    assert set(got.index) == expect_ids
    for i in expect_ids:
        want = int(np.floor(1e9 / (60 + ra_map[i]) + 0.5)) + int(
            np.floor(1e9 / (60 + rb_map[i]) + 0.5)
        )
        assert got.loc[i, "rrf_e9"] == want
        assert got.loc[i, "rank_a"] == ra_map[i]
        assert got.loc[i, "rank_b"] == rb_map[i]
