"""Histogram-narrowing exact selection: parity with a literal sort."""

import numpy as np


def _run(vals, rank, ray_session, n_buckets=16):
    import ray.data

    from opentapioca_ray.stages.aggregates import exact_kth_narrowing

    ds = ray.data.from_items([{"c": int(v)} for v in vals]).repartition(4)
    out = exact_kth_narrowing(ds, "c", rank=rank, n_buckets=n_buckets).to_pandas()
    return int(out["kth"][0]), int(out["n"][0]), int(out["k"][0])


def test_kth_matches_sort_many_ranks(ray_session):
    rng = np.random.default_rng(37)
    vals = rng.integers(-10**9, 10**9, 300)
    s = np.sort(vals)
    for rank in (1, 2, 77, 150, 151, 299, 300):
        kth, n, k = _run(vals, rank, ray_session)
        assert (kth, n, k) == (int(s[rank - 1]), 300, rank), rank


def test_default_is_lower_median_with_duplicates(ray_session):
    vals = [5, 5, 5, 1, 9, 9]  # sorted: 1 5 5 5 9 9 -> (6+1)//2 = rank 3 -> 5
    kth, n, k = _run(vals, None, ray_session)
    assert (kth, n, k) == (5, 6, 3)


def test_tiny_bucket_count_still_exact(ray_session):
    # n_buckets=2 forces the max number of narrowing rounds
    rng = np.random.default_rng(41)
    vals = rng.integers(0, 10**6, 200)
    s = np.sort(vals)
    import ray.data

    from opentapioca_ray.stages.aggregates import exact_kth_narrowing

    ds = ray.data.from_items([{"c": int(v)} for v in vals]).repartition(3)
    out = exact_kth_narrowing(ds, "c", rank=100, n_buckets=2, max_rounds=64).to_pandas()
    assert int(out["kth"][0]) == int(s[99])
