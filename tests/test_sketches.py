"""KMV distinct sketch: exactness under K, accuracy over K, determinism."""
import numpy as np
import ray.data

from opentapioca_ray.stages.sketches import _k_smallest, _md5_u64, approx_distinct


def test_k_smallest_kernel():
    g = np.array(["a", "a", "a", "b", "a"], dtype=object)
    hv = np.array([5, 3, 3, 9, 7], dtype=np.uint64)
    g2, hv2 = _k_smallest(g, hv, 2)
    assert list(zip(g2, hv2.tolist())) == [("a", 3), ("a", 5), ("b", 9)]


def test_md5_u64_matches_reference_convention():
    import hashlib

    vals = np.array(["42", "x"], dtype=object)
    got = _md5_u64(vals)
    want = [
        int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in vals
    ]
    assert got.tolist() == want


def test_approx_distinct_exact_under_k(ray_session):
    rows = [{"g": "a", "v": i % 17} for i in range(300)] + [
        {"g": "b", "v": i % 5} for i in range(50)
    ]
    got = {
        r["g"]: r["n_approx"]
        for r in approx_distinct(
            ray.data.from_items(rows), "g", "v", k=64
        ).take_all()
    }
    assert got == {"a": 17, "b": 5}  # both groups under K -> exact


def test_approx_distinct_accuracy_over_k(ray_session):
    # 5000 distinct values, K=256 -> relative error ~6%; assert 4 sigma
    rows = [{"g": "a", "v": i} for i in range(5000)]
    got = approx_distinct(ray.data.from_items(rows), "g", "v", k=256).take_all()
    est = got[0]["n_approx"]
    assert abs(est - 5000) / 5000 < 0.25


def test_hll_distinct_register_state_matches_reference_hash(ray_session):
    """Registers are derived from the md5-u64 convention: recompute them
    row-by-row in pure Python and compare the integer register summaries."""
    import hashlib

    from opentapioca_ray.stages.sketches import hll_distinct

    rows = [{"g": "a", "v": i % 37} for i in range(200)] + [
        {"g": "b", "v": i} for i in range(900)
    ]
    got = {
        r["g"]: r
        for r in hll_distinct(ray.data.from_items(rows), "g", "v").take_all()
    }

    for gname, vals in (("a", range(37)), ("b", range(900))):
        M = [0] * 256
        for v in vals:
            hv = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
            reg = hv >> 56
            suffix = hv & ((1 << 56) - 1)
            rho = 57 - suffix.bit_length()
            M[reg] = max(M[reg], rho)
        assert got[gname]["sum_rho"] == sum(M)
        assert got[gname]["n_registers_zero"] == M.count(0)


def test_hll_distinct_accuracy(ray_session):
    # 256 registers -> ~6.5% standard error; assert a loose 4-sigma band
    from opentapioca_ray.stages.sketches import hll_distinct

    rows = [{"g": "a", "v": i} for i in range(10_000)]
    got = hll_distinct(ray.data.from_items(rows), "g", "v").take_all()
    est = got[0]["hll_estimate_e2"] / 100.0
    assert abs(est - 10_000) / 10_000 < 0.26


def test_hll_distinct_small_range_linear_counting(ray_session):
    # far below 2.5*m -> linear-counting branch; small counts come out
    # close to exact (LC error at n<<m is tiny)
    from opentapioca_ray.stages.sketches import hll_distinct

    rows = [{"g": "a", "v": i % 12} for i in range(100)]
    got = hll_distinct(ray.data.from_items(rows), "g", "v").take_all()
    est = got[0]["hll_estimate_e2"] / 100.0
    assert abs(est - 12) <= 1.0


def test_count_min_sketch_overestimates_only(ray_session):
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.sketches import cms_estimate, count_min_sketch

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 50, size=3000)
    ds = ray.data.from_items([{"v": int(x)} for x in vals]).repartition(6)
    counters = count_min_sketch(ds, "v", depth=4, width=32).to_pandas()
    # total mass per row equals the stream length
    assert (counters.groupby("row")["n"].sum() == len(vals)).all()
    uniq, exact = np.unique(vals, return_counts=True)
    est = cms_estimate(counters, uniq, depth=4, width=32)
    assert (est >= exact).all()
    # with 50 keys in 32 buckets x 4 rows, the min-row estimate is tight
    # for most keys (collisions must align across ALL rows to inflate it)
    assert (est == exact).mean() > 0.5


def test_cms_estimate_missing_value_is_zero(ray_session):
    import numpy as np
    import ray.data

    from opentapioca_ray.stages.sketches import cms_estimate, count_min_sketch

    ds = ray.data.from_items([{"v": 1}, {"v": 1}, {"v": 2}])
    counters = count_min_sketch(ds, "v", depth=4, width=64).to_pandas()
    est = cms_estimate(counters, np.array([999999]), depth=4, width=64)
    # an unseen value reads 0 unless every row collides with seen keys
    assert est[0] <= 2


def test_ams_f2_estimator_shape(ray_session):
    """AMS median-of-6 lands within an order of magnitude of the exact
    second moment on the real table (fixed md5 signs -> deterministic)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["ams_f2"]("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert r["min_est"] <= r["median_est_pairs"] <= r["max_est"]
    assert r["exact_pairs"] > 0
    # 6 independent +-1 sketches: median within ~10x of truth on this data
    assert r["exact_pairs"] // 10 <= r["median_est_pairs"] <= r["exact_pairs"] * 10
