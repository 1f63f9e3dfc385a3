"""Greedy set-cover coreset selection (__ray_entry__.coreset_cover)."""

import sys

sys.path.insert(0, "/root/repo")


def test_greedy_cover_properties(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["coreset_cover"]("/root/testdata/sf0.001")
    # rounds in order; marginal gains are non-increasing (greedy invariant)
    assert list(out["round"]) == list(range(len(out)))
    gains = list(out["gain"])
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    assert (out["gain"] > 0).all()
    # cumulative coverage equals the running sum of marginal gains
    assert list(out["covered_total"]) == list(out["gain"].cumsum())
    # deterministic: a second run returns the identical table
    out2 = entry.queries()["coreset_cover"]("/root/testdata/sf0.001")
    assert out.equals(out2)


def test_join_sample_estimate_unbiased_shape(ray_session):
    """Correlated sampling keeps the estimator within a sane band of the
    exact join size (20% of keys -> ~5x scale-up; md5 sampling is
    deterministic so the band is fixed, and est = sampled * 5 exactly)."""
    import __ray_entry__ as entry

    out = entry.queries()["join_sample_estimate"]("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert r["est_pairs"] == r["sampled_pairs"] * 100 // 20
    assert 0 < r["sampled_pairs"] <= r["exact_pairs"]
    # within 3x either way — key-correlated sampling of a near-uniform
    # degree distribution; independent ROW sampling at 20% would give
    # ~0.04x, so this also guards the correlated property
    assert r["exact_pairs"] / 3 <= r["est_pairs"] <= r["exact_pairs"] * 3
