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
