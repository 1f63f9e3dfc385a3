"""2-D Pareto frontier (stages/skyline.py)."""

import numpy as np


def _brute(points):
    """points: list of (maxv, minv). Returns {pair: count} skyline."""
    from collections import Counter

    cnt = Counter(points)
    out = {}
    for p, n in cnt.items():
        dominated = any(
            q[0] >= p[0] and q[1] <= p[1] and q != p for q in cnt
        )
        if not dominated:
            out[p] = n
    return out


def test_sweep_matches_brute_force():
    from opentapioca_ray.stages.skyline import skyline_sweep

    rng = np.random.default_rng(2)
    pts = list(zip(rng.integers(0, 40, 300).tolist(), rng.integers(0, 40, 300).tolist()))
    mx, mn, n = skyline_sweep(
        np.array([p[0] for p in pts], dtype=np.int64),
        np.array([p[1] for p in pts], dtype=np.int64),
        np.ones(len(pts), dtype=np.int64),
    )
    assert dict(zip(zip(mx.tolist(), mn.tolist()), n.tolist())) == _brute(pts)


def test_sweep_handles_duplicates_and_ties():
    from opentapioca_ray.stages.skyline import skyline_sweep

    # (10, 5) twice, dominated (10, 6) and (9, 5); incomparable (8, 4)
    mx = np.array([10, 10, 10, 9, 8], dtype=np.int64)
    mn = np.array([5, 5, 6, 5, 4], dtype=np.int64)
    rx, rn, rw = skyline_sweep(mx, mn, np.ones(5, dtype=np.int64))
    got = dict(zip(zip(rx.tolist(), rn.tolist()), rw.tolist()))
    assert got == {(10, 5): 2, (8, 4): 1}


def test_distributed_frontier_matches_brute(ray_session):
    import ray.data

    from opentapioca_ray.stages.skyline import pareto_frontier

    rng = np.random.default_rng(7)
    pts = list(zip(rng.integers(0, 60, 800).tolist(), rng.integers(0, 60, 800).tolist()))
    ds = ray.data.from_items(
        [{"maxv": a, "minv": b} for a, b in pts]
    ).repartition(8)
    out = pareto_frontier(ds, "maxv", "minv", n_parts=4)
    got = {
        (r.maxv, r.minv): r.n for r in out.itertuples()
    }
    assert got == _brute(pts)
