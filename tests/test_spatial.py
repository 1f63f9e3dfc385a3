"""Grid-bucketed fixed-radius neighbor join (stages/spatial.py)."""

import numpy as np


def _brute(pts, eps):
    out = {}
    ids = sorted(pts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = max(abs(pts[a][0] - pts[b][0]), abs(pts[a][1] - pts[b][1]))
            if d <= eps:
                out[(a, b)] = d
    return out


def test_grid_join_matches_brute_force(ray_session):
    import ray.data

    from opentapioca_ray.stages.spatial import grid_neighbor_join

    rng = np.random.default_rng(5)
    pts = {
        i: (int(rng.integers(-1000, 1000)), int(rng.integers(-1000, 1000)))
        for i in range(400)
    }
    ds = ray.data.from_items(
        [{"id": i, "x": x, "y": y} for i, (x, y) in pts.items()]
    ).repartition(6)
    got = {
        (r["u"], r["v"]): r["linf_e6"]
        for r in grid_neighbor_join(
            ds, "id", "x", "y", eps_e6=120, n_parts=4
        ).take_all()
    }
    assert got == _brute(pts, 120)


def test_grid_join_cell_boundaries(ray_session):
    """Pairs straddling cell boundaries (incl. negative coordinates, where
    floor-division cells differ from truncation) are found via the 3x3
    probe replication."""
    import ray.data

    from opentapioca_ray.stages.spatial import grid_neighbor_join

    pts = {1: (-1, -1), 2: (1, 1), 3: (9, 9), 4: (100, 100), 5: (-11, 0)}
    ds = ray.data.from_items(
        [{"id": i, "x": x, "y": y} for i, (x, y) in pts.items()]
    )
    got = {
        (r["u"], r["v"]): r["linf_e6"]
        for r in grid_neighbor_join(
            ds, "id", "x", "y", eps_e6=10, n_parts=4
        ).take_all()
    }
    assert got == _brute(pts, 10)
