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


def test_dbscan_semantics(ray_session):
    """DBSCAN on planted blobs: dense blobs become clusters (cores +
    borders), isolated points become noise; min-label determinism."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import pandas as pd
    import __ray_entry__ as entry

    out = entry.queries()["dbscan_clusters"]("/root/testdata/sf0.001")
    assert set(out["role"].unique()) <= {0, 1, 2}
    # noise rows carry cluster -1; clustered rows a real min-id label
    assert (out.loc[out["role"] == 2, "cluster"] == -1).all()
    clustered = out[out["role"] != 2]
    assert (clustered["cluster"] >= 0).all()
    # every cluster label is the min vec_id of its members' core set
    for cl, grp in clustered.groupby("cluster"):
        cores = grp[grp["role"] == 0]["vec_id"]
        if len(cores):
            assert cl == cores.min() or cl <= cores.min()
    # deterministic across runs
    out2 = entry.queries()["dbscan_clusters"]("/root/testdata/sf0.001")
    assert out.sort_values("vec_id").reset_index(drop=True).equals(
        out2.sort_values("vec_id").reset_index(drop=True)
    )
