"""Borůvka minimum spanning forest (stages/mst.py)."""

import numpy as np


def _kruskal(edges):
    """(u, v, w) list -> unique-MST edge set under the (w, u, v) order."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = set()
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.add((u, v, w))
    return out


def test_boruvka_matches_kruskal(ray_session):
    import ray.data

    from opentapioca_ray.stages.mst import minimum_spanning_forest

    rng = np.random.default_rng(17)
    seen = set()
    edges = []
    for _ in range(300):
        u, v = sorted(rng.integers(0, 60, 2).tolist())
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        edges.append((u, v, int(rng.integers(1, 40))))  # heavy weight ties
    ds = ray.data.from_items([{"u": u, "v": v, "w": w} for u, v, w in edges])
    got = {
        tuple(r)
        for r in minimum_spanning_forest(ds, n_parts=4).itertuples(index=False)
    }
    assert got == _kruskal(edges)
    # forest invariant: |F| = |V| - #components
    nodes = {x for u, v, _ in edges for x in (u, v)}
    comp_parent = {}

    def find(x):
        while comp_parent.get(x, x) != x:
            x = comp_parent.get(x, x)
        return x

    for u, v, _ in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            comp_parent[ru] = rv
    n_comp = len({find(x) for x in nodes})
    assert len(got) == len(nodes) - n_comp


def test_boruvka_disconnected_forest(ray_session):
    import ray.data

    from opentapioca_ray.stages.mst import minimum_spanning_forest

    edges = [
        (1, 2, 5),
        (2, 3, 1),
        (1, 3, 9),  # triangle: drops the heaviest edge
        (10, 11, 2),  # separate component
    ]
    ds = ray.data.from_items([{"u": u, "v": v, "w": w} for u, v, w in edges])
    got = {
        tuple(r)
        for r in minimum_spanning_forest(ds, n_parts=2).itertuples(index=False)
    }
    assert got == {(1, 2, 5), (2, 3, 1), (10, 11, 2)}
