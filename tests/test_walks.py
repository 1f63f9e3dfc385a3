"""Deterministic random walks (stages/walks.py)."""

import hashlib

import numpy as np


def _replay(edges, steps):
    """Driver-side replay of the md5-argmin walk rule."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def prio(w, t, m):
        return (
            int.from_bytes(
                hashlib.md5(f"{w}:{t}:{m}".encode()).digest()[:8], "big"
            ),
            m,
        )

    rows = set()
    for w in adj:
        node = w
        rows.add((w, 0, node))
        for t in range(steps):
            node = min(adj[node], key=lambda m: prio(w, t, m))
            rows.add((w, t + 1, node))
    return rows


def test_walks_match_replay(ray_session):
    import ray.data

    from opentapioca_ray.stages.walks import random_walks

    rng = np.random.default_rng(21)
    edges = list(
        {
            (int(u), 100 + int(v))
            for u, v in zip(rng.integers(0, 25, 120), rng.integers(0, 10, 120))
        }
    )
    ds = ray.data.from_items([{"u": u, "v": v} for u, v in edges])
    got = {
        (r["walker"], r["step"], r["node"])
        for r in random_walks(ds, steps=3, n_parts=4).take_all()
    }
    assert got == _replay(edges, 3)


def test_walks_are_reproducible(ray_session):
    import ray.data

    from opentapioca_ray.stages.walks import random_walks

    edges = [{"u": 1, "v": 10}, {"u": 1, "v": 11}, {"u": 10, "v": 11}]
    r1 = sorted(
        (r["walker"], r["step"], r["node"])
        for r in random_walks(
            ray.data.from_items(edges), steps=5, n_parts=2
        ).take_all()
    )
    r2 = sorted(
        (r["walker"], r["step"], r["node"])
        for r in random_walks(
            ray.data.from_items(edges).repartition(3), steps=5, n_parts=7
        ).take_all()
    )
    assert r1 == r2  # independent of partitioning and block layout
