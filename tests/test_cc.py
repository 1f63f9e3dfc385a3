import numpy as np
import pytest

from opentapioca_ray.stages.cc import (
    connected_components,
    connected_components_local,
)


def test_local_union_find():
    comp = connected_components_local([(1, 2), (2, 3), (10, 11), (5, 5)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[5] == 5


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (4, 5)],
        [(i, i + 1) for i in range(0, 30)],  # long chain
        [(0, 1), (2, 3), (1, 2), (10, 20), (20, 30), (30, 10)],
        [(7, 7)],
    ],
)
def test_distributed_matches_local(ray_session, edges):
    import ray.data

    ds = ray.data.from_items([{"u": u, "v": v} for u, v in edges])
    # local_threshold=0 forces the large-star/small-star shuffle path
    got = {
        r["node"]: r["component"]
        for r in connected_components(ds, local_threshold=0).take_all()
    }
    want = connected_components_local(edges)
    assert got == want
    # scale-adaptive local path must agree
    got_local = {
        r["node"]: r["component"] for r in connected_components(ds).take_all()
    }
    assert got_local == want
