"""Weisfeiler-Lehman refinement (stages/wl.py)."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _edges(pairs):
    """Undirected edge list -> distinct both-direction DataFrame."""
    rows = set()
    for u, v in pairs:
        rows.add((u, v))
        rows.add((v, u))
    df = pd.DataFrame(sorted(rows), columns=["src", "dst"])
    return df.astype(np.int64)


def test_wl_isomorphic_components_share_colors(ray_session):
    """Two isomorphic 3-leaf stars get identical color multisets; a
    4-path (same node/edge count) gets a different one."""
    import ray.data

    from opentapioca_ray.stages.wl import wl_labels

    star_a = [(1, 2), (1, 3), (1, 4)]
    star_b = [(11, 12), (11, 13), (11, 14)]
    path = [(21, 22), (22, 23), (23, 24)]
    ds = ray.data.from_pandas(_edges(star_a + star_b + path))
    out = wl_labels(ds, rounds=3).to_pandas().set_index("node")["wl"]

    def colors(nodes):
        return sorted(out.loc[list(nodes)].tolist())

    assert colors({1, 2, 3, 4}) == colors({11, 12, 13, 14})
    assert colors({1, 2, 3, 4}) != colors({21, 22, 23, 24})
    # centers agree, center != leaf
    assert out.loc[1] == out.loc[11]
    assert out.loc[1] != out.loc[2]
    # path interior vs endpoint differ
    assert out.loc[22] != out.loc[21]


def test_wl_deterministic_query(ray_session):
    import __ray_entry__ as entry

    a = entry.queries()["wl_refinement"]("/root/testdata/sf0.001")
    b = entry.queries()["wl_refinement"]("/root/testdata/sf0.001")
    assert a.sort_by("node").equals(b.sort_by("node"))
