"""Rendezvous-hashing placement audit (__ray_entry__.rendezvous_placement)."""

import sys

sys.path.insert(0, "/root/repo")


def test_hrw_minimal_disruption(ray_session):
    """HRW's defining property: removing one node moves ONLY that node's
    keys — every other node keeps all of its keys and only gains."""
    import __ray_entry__ as entry

    out = entry.queries()["rendezvous_placement"]("/root/testdata/sf0.001")
    by_node = out.set_index("node")
    removed = 3
    # the removed node drains fully and gains nothing
    assert by_node.loc[removed, "n_after"] == 0
    assert by_node.loc[removed, "n_gained"] == 0
    # survivors never lose: gains equal their delta exactly
    for n in by_node.index:
        if n == removed:
            continue
        delta = by_node.loc[n, "n_after"] - by_node.loc[n, "n_before"]
        assert delta == by_node.loc[n, "n_gained"] >= 0
    # moved mass = the removed node's population; totals conserved
    assert out["n_gained"].sum() == by_node.loc[removed, "n_before"]
    assert out["n_before"].sum() == out["n_after"].sum()
    # placement is reasonably balanced (md5 weights): no empty nodes before
    assert (out["n_before"] > 0).all()
