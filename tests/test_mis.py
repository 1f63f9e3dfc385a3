"""Luby maximal independent set (stages/mis.py)."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _graph(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS FROM '{sf_dir}/lineitem.parquet'")
    return con.execute(
        """
        SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
        FROM lineitem
        UNION
        SELECT DISTINCT l_suppkey + 10000000, l_partkey FROM lineitem
        """
    ).df()


def test_luby_mis_independent_and_maximal(ray_session):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["luby_mis"](sf).to_pandas()
    edges = _graph(sf)
    mis = set(out["node"])
    # independence: no edge joins two MIS members
    inside = edges[edges["src"].isin(mis) & edges["dst"].isin(mis)]
    assert len(inside) == 0
    # maximality (6 rounds converge at this scale): every non-member has
    # a MIS neighbor
    all_nodes = set(edges["src"])
    non = all_nodes - mis
    nbr_of_mis = set(edges[edges["dst"].isin(mis)]["src"])
    assert non <= nbr_of_mis
    # rounds are a partition of the MIS (each node reported once)
    assert out["node"].is_unique


def test_luby_mis_deterministic(ray_session):
    import __ray_entry__ as entry

    a = entry.queries()["luby_mis"]("/root/testdata/sf0.001")
    b = entry.queries()["luby_mis"]("/root/testdata/sf0.001")
    assert a.sort_by("node").equals(b.sort_by("node"))
