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


def _ngram_edges(sf_dir):
    """The dup_components match graph, recomputed independently in DuckDB."""
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    sql = entry.oracle_sql()["dup_components"]
    prefix = sql[: sql.index("lab(v, l)")].rstrip().rstrip(",")
    return con.execute(
        prefix + "\nSELECT u, v FROM pairs"
    ).df()


def test_pivot_clusters_valid_clustering(ray_session):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["pivot_clusters"](sf).to_pandas()
    edges = _ngram_edges(sf)
    nodes = set(edges["u"]) | set(edges["v"])
    # total assignment over exactly the graph's nodes, each node once
    assert set(out["doc_id"]) == nodes
    assert out["doc_id"].is_unique
    # every cluster id is a member of its own cluster (the pivot)
    by_cluster = out.groupby("cluster")["doc_id"].agg(set)
    for piv, members in by_cluster.items():
        assert piv in members
    # a non-pivot member must be adjacent to its pivot (pivot clustering
    # only ever merges along match edges — unlike connected components)
    adj = set(map(tuple, edges[["u", "v"]].to_numpy()))
    adj |= {(b, a) for a, b in adj}
    for row in out.itertuples():
        if row.doc_id != row.cluster:
            assert (row.doc_id, row.cluster) in adj
    # no two adjacent pivots in the same round (pivots are an MIS)
    pivots = out[out["doc_id"] == out["cluster"]]
    rnd = dict(zip(pivots["doc_id"], pivots["pivot_round"]))
    for a, b in adj:
        if a in rnd and b in rnd:
            assert rnd[a] != rnd[b]


def test_pivot_clusters_refines_components(ray_session):
    """Pivot clusters never span two connected components."""
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    piv = entry.queries()["pivot_clusters"](sf).to_pandas()
    comp = entry.queries()["dup_components"](sf).to_pandas()
    comp_of = dict(zip(comp["doc_id"], comp["component"]))
    merged = piv.assign(c=piv["doc_id"].map(comp_of))
    assert merged.groupby("cluster")["c"].nunique().max() == 1
