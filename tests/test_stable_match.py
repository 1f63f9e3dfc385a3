"""Gale-Shapley deferred acceptance (stages/matching.py:stable_match)."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _pref_table(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS FROM '{sf_dir}/lineitem.parquet'"
    )
    return con.execute(
        """
        SELECT l_partkey AS proposer, l_suppkey AS acceptor,
               min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS score
        FROM lineitem GROUP BY 1, 2
        """
    ).df()


def test_stable_assignment_no_blocking_pair(ray_session):
    """After enough rounds to exhaust every preference list, the
    assignment admits NO blocking pair: an edge (p, a) where p strictly
    prefers a to p's outcome AND a strictly prefers p to a's held match
    (prefer = smaller (score, id))."""
    import ray.data

    from opentapioca_ray.stages.matching import stable_match

    sf = "/root/testdata/sf0.001"
    pref = _pref_table(sf)
    # enough rounds to exhaust every preference list -> full convergence
    # (the driver-gate query pins the 8-round trajectory via its oracle)
    out = stable_match(
        ray.data.from_pandas(pref), rounds=64
    ).to_pandas()
    # one acceptor per proposer, one proposer per acceptor
    assert out["proposer"].is_unique and out["acceptor"].is_unique
    # every matched edge exists in the preference graph with its min score
    merged = out.merge(pref, on=["proposer", "acceptor", "score"])
    assert len(merged) == len(out)

    my_match = dict(zip(out["proposer"], zip(out["score"], out["acceptor"])))
    held = dict(zip(out["acceptor"], zip(out["score"], out["proposer"])))
    blocking = 0
    for p, a, s in pref[["proposer", "acceptor", "score"]].itertuples(
        index=False
    ):
        p_cur = my_match.get(p, (np.inf, np.inf))
        a_cur = held.get(a, (np.inf, np.inf))
        if (s, a) < p_cur and (s, p) < a_cur:
            blocking += 1
    assert blocking == 0


def test_stable_assignment_deterministic(ray_session):
    import __ray_entry__ as entry

    a = entry.queries()["stable_assignment"]("/root/testdata/sf0.001")
    b = entry.queries()["stable_assignment"]("/root/testdata/sf0.001")
    key = ["acceptor"]
    pa_ = a.to_pandas().sort_values(key).reset_index(drop=True)
    pb = b.to_pandas().sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb)
