"""MMR diverse selection (__ray_entry__.mmr_selection)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_mmr_properties(ray_session):
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["mmr_selection"](sf)
    assert list(out["pick_round"]) == list(range(len(out)))
    assert len(out) == 10
    # probe (vec 0) excluded; no repeats
    assert 0 not in set(out["vec_id"])
    assert out["vec_id"].is_unique
    # first pick is the pure-relevance argmax (no selected set yet)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS FROM '{sf}/embeddings.parquet'")
    top = con.execute(
        """
        SELECT vec_id FROM (
          SELECT e.vec_id, list_cosine_similarity(
            e.embedding::DOUBLE[],
            (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
          ) AS r FROM embeddings e WHERE e.vec_id != 0
        ) ORDER BY r DESC, vec_id LIMIT 1
        """
    ).fetchone()[0]
    assert out["vec_id"].iloc[0] == top
    # diversity actually bites: the greedy trajectory must diverge from
    # the pure-relevance top-10 (otherwise the penalty is vacuous here)
    rel10 = set(
        r[0]
        for r in con.execute(
            """
            SELECT e.vec_id FROM embeddings e WHERE e.vec_id != 0
            ORDER BY list_cosine_similarity(
              e.embedding::DOUBLE[],
              (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
            ) DESC, e.vec_id LIMIT 10
            """
        ).fetchall()
    )
    assert set(out["vec_id"]) != rel10


def test_mmr_deterministic(ray_session):
    import __ray_entry__ as entry

    a = entry.queries()["mmr_selection"]("/root/testdata/sf0.001")
    b = entry.queries()["mmr_selection"]("/root/testdata/sf0.001")
    assert a.equals(b)
