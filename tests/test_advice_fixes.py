"""Regression tests for the round-2 ADVICE findings: float-score
fixed-point contract (mutual_best_match / sparsify_edges), first-crossing
semantics under negative values (pareto_count / weighted_median), and the
vectorized table_checksum serialization."""

import numpy as np
import pyarrow as pa
import pytest


def test_mutual_best_match_float_scores_require_scale(ray_session):
    import ray.data

    from opentapioca_ray.stages.matching import mutual_best_match

    t = pa.table(
        {
            "u": [1, 1, 2],
            "v": [2, 3, 3],
            "sim": [0.93, 0.87, 0.10],
        }
    )
    ds = ray.data.from_arrow(t)
    # without scale: the bare int64 cast would truncate 0.93 to 0 — refuse
    with pytest.raises(Exception) as exc:
        mutual_best_match(ds, score_column="sim", ascending=False).to_pandas()
    assert "scale" in str(exc.value)
    out = mutual_best_match(
        ray.data.from_arrow(t), score_column="sim", ascending=False,
        score_scale=1_000_000,
    ).to_pandas()
    got = {(r["u"], r["v"]): r["sim"] for _, r in out.iterrows()}
    # 1's best is 2 (0.93 > 0.87) and 2's best is 1 (0.93 > 0.10): mutual;
    # with the truncating cast every score was 0 and (1,2)+(2,3) tied by id
    assert got == {(1, 2): 930_000}


def test_sparsify_edges_float_weights(ray_session):
    import ray.data

    from opentapioca_ray.stages.graphops import sparsify_edges

    t = pa.table(
        {
            "u": [1, 1, 1, 2],
            "v": [2, 3, 4, 3],
            "w": [0.9, 0.5, 0.1, 0.8],
        }
    )
    with pytest.raises(Exception) as exc:
        sparsify_edges(ray.data.from_arrow(t), "w", k=1, ascending=False).to_pandas()
    assert "scale" in str(exc.value)
    out = sparsify_edges(
        ray.data.from_arrow(t), "w", k=1, ascending=False, weight_scale=100
    ).to_pandas()
    got = {(r["u"], r["v"]): r["w"] for _, r in out.iterrows()}
    # node 1 nominates (1,2); node 2 nominates (1,2); node 3 nominates
    # (2,3); node 4 nominates (1,4)
    assert got == {(1, 2): 90, (2, 3): 80, (1, 4): 10}


def test_pareto_count_negative_values_first_crossing(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import pareto_count

    # sorted by value DESC: 100, 50, -60, 10 -> totals 100; 80% = 80.
    # cumulative: 100 (reaches), 150, 90, 100 — first crossing is rank 1.
    # the old miss-COUNT formulation counted the one non-reaching prefix row
    # elsewhere and would misreport on the non-monotonic cumsum.
    t = pa.table(
        {
            "g": ["x"] * 4,
            "m": [1, 2, 3, 4],
            "val": [100.0, 50.0, -60.0, 10.0],
        }
    )
    out = pareto_count(
        ray.data.from_arrow(t), "g", "m", "val", scale=1, num=4, den=5
    ).to_pandas()
    assert out.loc[0, "n_top"] == 1
    assert out.loc[0, "total_units"] == 100


def test_weighted_median_negative_weight_first_crossing(ray_session):
    import ray.data

    from opentapioca_ray.stages.aggregates import weighted_median

    # values 1, 2, 3 with weights 5, -4, 3 -> total 4, half-reach 2*cum>=4:
    # cum: 5 (reaches at value 1), 1, 4. First crossing = value 1. The miss
    # COUNT would see one miss (cum=1 row) and land on value 2.
    t = pa.table(
        {
            "g": ["x"] * 3,
            "v": [1.0, 2.0, 3.0],
            "w": [5, -4, 3],
        }
    )
    out = weighted_median(ray.data.from_arrow(t), "g", "v", "w", scale=1).to_pandas()
    assert out.loc[0, "median_units"] == 1
    assert out.loc[0, "total_weight"] == 4


def test_table_checksum_serialization_matches_duckdb(ray_session):
    """The Arrow-cast serialization must keep exact md5 parity with the
    DuckDB oracle's CAST(... AS VARCHAR) || '|' || ... shape."""
    import duckdb
    import ray.data

    from opentapioca_ray.stages.quality import table_checksum

    t = pa.table(
        {
            "k": pa.array([1, -5, 99999999999], type=pa.int64()),
            "s": ["alpha", "", "tail|pipe"],
        }
    )
    got = table_checksum(ray.data.from_arrow(t).repartition(2), ["k", "s"]).to_pandas()
    ref = duckdb.sql(
        """
        WITH h AS (
          SELECT ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 16)
                 )::UBIGINT AS hv
          FROM t
        )
        SELECT sum(CAST(hv AS HUGEINT)) % 18446744073709551616 AS total FROM h
        """
    ).fetchone()[0]
    total = (int(got.loc[0, "hi"]) << 32) | int(got.loc[0, "lo"])
    assert total == int(ref)
