"""k-anonymity, Pareto concentration, decile summary."""

import numpy as np
import pyarrow as pa


def test_k_anonymity_violations(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import k_anonymity_violations

    t = pa.table(
        {
            "a": ["x"] * 5 + ["y"] * 2,
            "b": ["p"] * 5 + ["q"] * 2,
        }
    )
    out = k_anonymity_violations(
        ray.data.from_arrow(t).repartition(3), ["a", "b"], k=3
    ).to_pandas()
    got = {(r["a"], r["b"]): r["n"] for _, r in out.iterrows()}
    assert got == {("y", "q"): 2}


def test_pareto_count(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import pareto_count

    # group g: members 1..4 with values 50, 30, 15, 5 -> 80% of 100 is
    # reached after members 1+2 (80) -> n_top = 2
    t = pa.table(
        {
            "g": ["g"] * 4,
            "m": [1, 2, 3, 4],
            "v": [50.0, 30.0, 15.0, 5.0],
        }
    )
    out = pareto_count(
        ray.data.from_arrow(t).repartition(2), "g", "m", "v"
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_top"], r["n_members"], r["total_units"]) == (2, 4, 10000)


def test_decile_summary(ray_session):
    import ray.data

    from opentapioca_ray.stages.aggregates import decile_summary

    vals = np.arange(1, 101, dtype=np.float64)  # 1..100
    t = pa.table({"v": vals})
    out = (
        decile_summary(ray.data.from_arrow(t).repartition(4), "v", scale=1)
        .to_pandas()
        .set_index("decile")
        .sort_index()
    )
    # type-1 deciles of 1..100 are 10,20,...,90; ties stay below, so each
    # bucket holds exactly 10 consecutive ints
    assert list(out.index) == list(range(1, 11))
    assert list(out["n"]) == [10] * 10
    assert out.loc[1, "sum_units"] == sum(range(1, 11))
    assert out.loc[10, "sum_units"] == sum(range(91, 101))
