"""FD violations, IQR outliers, column profiling."""

import numpy as np
import pyarrow as pa


def test_fd_violations(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import fd_violations

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "y": ["x", "x", "z", "w", "w", "q"],
        }
    )
    out = fd_violations(
        ray.data.from_arrow(t).repartition(3), "k", "y"
    ).to_pandas()
    # a maps to {x, z} -> violation with 3 rows; b and c are clean
    got = {r["k"]: (r["n_rhs"], r["n_rows"]) for _, r in out.iterrows()}
    assert got == {"a": (2, 3)}


def test_iqr_outliers(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import iqr_outliers

    vals = [1.0] * 10 + [100.0]  # q1=q3=1.0 -> fences at 1.0; 100 flags
    t = pa.table(
        {
            "id": np.arange(11, dtype=np.int64),
            "g": ["t"] * 11,
            "v": vals,
        }
    )
    out = iqr_outliers(
        ray.data.from_arrow(t).repartition(3), "g", "v", "id"
    ).to_pandas()
    assert sorted(out["id"]) == [10]
    assert out.iloc[0]["v_u"] == 100_000_000


def test_profile_columns(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import profile_columns

    t = pa.table(
        {
            "a": [1, 2, 2, None],
            "b": ["x", None, "y", None],
        }
    )
    out = (
        profile_columns(ray.data.from_arrow(t).repartition(3), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "min_v"] == "1"
    assert out.loc["a", "max_v"] == "2"
    assert out.loc["b", "n_null"] == 2
    assert out.loc["b", "n_distinct"] == 2
    assert out.loc["b", "min_v"] == "x"
    assert out.loc["b", "max_v"] == "y"
