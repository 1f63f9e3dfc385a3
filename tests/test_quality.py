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


def test_l_diversity_violations(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.quality import l_diversity_violations

    # group (1, A): sens in {10, 10, 20} -> l=2 violates l=3, k=3
    # group (1, B): sens {1,2,3} -> l=3 ok
    df = pd.DataFrame(
        {
            "q1": [1, 1, 1, 1, 1, 1],
            "q2": ["A", "A", "A", "B", "B", "B"],
            "sens": [10, 10, 20, 1, 2, 3],
        }
    )
    out = l_diversity_violations(
        ray.data.from_pandas(df), ["q1", "q2"], "sens", l=3
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.q1, r.q2, r.k, r.l) == (1, "A", 3, 2)


def test_zipf_slope_hand_case(ray_session):
    import math

    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.tfidf import zipf_slope

    # one language: counts a=4, b=2, c=1 -> ranks 1,2,3
    docs = pd.DataFrame(
        {"lang": ["x"], "text": ["a a a a b b c"]}
    )
    out = zipf_slope(
        ray.data.from_pandas(docs), text_column="text", group_column="lang"
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_types"] == 3
    xs = [math.floor(math.log(r) * 1000 + 0.5) for r in (1, 2, 3)]
    ys = [math.floor(math.log(c) * 1000 + 0.5) for c in (4, 2, 1)]
    n = 3
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(a * a for a in xs) - sum(xs) ** 2
    want = math.floor(num * 1_000_000.0 / den + 0.5)
    assert out.iloc[0]["slope_e6"] == want
    assert out.iloc[0]["slope_e6"] < -1_000_000  # steeper than -1


def test_fd_profile_hand_case(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.quality import fd_profile

    # id -> grp holds (id unique); grp -> id violated (grp 1 maps to two
    # ids); grp -> flag holds; flag -> grp violated
    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "grp": [1, 1, 2],
            "flag": ["a", "a", "b"],
        }
    )
    out = (
        fd_profile(ray.data.from_pandas(df), ["id", "grp", "flag"])
        .to_pandas()
        .set_index(["lhs", "rhs"])
    )
    assert out.loc[("id", "grp"), "holds"] == 1
    assert out.loc[("grp", "id"), "holds"] == 0
    assert out.loc[("grp", "id"), "violations"] == 1
    assert out.loc[("grp", "flag"), "holds"] == 1
    assert out.loc[("flag", "grp"), "holds"] == 1  # a->1, b->2 : holds
    assert len(out) == 6


def test_t_closeness_hand_case(ray_session):
    import math

    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.quality import t_closeness

    # global bands: 0 x4, 1 x2 (N=6, m=2, cum_all=[4,6]).
    # group A = {0,0,1}: cum=[2,3]; S = |2*6-4*3| + |3*6-6*3| = 0 -> t=0
    # group B = {0,0,1}: same distribution -> t=0
    # group C = {1}: cum=[0,1]; S = |0*6-4*1| + |1*6-6*1| = 4
    #   t = 4e6/(1*6*1) = 666667
    df = pd.DataFrame(
        {
            "g": ["A", "A", "A", "B", "B", "C"],
            "band": [0, 0, 1, 0, 0, 1],
        }
    )
    out = (
        t_closeness(ray.data.from_pandas(df), ["g"], "band")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["A", "t_e6"] == 0
    # B = {0,0}: cum=[2,2]; S=|2*6-4*2|+|2*6-6*2|=4; t=4e6/(2*6*1)=333333
    assert out.loc["B", "t_e6"] == math.floor(4 * 1e6 / 12 + 0.5)
    assert out.loc["C", "t_e6"] == math.floor(4 * 1e6 / 6 + 0.5)
    assert out.loc["C", "n"] == 1
