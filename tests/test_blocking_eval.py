"""Blocking-quality masses (reduction ratio / pair completeness inputs)."""


def test_blocking_quality_masses(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.blocking_eval import blocking_quality

    # blocks: x{1,2,3}, y{4,5}; truth: t1{1,2}, t2{3,4}, t3{5}
    t = pa.table(
        {
            "bkey": ["x", "x", "x", "y", "y"],
            "tkey": ["t1", "t1", "t2", "t2", "t3"],
        }
    )
    out = blocking_quality(
        ray.data.from_arrow(t).repartition(3), ["bkey"], ["tkey"]
    ).to_pydict()
    # candidate: C(3,2)+C(2,2)=3+1=4; true: C(2,2)+C(2,2)+0=2;
    # covered: (x,t1) C(2,2)=1 — pair (3,4) spans blocks, uncovered
    assert out["n_candidate_pairs"] == [4]
    assert out["n_true_pairs"] == [2]
    assert out["n_covered_pairs"] == [1]


def test_blocking_quality_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.blocking_eval import blocking_quality

    t = pa.schema([("bkey", pa.string()), ("tkey", pa.string())]).empty_table()
    out = blocking_quality(
        ray.data.from_arrow(t), ["bkey"], ["tkey"]
    ).to_pydict()
    assert out["n_candidate_pairs"] == [0]
    assert out["n_true_pairs"] == [0]
    assert out["n_covered_pairs"] == [0]
