"""Broadcast map-side join: inner/left semantics, uniqueness validation."""

import pyarrow as pa
import pytest


def _dim():
    return pa.table(
        {"k": pa.array([10, 20, 30], pa.int64()), "name": ["a", "b", "c"]}
    )


def test_broadcast_join_inner(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import broadcast_join

    facts = ray.data.from_arrow(
        pa.table({"fk": pa.array([20, 10, 99, 20], pa.int64()), "x": [1, 2, 3, 4]})
    )
    out = broadcast_join(facts, _dim(), "fk", "k", ["name"]).take_all()
    assert [(r["fk"], r["x"], r["name"]) for r in out] == [
        (20, 1, "b"),
        (10, 2, "a"),
        (20, 4, "b"),
    ]


def test_broadcast_join_left(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import broadcast_join

    facts = ray.data.from_arrow(
        pa.table({"fk": pa.array([99, 30], pa.int64()), "x": [1, 2]})
    )
    out = broadcast_join(facts, _dim(), "fk", "k", ["name"], how="left").take_all()
    assert [(r["fk"], r["name"]) for r in out] == [(99, None), (30, "c")]


def test_broadcast_join_rejects_dup_keys(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import broadcast_join

    dup = pa.table({"k": pa.array([1, 1], pa.int64()), "name": ["a", "b"]})
    facts = ray.data.from_arrow(pa.table({"fk": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="not unique"):
        broadcast_join(facts, dup, "fk", "k", ["name"])
