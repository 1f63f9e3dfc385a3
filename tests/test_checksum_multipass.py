"""Table checksum and multi-pass blocking union."""

import pyarrow as pa


def test_table_checksum_order_invariant(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import table_checksum

    t1 = pa.table({"k": [1, 2, 3], "s": ["a", "b", "c"]})
    t2 = pa.table({"k": [3, 1, 2], "s": ["c", "a", "b"]})  # same content
    t3 = pa.table({"k": [1, 2, 3], "s": ["a", "b", "X"]})  # one row differs
    c1 = table_checksum(ray.data.from_arrow(t1).repartition(2), ["k", "s"])
    c2 = table_checksum(ray.data.from_arrow(t2).repartition(3), ["k", "s"])
    c3 = table_checksum(ray.data.from_arrow(t3), ["k", "s"])
    assert c1.to_pydict() == c2.to_pydict()
    assert c1.to_pydict() != c3.to_pydict()


def test_multi_pass_pairs_provenance(ray_session):
    import ray.data

    from opentapioca_ray.stages.snm import multi_pass_pairs

    a = pa.table({"u": [1, 3], "v": [2, 4]})       # scheme 1: (1,2) (3,4)
    b = pa.table({"u": [2, 5], "v": [1, 6]})       # scheme 2: (1,2) (5,6)
    out = multi_pass_pairs(
        [
            (ray.data.from_arrow(a).repartition(2), 1),
            (ray.data.from_arrow(b).repartition(2), 2),
        ]
    ).to_pandas()
    got = {(r["u"], r["v"]): r["schemes"] for _, r in out.iterrows()}
    assert got == {(1, 2): 3, (3, 4): 1, (5, 6): 2}


def test_block_key_pairs(ray_session):
    import ray.data

    from opentapioca_ray.stages.snm import block_key_pairs

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "k": ["a", "a", "a", "b", "b"],
        }
    )
    out = block_key_pairs(
        ray.data.from_arrow(t).repartition(3), "k", "id"
    ).to_pandas()
    got = set(zip(out["u"], out["v"]))
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
