"""Dedoop BlockSplit plan: split arithmetic + round-robin rank assignment."""

import pyarrow as pa


def _plan(rows, m):
    import ray.data

    from opentapioca_ray.stages.blocking_eval import block_split_plan

    ds = ray.data.from_arrow(pa.table({"bkey": pa.array(rows, pa.string())}))
    out = block_split_plan(ds, "bkey", m=m).to_pandas()
    if out.empty:
        return out
    return out.sort_values(
        ["n_comparisons", "chunk_i", "chunk_j", "block_key"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


def test_block_split_hand_case(ray_session):
    # A: 10 records (45 comps), B: 2 (1), C: 3 (3); total 49, m=2 ->
    # fair share 25. A splits into k=2 chunks of 5: sub-tasks
    # (0,1)=25, (0,0)=10, (1,1)=10; B and C stay whole.
    rows = ["A"] * 10 + ["B"] * 2 + ["C"] * 3
    out = _plan(rows, m=2)
    got = list(
        map(
            tuple,
            out[
                ["block_key", "chunk_i", "chunk_j", "n_i", "n_j",
                 "n_comparisons", "reducer"]
            ].values,
        )
    )
    assert got == [
        ("A", 0, 1, 5, 5, 25, 0),
        ("A", 0, 0, 5, 5, 10, 1),
        ("A", 1, 1, 5, 5, 10, 0),
        ("C", 0, 0, 3, 3, 3, 1),
        ("B", 0, 0, 2, 2, 1, 0),
    ]


def test_block_split_uneven_chunks(ray_session):
    # one block of 7 records, m=4: cb=21, avg=6, q=4 -> k=3
    # (3*4/2=6 >= 4); chunk sizes 3,2,2
    out = _plan(["X"] * 7, m=4)
    sizes = {
        (r.chunk_i, r.chunk_j): (r.n_i, r.n_j, r.n_comparisons)
        for r in out.itertuples()
    }
    assert sizes[(0, 0)] == (3, 3, 3)
    assert sizes[(1, 1)] == (2, 2, 1)
    assert sizes[(2, 2)] == (2, 2, 1)
    assert sizes[(0, 1)] == (3, 2, 6)
    assert sizes[(0, 2)] == (3, 2, 6)
    assert sizes[(1, 2)] == (2, 2, 4)
    # comparison mass is conserved by the split
    assert out["n_comparisons"].sum() == 21


def test_block_split_singletons_only(ray_session):
    out = _plan(["a", "b", "c"], m=2)
    assert len(out) == 0
