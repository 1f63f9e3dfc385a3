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


def test_blocking_scheme_learn_greedy(ray_session):
    """Greedy disjunction over the dirty-replica fixture: three rounds,
    non-increasing marginal coverage, cumulative totals consistent,
    and the scheme never re-picks a predicate."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["blocking_scheme_learn"]("/root/testdata/sf0.001")
    assert list(out["round"]) == list(range(len(out)))
    assert len(out) == 3
    assert len(set(out["predicate"])) == len(out)
    gains = list(out["new_covered"])
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    assert (out["new_covered"] > 0).all()
    assert list(out["total_covered"]) == list(out["new_covered"].cumsum())
    # each perturbation has period > 1, so the best single predicate
    # covers most-but-not-all matches
    n_parts_total = 200
    assert gains[0] < n_parts_total


def test_clustering_disagreement_hand_case(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.blocking_eval import clustering_disagreement

    pairs = ray.data.from_pandas(
        pd.DataFrame({"u": [1, 2, 4], "v": [2, 3, 5]})
    )
    clusters = ray.data.from_pandas(
        pd.DataFrame(
            {"node": [1, 2, 3, 4, 5], "cluster": [1, 1, 1, 4, 5]}
        )
    )
    out = clustering_disagreement(pairs, clusters, "node", "cluster").to_pandas()
    r = out.iloc[0]
    # cluster {1,2,3}: 3 possible intra pairs, 2 present -> 1 missing;
    # edge (4,5) crosses singleton clusters -> 1 cross; cost 2
    assert (
        r.n_nodes, r.n_clusters, r.intra_pairs, r.intra_edges,
        r.missing_intra, r.cross_edges, r.editing_cost,
    ) == (5, 3, 3, 2, 1, 1, 2)
