"""B-cubed stats, n-gram containment, component size histogram."""

import pyarrow as pa


def test_bcubed_combo_stats(ray_session):
    import ray.data

    from opentapioca_ray.stages.blocking_eval import bcubed_combo_stats

    # pred x{1,2,3} y{4,5}; truth t1{1,2} t2{3,4} t3{5}
    t = pa.table(
        {
            "p": ["x", "x", "x", "y", "y"],
            "t": ["t1", "t1", "t2", "t2", "t3"],
        }
    )
    out = bcubed_combo_stats(
        ray.data.from_arrow(t).repartition(3), "p", "t"
    ).to_pandas()
    got = {
        (r["p"], r["t"]): (r["n"], r["csize"], r["tsize"])
        for _, r in out.iterrows()
    }
    assert got == {
        ("x", "t1"): (2, 3, 2),
        ("x", "t2"): (1, 3, 2),
        ("y", "t2"): (1, 2, 2),
        ("y", "t3"): (1, 2, 1),
    }
    # derived metrics sanity: B3 precision = sum(n^2/csize)/N
    n_total = sum(v[0] for v in got.values())
    prec = sum(n * n / c for n, c, _ in got.values()) / n_total
    rec = sum(n * n / s for n, _, s in got.values()) / n_total
    assert 0 < prec <= 1 and 0 < rec <= 1


def test_ngram_containment_subset(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import ngram_containment_pairs

    small = "alpha beta gamma delta"
    big = small + " epsilon zeta eta theta iota kappa lam mu nu xi"
    other = "completely different words here entirely"
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [small, big, other],
        }
    )
    out = ngram_containment_pairs(
        ray.data.from_arrow(t).repartition(2), threshold=0.8
    ).to_pandas()
    # small's 2 trigrams are fully inside big -> containment 1.0;
    # Jaccard would be 2/12 and miss it
    assert len(out) == 1
    assert (out.iloc[0]["u"], out.iloc[0]["v"]) == (1, 2)
    assert out.iloc[0]["containment"] == 1.0


def test_component_size_histogram(ray_session):
    import ray.data

    from opentapioca_ray.stages.cc import component_size_histogram

    t = pa.table(
        {
            "node": [1, 2, 3, 4, 5, 6, 7],
            "component": [1, 1, 1, 4, 4, 6, 6],
        }
    )
    out = component_size_histogram(
        ray.data.from_arrow(t).repartition(3)
    ).to_pandas()
    got = dict(zip(out["size"], out["n_components"]))
    assert got == {3: 1, 2: 2}
