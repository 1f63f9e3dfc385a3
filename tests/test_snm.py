

def test_progressive_pairs_order_and_budget(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.snm import progressive_pairs

    # 6 rows keyed by letter -> ranks 1..6. Pay-as-you-go order: all 5
    # gap-1 pairs (ord 1..5), then gap-2 (ord 6..9), ...
    df = pd.DataFrame({"k": list("abcdef"), "rid": [10, 20, 30, 40, 50, 60]})
    out = (
        progressive_pairs(
            ray.data.from_pandas(df), "k", "rid", window=3, budget=7
        )
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    got = list(map(tuple, out[["u", "v", "gap", "ord"]].values))
    assert got == [
        (10, 20, 1, 1),
        (20, 30, 1, 2),
        (30, 40, 1, 3),
        (40, 50, 1, 4),
        (50, 60, 1, 5),
        (10, 30, 2, 6),
        (20, 40, 2, 7),
    ]
