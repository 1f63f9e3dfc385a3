

def test_cross_source_pairs_never_within_side(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.fuzzy import cross_source_pairs

    a = pd.DataFrame(
        {
            "aid": [1, 2],
            "an": ["smith", "smyth"],  # within-A distance 1: must NOT pair
            "ab": ["x", "x"],
        }
    )
    b = pd.DataFrame(
        {
            "bid": [10, 20],
            "bn": ["smith", "jones"],
            "bb": ["x", "x"],
        }
    )
    out = (
        cross_source_pairs(
            ray.data.from_pandas(a), ray.data.from_pandas(b),
            "aid", "an", "ab", "bid", "bn", "bb", max_dist=1,
        )
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    # cross pairs within distance 1: (1,10) lev 0 and (2,10) lev 1;
    # (smith, smyth) is within file A and never compared
    assert list(map(tuple, out[["a_id", "b_id", "lev"]].values)) == [
        (1, 10, 0),
        (2, 10, 1),
    ]


def test_cross_source_pairs_blocks_separate(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.fuzzy import cross_source_pairs

    a = pd.DataFrame({"aid": [1], "an": ["same"], "ab": ["x"]})
    b = pd.DataFrame({"bid": [9], "bn": ["same"], "bb": ["y"]})
    out = cross_source_pairs(
        ray.data.from_pandas(a), ray.data.from_pandas(b),
        "aid", "an", "ab", "bid", "bn", "bb", max_dist=2,
    ).to_pandas()
    assert len(out) == 0  # different blocking keys never meet
