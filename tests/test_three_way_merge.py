"""Three-way merge audit: full status taxonomy."""


def test_three_way_merge_statuses(ray_session):
    import ray.data

    from opentapioca_ray.stages.diff import three_way_merge

    def rows(d):
        return ray.data.from_items(
            [{"k": k, "v": v} for k, v in d.items()]
        ).repartition(2)

    base = {1: "a", 2: "b", 3: "c", 4: "d", 5: "e", 6: "f", 7: "g"}
    ours = {1: "a", 2: "B", 3: "c", 4: "D1", 5: "E", 7: "g", 8: "new"}
    theirs = {1: "a", 2: "b", 3: "C", 4: "D2", 5: "E", 6: "f", 7: "g"}
    # 1 unchanged; 2 ours_only; 3 theirs_only; 4 conflict; 5 both_same;
    # 6 removed (missing from ours); 7 unchanged; 8 added
    out = (
        three_way_merge(rows(base), rows(ours), rows(theirs), "k", ["v"])
        .to_pandas()
        .set_index("merge_status")
        .sort_index()
    )
    assert out.loc["unchanged", "n_keys"] == 2
    assert out.loc["ours_only", "n_keys"] == 1
    assert out.loc["theirs_only", "n_keys"] == 1
    assert out.loc["conflict", "n_keys"] == 1
    assert (out.loc["conflict", "min_key"], out.loc["conflict", "max_key"]) == (4, 4)
    assert out.loc["both_same", "n_keys"] == 1
    assert out.loc["removed", "n_keys"] == 1
    assert out.loc["added", "n_keys"] == 1
    assert out.loc["added", "min_key"] == 8
