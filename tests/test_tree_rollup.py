"""Namespace-tree rollup: prefix fan-out and exact sums."""


def test_path_tree_rollup(ray_session):
    import ray.data

    from opentapioca_ray.stages.selection import path_tree_rollup

    rows = [
        {"repo": "orgA/src1", "path": "src/p1/a.py", "content": "xxxx"},
        {"repo": "orgA/src1", "path": "src/p2/b.py", "content": "yy"},
        {"repo": "orgB/src2", "path": "src/p1/c.py", "content": "z"},
    ]
    out = (
        path_tree_rollup(
            ray.data.from_items(rows).repartition(2), max_depth=3
        )
        .to_pandas()
        .set_index(["depth", "prefix"])
        .sort_index()
    )
    # depth 1: orgA (2 files, 6 chars), orgB (1 file, 1 char)
    assert out.loc[(1, "orgA")]["n_files"] == 2
    assert out.loc[(1, "orgA")]["total_chars"] == 6
    assert out.loc[(1, "orgB")]["n_files"] == 1
    # depth 2: orgA/src1, orgB/src2
    assert out.loc[(2, "orgA/src1")]["n_files"] == 2
    # depth 3: orgA/src1/src aggregates both files of that repo
    assert out.loc[(3, "orgA/src1/src")]["n_files"] == 2
    assert out.loc[(3, "orgA/src1/src")]["total_chars"] == 6
    # no prefix deeper than max_depth
    assert max(d for d, _ in out.index) == 3
