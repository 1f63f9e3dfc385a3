"""Range-bucketed checksums: consistency with table_checksum, divergence
localization."""

import numpy as np


def test_buckets_roll_up_to_table_checksum(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import bucketed_checksums, table_checksum

    rows = [
        {"k": int(i), "s": f"val{i % 7}"} for i in range(0, 500, 3)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    whole = table_checksum(ds, ["k", "s"]).to_pandas()
    parts = bucketed_checksums(ds, "k", ["k", "s"], 64).to_pandas()
    total = sum(
        ((int(h) << 32) + int(l)) for h, l in zip(parts["hi"], parts["lo"])
    ) % (1 << 64)
    want = (int(whole["hi"][0]) << 32) + int(whole["lo"][0])
    assert total == want
    assert set(parts["bucket"]) == {k // 64 for k in range(0, 500, 3)}


def test_single_row_change_localizes_to_one_bucket(ray_session):
    import ray.data

    from opentapioca_ray.stages.quality import bucketed_checksums

    rows = [{"k": int(i), "s": "x"} for i in range(256)]
    a = bucketed_checksums(
        ray.data.from_items(rows), "k", ["k", "s"], 64
    ).to_pandas().set_index("bucket").sort_index()
    rows[200]["s"] = "CHANGED"
    b = bucketed_checksums(
        ray.data.from_items(rows), "k", ["k", "s"], 64
    ).to_pandas().set_index("bucket").sort_index()
    diff = [
        bk
        for bk in a.index
        if (a.loc[bk, "hi"], a.loc[bk, "lo"]) != (b.loc[bk, "hi"], b.loc[bk, "lo"])
    ]
    assert diff == [200 // 64]
