"""Z-order layout stats: Morton interleave + block manifests."""

import numpy as np


def _morton(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_blocks_and_manifests(ray_session):
    import ray.data

    from opentapioca_ray.stages.selection import zorder_block_stats

    rng = np.random.default_rng(17)
    rows = [
        {"x": int(rng.integers(0, 1 << 12)), "y": int(rng.integers(0, 1 << 12))}
        for _ in range(400)
    ]
    out = (
        zorder_block_stats(
            ray.data.from_items(rows).repartition(3),
            "x",
            "y",
            bits=16,
            block_shift=16,
        )
        .to_pandas()
        .set_index("zblock")
        .sort_index()
    )
    # reference: bucket by morton >> 16, roll up min/max/count
    from collections import defaultdict

    ref = defaultdict(lambda: [0, 1 << 62, -(1 << 62), 1 << 62, -(1 << 62)])
    for r in rows:
        b = _morton(r["x"], r["y"]) >> 16
        e = ref[b]
        e[0] += 1
        e[1] = min(e[1], r["x"])
        e[2] = max(e[2], r["x"])
        e[3] = min(e[3], r["y"])
        e[4] = max(e[4], r["y"])
    assert set(out.index) == set(ref)
    for b, (n, mnx, mxx, mny, mxy) in ref.items():
        row = out.loc[b]
        assert (row["n"], row["min_x"], row["max_x"], row["min_y"], row["max_y"]) == (
            n,
            mnx,
            mxx,
            mny,
            mxy,
        ), b
    # the point of z-ordering: each block covers a LOCALIZED x and y range
    spans_x = (out["max_x"] - out["min_x"]).to_numpy()
    assert np.median(spans_x) < (1 << 12) / 4
