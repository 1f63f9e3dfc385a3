"""2-D skyline: dominance semantics and the distribute-then-merge shape."""

import numpy as np
import pyarrow as pa


def test_skyline_mask_reference():
    from opentapioca_ray.stages.skyline import _skyline_mask

    rng = np.random.default_rng(11)
    mx = rng.integers(0, 40, size=300).astype(np.int64)
    mn = rng.integers(0, 40, size=300).astype(np.int64)
    got = _skyline_mask(mx, mn)
    for i in range(300):
        dominated = bool(
            np.any(
                (mx >= mx[i])
                & (mn <= mn[i])
                & ((mx > mx[i]) | (mn < mn[i]))
            )
        )
        assert got[i] == (not dominated), i


def test_exact_tie_duplicates_all_kept():
    from opentapioca_ray.stages.skyline import _skyline_mask

    mx = np.array([10, 10, 5], dtype=np.int64)
    mn = np.array([1, 1, 0], dtype=np.int64)
    got = _skyline_mask(mx, mn)
    assert got.tolist() == [True, True, True]


def test_distributed_matches_single_block(ray_session):
    import ray.data

    from opentapioca_ray.stages.skyline import skyline2d

    rng = np.random.default_rng(3)
    rows = [
        {"k": i, "price": float(p), "ts": int(t)}
        for i, (p, t) in enumerate(
            zip(rng.uniform(0, 1000, 500), rng.integers(0, 10_000, 500))
        )
    ]

    def run(nblocks):
        ds = ray.data.from_items(rows).repartition(nblocks)
        out = skyline2d(ds, "price", "ts").to_pandas()
        return set(out["k"].tolist())

    assert run(1) == run(8)
