"""Hub-salting guard for the bipartite butterfly census.

A right node of degree d contributes C(d, 2) wedge pairs; without the
guard all of them materialize inside one partition kernel. The guard
splits a hub's left-neighbor list into hash chunks and fans the pairs out
over chunk-pair kernels — exactness-preserving (every unordered pair is
emitted by exactly one kernel), with per-kernel allocation bounded by
~(2·chunk_size)² candidates regardless of hub degree."""

import numpy as np
import pandas as pd
import pytest


def _run(df, **kw):
    import ray.data

    from opentapioca_ray.stages.triangles import butterfly_count

    return butterfly_count(ray.data.from_pandas(df), "l", "r", **kw).to_pandas()


def test_salted_matches_unsalted_random(ray_session):
    """Exactness property: heavy salting (threshold 8, chunk 4 — many hubs,
    many chunk-pair kernels) must reproduce the unsalted census bit-for-bit
    on a random bipartite multigraph."""
    from opentapioca_ray.stages import triangles

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "l": rng.integers(0, 400, size=3000),
            "r": rng.integers(0, 40, size=3000),
        }
    )
    base = _run(df, hub_degree_threshold=10**9)
    assert triangles.BUTTERFLY_TELEMETRY["hubs"] == 0
    salted = _run(df, hub_degree_threshold=8, hub_chunk_size=4)
    assert triangles.BUTTERFLY_TELEMETRY["hubs"] > 0
    assert triangles.BUTTERFLY_TELEMETRY["chunk_tasks"] > 0
    pd.testing.assert_frame_equal(base, salted)


def test_planted_hub_bounded_and_exact(ray_session):
    """Planted 6000-degree hub (deg >> chunk size): the salted path must
    fan its C(6000,2) ≈ 18M wedge pairs across ceil(6000/512)=12-chunk
    pair kernels (78 tasks, each bounded by ~(2·512)² candidates instead
    of one 18M-pair allocation) and still produce the exact closed-form
    census."""
    from opentapioca_ray.stages import triangles

    n = 6000
    # hub right 0 over lefts 0..n-1; right 1 over lefts {0,1,2,3};
    # right 2 over lefts {0,1}
    df = pd.DataFrame(
        {
            "l": list(range(n)) + [0, 1, 2, 3] + [0, 1],
            "r": [0] * n + [1] * 4 + [2] * 2,
        }
    )
    out = _run(df, hub_degree_threshold=1000, hub_chunk_size=512)
    tel = triangles.BUTTERFLY_TELEMETRY
    assert tel["hubs"] == 1
    assert tel["max_chunks"] == 12  # ceil(6000/512)
    assert tel["chunk_tasks"] == 12 * 13 // 2
    row = out.iloc[0]
    assert row.n_edges == n + 6
    assert row.n_wedges == n * (n - 1) // 2 + 6 + 1
    assert row.n_left_pairs == n * (n - 1) // 2
    # cn({0,1}) = 3 -> C(3,2)=3; five pairs with cn=2 -> 5
    assert row.n_butterflies == 8


def test_hub_plan_arithmetic_50k():
    """The 50k-degree hub of the round-3 verdict maps to a bounded plan:
    13 chunks, 91 chunk-pair kernels, each seeing ≤ ~2 chunks of ~4096
    neighbors — never a C(50k,2) ≈ 1.25e9-pair single allocation."""
    s = 4096
    deg = 50_000
    m = -(-deg // s)
    assert m == 13
    assert m * (m + 1) // 2 == 91
    # worst-case per-kernel candidate pairs (two chunks, pre-filter)
    per_kernel = (2 * s) * (2 * s - 1) // 2
    assert per_kernel < 34_000_000  # ~0.27 GB packed u64 — bounded
    assert deg * (deg - 1) // 2 > 1_200_000_000  # what the guard avoids


def test_forced_salting_matches_sql_oracle_graph(ray_session):
    """Forced salting on the real sf0.001 part-supplier graph (threshold 2,
    chunk 4 -> every multi-edge right node salted, ~12k chunk-pair kernels)
    must reproduce the unsalted census exactly — the strongest end-to-end
    exactness pin for the hub guard."""
    import os

    import pytest

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/lineitem.parquet"):
        pytest.skip("testdata not present")
    from opentapioca_ray.sources.files import read_sized
    from opentapioca_ray.stages import triangles
    from opentapioca_ray.stages.triangles import butterfly_count

    li = read_sized(f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    base = butterfly_count(
        li, "l_partkey", "l_suppkey", hub_degree_threshold=10**9
    ).to_pandas()
    li2 = read_sized(f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    salted = butterfly_count(
        li2, "l_partkey", "l_suppkey", hub_degree_threshold=2, hub_chunk_size=4
    ).to_pandas()
    assert triangles.BUTTERFLY_TELEMETRY["hubs"] > 0
    assert triangles.BUTTERFLY_TELEMETRY["chunk_tasks"] > 1000
    pd.testing.assert_frame_equal(base, salted)
