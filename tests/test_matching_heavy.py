"""Heavy hitters, mutual best match, state intervals."""

import numpy as np
import pyarrow as pa


def test_heavy_hitters_exact(ray_session):
    import ray.data

    from opentapioca_ray.stages.sketches import heavy_hitters

    # 100 'a', 30 'b', 5 each of c..z-ish fillers; phi=0.1 -> cut at 20.5
    items = ["a"] * 100 + ["b"] * 30 + [f"f{i}" for i in range(15) for _ in range(5)]
    t = pa.table({"w": items})
    out = heavy_hitters(
        ray.data.from_arrow(t).repartition(6), "w", phi=0.1
    ).to_pandas()
    got = dict(zip(out["item"], out["count"]))
    assert got == {"a": 100, "b": 30}


def test_heavy_hitters_spread_across_blocks(ray_session):
    import ray.data

    from opentapioca_ray.stages.sketches import heavy_hitters

    # heavy item spread thin across many blocks, with per-block noise that
    # locally outnumbers it — the MG merge must still surface it
    rows = []
    for blk in range(20):
        rows += ["hh"] * 3 + [f"noise{blk}_{j}" for j in range(10)]
    t = pa.table({"w": rows})
    out = heavy_hitters(
        ray.data.from_arrow(t).repartition(20), "w", phi=0.2
    ).to_pandas()
    # N=260, cut=52; hh=60 qualifies, nothing else repeats
    assert dict(zip(out["item"], out["count"])) == {"hh": 60}


def test_mutual_best_match(ray_session):
    import ray.data

    from opentapioca_ray.stages.matching import mutual_best_match

    # 1's best is 2 (s=1); 2's best is 1 (s=1) -> mutual
    # 3's best is 4 (s=2); 4's best is 5 (s=1); 5's best is 4 -> (4,5) only
    t = pa.table(
        {
            "u": [1, 2, 3, 4],
            "v": [2, 3, 4, 5],
            "lev": [1, 5, 2, 1],
        }
    )
    out = mutual_best_match(
        ray.data.from_arrow(t).repartition(2), "u", "v", "lev"
    ).to_pandas()
    got = {(r["u"], r["v"]): r["lev"] for _, r in out.iterrows()}
    assert got == {(1, 2): 1, (4, 5): 1}


def test_state_intervals(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import state_intervals

    ts = np.array([0, 10, 20, 30, 40, 50], dtype="datetime64[us]")
    t = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": ts,
            "event_type": ["a", "a", "b", "a", "c", "c"],
            "event_id": [1, 2, 3, 4, 5, 6],
        }
    )
    out = state_intervals(ray.data.from_arrow(t).repartition(3)).to_pandas()
    rows = {
        (r["user_id"], r["start_us"]): (r["state"], r["end_us"], r["n_rows"])
        for _, r in out.iterrows()
    }
    assert rows == {
        (1, 0): ("a", 10, 2),
        (1, 20): ("b", 20, 1),
        (1, 30): ("a", 30, 1),
        (2, 40): ("c", 50, 2),
    }


def test_key_window_pairs(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.matching import key_window_pairs

    t = pa.table(
        {
            "id": [1, 3, 10, 30, 31, 100],
            "blk": ["a", "a", "a", "b", "b", "b"],
            "name": ["x1", "x3", "x10", "y30", "y31", "y100"],
        }
    )
    out = key_window_pairs(
        ray.data.from_arrow(t), "id", "blk", window=9, carry_columns=["name"]
    ).to_pandas()
    got = {(r["u"], r["v"]): (r["name_u"], r["name_v"]) for _, r in out.iterrows()}
    # window is by KEY DISTANCE: 1-3 (d=2), 3-10 (d=7), 30-31; never 1-10
    # (d=9 <= 9 actually) -> 1-10 IS within 9; 31-100 and cross-block never
    assert got == {
        (1, 3): ("x1", "x3"),
        (1, 10): ("x1", "x10"),
        (3, 10): ("x3", "x10"),
        (30, 31): ("y30", "y31"),
    }


def test_fs_weights_exact_counts(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.matching import fs_weights

    # 4 matches: agree on f 3/4 times; 6 non-matches: agree 1/6 times
    t = pa.table(
        {
            "is_match": [True] * 4 + [False] * 6,
            "f": [True, True, True, False] + [True] + [False] * 5,
        }
    )
    out = (
        fs_weights(ray.data.from_arrow(t).repartition(3), "is_match", ["f"])
        .to_pandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert r["field"] == "f"
    assert r["m"] == 0.75
    assert r["u"] == round(1 / 6, 6)
    assert r["w_agree"] == round(float(np.log2(0.75 / (1 / 6))), 6)
    assert r["w_disagree"] == round(float(np.log2(0.25 / (5 / 6))), 6)
