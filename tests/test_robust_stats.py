"""Winsorized means / grouped MAD / stratified split / footrule: parity
with brute-force references on randomized inputs."""

import hashlib

import numpy as np


def _md5_u64_one(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")


def _type1(sorted_vals, p):
    n = len(sorted_vals)
    return sorted_vals[max(1, int(np.ceil(p * n))) - 1]


def test_winsorized_means_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.aggregates import winsorized_group_means

    rng = np.random.default_rng(13)
    rows = [
        {"g": str(rng.integers(0, 4)), "c": int(rng.integers(-500, 5000))}
        for _ in range(800)
    ]
    out = (
        winsorized_group_means(
            ray.data.from_items(rows).repartition(4), "g", "c"
        )
        .to_pandas()
        .set_index("g")
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["c"])
    for g, vals in by_g.items():
        sv = np.sort(np.array(vals, dtype=np.int64))
        lo, hi = _type1(sv, 0.05), _type1(sv, 0.95)
        clipped = np.clip(sv, lo, hi)
        assert int(out.loc[g, "sum_c"]) == int(clipped.sum())
        assert int(out.loc[g, "n"]) == len(vals)
        want = int(np.floor(10000.0 * int(clipped.sum()) / len(vals) + 0.5))
        assert int(out.loc[g, "wmean_c_e4"]) == want


def test_grouped_mad_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.aggregates import grouped_mad

    rng = np.random.default_rng(17)
    rows = [
        {"g": str(rng.integers(0, 3)), "c": int(rng.integers(0, 1000))}
        for _ in range(500)
    ]
    out = (
        grouped_mad(ray.data.from_items(rows).repartition(4), "g", "c")
        .to_pandas()
        .set_index("g")
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["c"])
    for g, vals in by_g.items():
        sv = np.sort(np.array(vals, dtype=np.int64))
        med = _type1(sv, 0.5)
        mad = _type1(np.sort(np.abs(sv - med)), 0.5)
        assert int(out.loc[g, "med_c"]) == int(med)
        assert int(out.loc[g, "mad_c"]) == int(mad)


def test_stratified_split_exact_quotas(ray_session):
    import ray.data

    from opentapioca_ray.stages.selection import stratified_split_labels

    rng = np.random.default_rng(23)
    rows = [
        {"id": i, "s": str(rng.integers(0, 3))} for i in range(601)
    ]
    out = stratified_split_labels(
        ray.data.from_items(rows).repartition(4), "id", "s"
    ).to_pandas()
    for s, grp in out.groupby("s"):
        n = len(grp)
        counts = grp["split"].value_counts()
        assert counts.get("train", 0) == int(np.floor(n * 0.8))
        assert counts.get("val", 0) == int(np.floor(n * 0.9)) - int(
            np.floor(n * 0.8)
        )
    # deterministic: same labels regardless of partitioning
    out2 = stratified_split_labels(
        ray.data.from_items(rows).repartition(7), "id", "s"
    ).to_pandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = out2.sort_values("id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    # rank order within a stratum follows (md5, id)
    s0 = out[out["s"] == "0"]
    ordered = sorted(s0["id"], key=lambda i: (_md5_u64_one(i), i))
    train_ids = set(s0[s0["split"] == "train"]["id"])
    k = int(np.floor(len(s0) * 0.8))
    assert set(ordered[:k]) == train_ids


def test_footrule_matches_bruteforce(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import footrule_stats

    rng = np.random.default_rng(29)
    rows = [
        {
            "id": i,
            "a": float(rng.integers(0, 40)),  # heavy ties
            "b": float(rng.integers(0, 40)),
        }
        for i in range(300)
    ]
    out = footrule_stats(
        ray.data.from_items(rows).repartition(5), "id", "a", "b"
    ).to_pandas()
    ra = {
        r["id"]: k + 1
        for k, r in enumerate(sorted(rows, key=lambda r: (r["a"], r["id"])))
    }
    rb = {
        r["id"]: k + 1
        for k, r in enumerate(sorted(rows, key=lambda r: (r["b"], r["id"])))
    }
    want = sum(abs(ra[i] - rb[i]) for i in ra)
    assert int(out["footrule"].iloc[0]) == want
    assert int(out["n"].iloc[0]) == len(rows)


def test_late_event_counts_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.windows import late_event_counts

    rng = np.random.default_rng(31)
    base = 1_700_000_000_000_000  # us
    rows = []
    for i in range(400):
        rows.append(
            {
                "arrival": int(i * 7919 % 400000 * 1000 + i),
                "ts": pd.Timestamp(base + int(rng.integers(0, 3_600_000_000)), unit="us"),
                "event_type": str(rng.integers(0, 3)),
            }
        )
    ds = ray.data.from_items(rows).repartition(5)
    out = late_event_counts(
        ds, order_column="arrival", allowed_lateness_us=600_000_000
    ).to_pandas()
    got = {
        r["g"]: (int(r["n_late"]), int(r["n_events"]))
        for _, r in out.iterrows()
    }
    srt = sorted(rows, key=lambda r: r["arrival"])
    want = {}
    run = None
    for r in srt:
        t = int(pd.Timestamp(r["ts"]).value // 1000)  # ns -> us
        g = r["event_type"]
        n_late, n = want.get(g, (0, 0))
        late = run is not None and t < run - 600_000_000
        want[g] = (n_late + (1 if late else 0), n + 1)
        run = t if run is None else max(run, t)
    assert got == want
