"""Fellegi-Sunter histogram + quantized EM (stages/probabilistic.py)."""

import numpy as np
import pytest

from opentapioca_ray.stages.probabilistic import E9, fs_em


def _two_sides(n=200, seed=3):
    """A + perturbed B with known truth: same id = same entity. Field 1
    agrees on ~90% of matches / ~5% of non-matches; field 2 ~70% / ~20%."""
    rng = np.random.default_rng(seed)
    a, b = [], []
    for i in range(n):
        blk = int(i % 5)
        f1 = f"v{i}"
        f2 = f"w{i % 40}"
        a.append({"k": i, "blk": blk, "f1": f1, "f2": f2, "x": i * 10})
        b.append(
            {
                "k": i,
                "blk": blk,
                "f1": f1 if rng.random() < 0.9 else f"alt{i}",
                "f2": f2 if rng.random() < 0.7 else f"w{(i + 1) % 40}",
                "x": i * 10 + (0 if rng.random() < 0.8 else 7),
            }
        )
    return a, b


def _brute_hist(a, b):
    from collections import Counter

    n_pairs, n_same = Counter(), Counter()
    for ra in a:
        for rb in b:
            if ra["blk"] != rb["blk"]:
                continue
            g = (
                int(ra["f1"] == rb["f1"]),
                int(ra["f2"] == rb["f2"]),
                int(abs(ra["x"] - rb["x"]) <= 5),
            )
            n_pairs[g] += 1
            n_same[g] += int(ra["k"] == rb["k"])
    return n_pairs, n_same


def test_histogram_matches_brute_force(ray_session):
    import ray.data

    from opentapioca_ray.stages.probabilistic import fs_pattern_histogram

    a, b = _two_sides()
    hist = fs_pattern_histogram(
        ray.data.from_items(a),
        ray.data.from_items(b),
        key_column="k",
        block_column="blk",
        eq_columns=["f1", "f2"],
        tol_columns=[("x", 5)],
        n_parts=4,
    ).to_pandas()
    exp_n, exp_same = _brute_hist(a, b)
    got = {
        (r.g1, r.g2, r.g3): (r.n_pairs, r.n_same_key)
        for r in hist.itertuples()
    }
    assert got == {g: (exp_n[g], exp_same[g]) for g in exp_n}


def test_em_separates_planted_mixture():
    """All-agree pattern posterior high, all-disagree near zero, learned
    m > u per field, rare-match lambda recovered. K=3 binary fields is the
    smallest identifiable FS model (2^K - 1 pattern dof >= 2K + 1 params);
    K=2 is classically non-identifiable and EM lands on arbitrary optima."""
    # exact-count histogram from a planted mixture: 500 matches agreeing
    # w.p. .95/.9/.85 per field, 50k non-matches w.p. .05/.1/.2
    patterns = []
    for g1 in (0, 1):
        for g2 in (0, 1):
            for g3 in (0, 1):
                pm = (
                    (0.95 if g1 else 0.05)
                    * (0.9 if g2 else 0.1)
                    * (0.85 if g3 else 0.15)
                    * 500
                )
                pu = (
                    (0.05 if g1 else 0.95)
                    * (0.1 if g2 else 0.9)
                    * (0.2 if g3 else 0.8)
                    * 50_000
                )
                patterns.append(
                    {
                        "g1": g1,
                        "g2": g2,
                        "g3": g3,
                        "n_pairs": int(round(pm + pu)),
                        "n_same_key": int(round(pm)),
                    }
                )
    fit = fs_em(patterns, n_fields=3, iters=30)
    post = fit["posterior_e9"]
    assert post[0b111] > 0.85 * E9
    assert post[0b000] < 0.02 * E9
    for k in range(3):
        assert fit["m_e9"][k] > fit["u_e9"][k]
    assert fit["lam_e9"] < 0.05 * E9  # matches are rare (true 0.0099)


def test_em_quantized_determinism():
    """Same histogram -> bit-identical parameter trajectory (pure integer
    function), regardless of row order."""
    patterns = [
        {"g1": 1, "g2": 1, "n_pairs": 120, "n_same_key": 90},
        {"g1": 1, "g2": 0, "n_pairs": 400, "n_same_key": 10},
        {"g1": 0, "g2": 1, "n_pairs": 300, "n_same_key": 5},
        {"g1": 0, "g2": 0, "n_pairs": 5000, "n_same_key": 0},
    ]
    f1 = fs_em(patterns, n_fields=2, iters=7)
    f2 = fs_em(list(reversed(patterns)), n_fields=2, iters=7)
    assert f1 == f2


def test_em_empty_histogram():
    fit = fs_em([], n_fields=3, iters=5)
    assert fit["posterior_e9"] == {}
    assert fit["lam_e9"] == E9 // 2


def test_match_edges_filters_by_pattern(ray_session):
    """fs_match_edges emits exactly the non-self blocked pairs whose gamma
    pattern is accepted, as distinct (u, v) with u < v."""
    import ray.data

    from opentapioca_ray.stages.probabilistic import fs_match_edges

    a, b = _two_sides(n=80)
    accepted = {0b111, 0b110}
    exp = set()
    for ra in a:
        for rb in b:
            if ra["blk"] != rb["blk"] or ra["k"] == rb["k"]:
                continue
            pat = (
                (int(ra["f1"] == rb["f1"]) << 2)
                | (int(ra["f2"] == rb["f2"]) << 1)
                | int(abs(ra["x"] - rb["x"]) <= 5)
            )
            if pat in accepted:
                exp.add((min(ra["k"], rb["k"]), max(ra["k"], rb["k"])))
    got = {
        (r["u"], r["v"])
        for r in fs_match_edges(
            ray.data.from_items(a),
            ray.data.from_items(b),
            key_column="k",
            block_column="blk",
            eq_columns=["f1", "f2"],
            tol_columns=[("x", 5)],
            accepted_patterns=accepted,
            n_parts=4,
        ).take_all()
    }
    assert got == exp


def test_match_edges_empty_accept_set(ray_session):
    import ray.data

    from opentapioca_ray.stages.probabilistic import fs_match_edges

    a, b = _two_sides(n=20)
    out = fs_match_edges(
        ray.data.from_items(a),
        ray.data.from_items(b),
        key_column="k",
        block_column="blk",
        eq_columns=["f1", "f2"],
        tol_columns=[("x", 5)],
        accepted_patterns=set(),
        n_parts=4,
    ).take_all()
    assert out == []


def test_block_side_cap_bounds_pairs(ray_session):
    """max_block_side truncates hot blocks: total pairs bounded by
    blocks * cap^2. (The drop warning is logged inside Ray workers, which
    pytest's caplog cannot observe — the bound is the testable effect.)"""
    import ray.data

    from opentapioca_ray.stages.probabilistic import fs_pattern_histogram

    a, b = _two_sides(n=60)
    hist = fs_pattern_histogram(
        ray.data.from_items(a),
        ray.data.from_items(b),
        key_column="k",
        block_column="blk",
        eq_columns=["f1", "f2"],
        tol_columns=[("x", 5)],
        max_block_side=5,
        n_parts=4,
    ).to_pandas()
    assert 0 < hist["n_pairs"].sum() <= 5 * 5 * 5  # 5 blocks, capped sides
