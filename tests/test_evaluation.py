"""Exact Mann-Whitney AUC: brute-force parity incl. ties and forced
multi-partition range splits."""

import numpy as np


def _brute_u2(scores, labels):
    u2 = 0
    for sp, lp in zip(scores, labels):
        if not lp:
            continue
        for sn, ln in zip(scores, labels):
            if ln:
                continue
            if sp > sn:
                u2 += 2
            elif sp == sn:
                u2 += 1
    return u2


def test_roc_auc_matches_bruteforce(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import roc_auc

    rng = np.random.default_rng(11)
    # heavy ties: scores drawn from 12 distinct values
    scores = rng.choice(np.round(rng.normal(0, 1, 12), 3), 300)
    labels = rng.random(300) < (0.3 + 0.4 * (scores > 0))
    rows = [
        {"s": float(s), "y": "pos" if l else "neg"}
        for s, l in zip(scores, labels)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    out = roc_auc(ds, "s", "y", "pos", n_parts=4).to_pandas()
    assert len(out) == 1
    want_u2 = _brute_u2(scores.tolist(), labels.tolist())
    n_pos, n_neg = int(labels.sum()), int((~labels).sum())
    assert int(out["u2"].iloc[0]) == want_u2
    assert int(out["n_pos"].iloc[0]) == n_pos
    assert int(out["n_neg"].iloc[0]) == n_neg
    assert int(out["auc_e6"].iloc[0]) == int(
        np.floor(1e6 * want_u2 / (2.0 * n_pos * n_neg) + 0.5)
    )


def test_roc_auc_degenerate_single_class(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import roc_auc

    rows = [{"s": float(i), "y": "pos"} for i in range(20)]
    out = roc_auc(ray.data.from_items(rows), "s", "y", "pos").to_pandas()
    assert int(out["n_neg"].iloc[0]) == 0
    assert int(out["auc_e6"].iloc[0]) == 0


def test_welch_t_matches_manual(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import welch_t_stats

    rng = np.random.default_rng(5)
    ua = rng.integers(50, 150, 200)
    ub = rng.integers(60, 160, 150)
    rows = [{"arm": 0, "u": int(x)} for x in ua] + [
        {"arm": 1, "u": int(x)} for x in ub
    ]
    out = welch_t_stats(
        ray.data.from_items(rows).repartition(4), "arm", "u"
    ).to_pandas()
    na, nb = len(ua), len(ub)
    sa, sb = int(ua.sum()), int(ub.sum())
    qa, qb = int((ua * ua).sum()), int((ub * ub).sum())
    va = (qa - float(sa) * float(sa) / na) / (na - 1)
    vb = (qb - float(sb) * float(sb) / nb) / (nb - 1)
    want = int(
        np.floor(1e6 * (sa / na - sb / nb) / np.sqrt(va / na + vb / nb) + 0.5)
    )
    assert int(out["t_e6"].iloc[0]) == want
    assert int(out["n_a"].iloc[0]) == na and int(out["n_b"].iloc[0]) == nb
    # sanity vs textbook Welch on the same data
    mean_diff = sa / na - sb / nb
    assert (want < 0) == (mean_diff < 0)


def test_kendall_tau_matches_bruteforce(ray_session):
    import ray.data

    from opentapioca_ray.stages.evaluation import kendall_tau_binned

    rng = np.random.default_rng(41)
    x = rng.integers(1, 8, 500)
    y = rng.integers(0, 60, 500)  # heavy y ties across partitions
    rows = [{"x": int(a), "y": int(b)} for a, b in zip(x, y)]
    out = kendall_tau_binned(
        ray.data.from_items(rows).repartition(6), "x", "y", n_parts=4
    ).to_pandas()
    c = d = 0
    for i in range(len(x)):
        for j in range(len(x)):
            if y[i] < y[j]:
                if x[i] < x[j]:
                    c += 1
                elif x[i] > x[j]:
                    d += 1
    assert int(out["c"].iloc[0]) == c
    assert int(out["d"].iloc[0]) == d
    n = len(x)
    n0 = n * (n - 1) // 2

    def ties(v):
        _, cnt = np.unique(v, return_counts=True)
        return int((cnt * (cnt - 1) // 2).sum())

    assert int(out["n1"].iloc[0]) == ties(x)
    assert int(out["n2"].iloc[0]) == ties(y)
    want = int(
        np.floor(
            1e6 * (c - d) / np.sqrt(float(n0 - ties(x)) * float(n0 - ties(y)))
            + 0.5
        )
    )
    assert int(out["taub_e6"].iloc[0]) == want


def test_rbo_identical_and_disjoint(ray_session):
    import math

    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.evaluation import rbo_depth_table

    # identical rankings -> overlap d at every depth, term = (1-p)p^(d-1)
    df = pd.DataFrame(
        {"id": [1, 2, 3, 4], "a": [40, 30, 20, 10], "b": [8, 6, 4, 2]}
    )
    out = rbo_depth_table(
        ray.data.from_pandas(df), "a", "b", "id", depth=4, p=0.9
    ).to_pandas()
    assert out["overlap"].tolist() == [1, 2, 3, 4]
    want = [
        math.floor((1.0 - 0.9) * 0.9 ** (d - 1) * d / d * 1e9 + 0.5)
        for d in (1, 2, 3, 4)
    ]
    assert out["term_e9"].tolist() == want
    assert out["rbo_e9"].iloc[-1] == sum(want)

    # reversed rankings of 4: overlap 0,0,2,4
    df2 = pd.DataFrame(
        {"id": [1, 2, 3, 4], "a": [40, 30, 20, 10], "b": [2, 4, 6, 8]}
    )
    out2 = rbo_depth_table(
        ray.data.from_pandas(df2), "a", "b", "id", depth=4, p=0.9
    ).to_pandas()
    assert out2["overlap"].tolist() == [0, 0, 2, 4]


def test_ndcg_hand_case(ray_session):
    import math

    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.evaluation import ndcg_at_k

    # ranking by v desc: ids 1,2,3 with rel 0,2,1 -> DCG uses grades in
    # ranked order [0,2,1]; ideal order [2,1,0]
    df = pd.DataFrame(
        {"id": [1, 2, 3], "v": [30, 20, 10], "rel": [0, 2, 1]}
    )
    out = ndcg_at_k(
        ray.data.from_pandas(df), "v", "rel", "id", k=3
    ).to_pandas().iloc[0]
    disc = [math.floor(1e6 / math.log2(r + 1) + 0.5) for r in (1, 2, 3)]
    dcg = 0 * disc[0] + 2 * disc[1] + 1 * disc[2]
    idcg = 2 * disc[0] + 1 * disc[1] + 0 * disc[2]
    assert out.dcg_e6 == dcg
    assert out.idcg_e6 == idcg
    assert out.ndcg_e6 == dcg * 1_000_000 // idcg

    # perfect ranking -> ndcg exactly 1e6
    df2 = pd.DataFrame(
        {"id": [1, 2, 3], "v": [30, 20, 10], "rel": [2, 1, 0]}
    )
    out2 = ndcg_at_k(
        ray.data.from_pandas(df2), "v", "rel", "id", k=3
    ).to_pandas().iloc[0]
    assert out2.ndcg_e6 == 1_000_000
