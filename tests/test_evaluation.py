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
