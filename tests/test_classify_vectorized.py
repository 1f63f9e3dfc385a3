"""Vectorized nb_steps=0 classify kernel == the per-doc dataclass path.

`classify_partition_vectorized` must reproduce the MentionRec/TagRec path
row for row — same scores, same strict-argmax winner under the exact
(rank desc, original row order) tie-break — across random partitions that
include score ties, negative-score mentions and multi-doc frames.
"""

import numpy as np
import pandas as pd
import pytest

from opentapioca_ray.stages.classify import (
    ClassifierParams,
    RESULT_COLUMNS,
    classify_mentions,
    classify_partition_vectorized,
    compute_similarities,
    mentions_from_rows,
)
from opentapioca_ray.state.linear import LinearModel


def make_model(w, b):
    return LinearModel.from_dict(
        {
            "C": 0.001,
            "max_iter": 1,
            "lr": 0.05,
            "w": list(w),
            "b": b,
            "mean": [0.0] * 5,
            "scale": [1.0] * 5,
        }
    )


def reference_rows(df, model, params):
    out = []
    for _, doc_df in df.groupby("doc_id", sort=False):
        mentions = mentions_from_rows(doc_df)
        compute_similarities(mentions, params)
        classify_mentions(mentions, model, params)
        for m in mentions:
            for t in m.tags:
                out.append(
                    {
                        "doc_id": m.doc_id,
                        "start": m.start,
                        "end": m.end,
                        "phrase": m.phrase,
                        "qid": t.id,
                        "score": t.score,
                        "is_best": t.id == m.best_qid,
                        "best_qid": m.best_qid,
                    }
                )
    return pd.DataFrame(out, columns=RESULT_COLUMNS)


def random_partition(seed, n_docs=6):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        for mstart in sorted(rng.choice(200, size=rng.integers(0, 5), replace=False)):
            mend = int(mstart) + int(rng.integers(3, 10))
            n_tags = int(rng.integers(1, 5))
            # occasional duplicated feature rows force score ties
            dup = rng.random() < 0.5 and n_tags > 1
            for t in range(n_tags):
                base = 0 if dup and t < 2 else t
                rows.append(
                    {
                        "doc_id": f"doc{d}",
                        "start": int(mstart),
                        "end": mend,
                        "phrase": f"p{mstart}",
                        "log_likelihood": float(base) * 0.7,
                        "qid": f"Q{mstart}_{t}",
                        "label": "L",
                        "rank": 20.0 - base,  # equal ranks for dup rows
                        "nb_statements": base % 4,
                        "nb_sitelinks": (base * 2) % 3,
                        "edges": [1, 2],
                    }
                )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_vectorized_matches_reference(seed):
    df = random_partition(seed)
    if df.empty:
        pytest.skip("empty draw")
    params = ClassifierParams(nb_steps=0)
    # weights chosen so some mentions score below the threshold
    model = make_model([0.1, 1.0, 0.5, -0.9, 0.3], -20.0)
    got = classify_partition_vectorized(df, model, params)
    want = reference_rows(df, model, params)
    key = ["doc_id", "start", "end", "qid"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for col in RESULT_COLUMNS:
        if col == "score":
            assert np.allclose(
                got[col].astype(float), want[col].astype(float)
            ), col
        else:
            assert got[col].tolist() == want[col].tolist(), col


def test_threshold_respected():
    df = random_partition(7)
    params = ClassifierParams(nb_steps=0, score_threshold=5.0)
    model = make_model([0.0, 1.0, 0.0, 0.0, 0.0], -16.0)  # scores ~ rank-16
    got = classify_partition_vectorized(df, model, params)
    accepted = got[got.is_best]
    assert (accepted["score"] > 5.0).all()
    rejected_mentions = got[got.best_qid.isna()]
    # every mention with no winner has ALL its scores <= threshold
    assert (
        rejected_mentions.groupby(["doc_id", "start", "end"])["score"].max()
        <= 5.0
    ).all()


def random_gold(df, seed):
    """Gold for ~half the mentions; some with qids not among the tags."""
    rng = np.random.default_rng(seed + 99)
    rows = []
    for (d, s, e), grp in df.groupby(["doc_id", "start", "end"]):
        r = rng.random()
        if r < 0.4:
            rows.append(
                {"doc_id": d, "begin": s, "end": e,
                 "gold_qid": grp["qid"].iloc[int(rng.integers(len(grp)))]}
            )
        elif r < 0.55:
            rows.append({"doc_id": d, "begin": s, "end": e, "gold_qid": "Q_none"})
    return pd.DataFrame(rows, columns=["doc_id", "begin", "end", "gold_qid"])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_design_rows_vectorized_matches_doc_design_matrix(seed):
    from opentapioca_ray.stages.classify import (
        design_rows_vectorized,
        doc_design_matrix,
    )

    df = random_partition(seed, n_docs=5)
    if df.empty:
        pytest.skip("empty draw")
    gold = random_gold(df, seed)
    params = ClassifierParams(nb_steps=0)

    docs, X, y = design_rows_vectorized(df, gold, params)

    gold_by_doc = {}
    for r in gold.itertuples():
        gold_by_doc.setdefault(str(r.doc_id), {})[(r.begin, r.end)] = r.gold_qid
    want = []
    for doc_id, doc_df in df.groupby("doc_id", sort=False):
        mentions = mentions_from_rows(doc_df)
        Xd, yd = doc_design_matrix(
            mentions, gold_by_doc.get(str(doc_id), {}), params
        )
        for row, lab in zip(Xd, yd):
            want.append((str(doc_id), tuple(np.round(row, 9)), int(lab)))
    got = [
        (str(d), tuple(np.round(x, 9)), int(l))
        for d, x, l in zip(docs, X, y)
    ]
    assert sorted(got) == sorted(want)
