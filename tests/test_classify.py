"""Classifier-semantics goldens (reference test_classifier.py:63-82 and
classifier.py:262-374)."""

import numpy as np
import pandas as pd
import pytest

from opentapioca_ray.stages.classify import (
    ClassifierParams,
    MentionRec,
    TagRec,
    build_feature_matrix,
    classify_mentions,
    compute_similarities,
    doc_design_matrix,
    evaluate_predictions,
    mentions_from_rows,
)
from opentapioca_ray.state.linear import LinearModel


def make_tag(id, edges=None, rank=1.0, nb_statements=0, nb_sitelinks=0):
    return TagRec(
        id=id,
        label=id,
        rank=rank,
        nb_statements=nb_statements,
        nb_sitelinks=nb_sitelinks,
        edges=edges or [],
    )


def vanuatu_mentions():
    # 'Vanuatu is very very far appart from Sweden, an EU member'
    return [
        MentionRec("d", "Vanuatu", 0, 7, 1.0, [make_tag("Q686")]),
        MentionRec("d", "Sweden", 37, 43, 1.0, [make_tag("Q34", edges=[458])]),
        MentionRec("d", "EU", 48, 50, 1.0, [make_tag("Q458")]),
    ]


def test_compute_similarities_golden():
    mentions = vanuatu_mentions()
    params = ClassifierParams(max_similarity_distance=10, similarity_smoothing=2)
    compute_similarities(mentions, params)
    id1 = (0, 7, "Q686")
    id2 = (37, 43, "Q34")
    id3 = (48, 50, "Q458")
    sims = [m.tags[0].similarities for m in mentions]
    assert sims[0] == [{"tag": id1, "score": 1.0}]
    assert sims[1][0]["tag"] == id2
    assert sims[1][0]["score"] == pytest.approx(0.57, abs=0.01)
    assert sims[1][1]["tag"] == id3
    assert sims[1][1]["score"] == pytest.approx(0.42, abs=0.01)
    assert sims[2][0]["tag"] == id3
    assert sims[2][0]["score"] == pytest.approx(0.57, abs=0.01)
    assert sims[2][1]["tag"] == id2
    assert sims[2][1]["score"] == pytest.approx(0.42, abs=0.01)


def test_feature_matrix_shape_and_propagation():
    mentions = vanuatu_mentions()
    params = ClassifierParams(max_similarity_distance=10, similarity_smoothing=2)
    compute_similarities(mentions, params)
    features, idx = build_feature_matrix(mentions, nb_steps=2)
    assert features.shape == (3, 15)  # 5 base features x (1 + 2 steps)
    assert len(idx) == 3
    # base block col 4 is the constant 1
    np.testing.assert_allclose(features[:, 4], 1.0)
    # propagated block of the isolated Vanuatu tag keeps its self-loop mass
    v_idx = idx[(0, 7, "Q686")]
    assert features[v_idx, 9] == pytest.approx(1.0)  # A @ ones with self-loop 1.0


def test_classify_argmax_positive_threshold():
    mentions = [
        MentionRec(
            "d",
            "X",
            0,
            1,
            1.0,
            [make_tag("Q1", rank=5.0), make_tag("Q2", rank=1.0)],
        )
    ]
    params = ClassifierParams(nb_steps=0)
    compute_similarities(mentions, params)
    # model scoring rank: w picks feature 1
    model = LinearModel(C=1.0, max_iter=50)
    model.scaler.mean_ = np.zeros(5)
    model.scaler.scale_ = np.ones(5)
    model.w = np.array([0.0, 1.0, 0.0, 0.0, 0.0])
    model.b = -2.0
    classify_mentions(mentions, model, params)
    assert mentions[0].best_qid == "Q1"
    # negative-score-only mention gets no winner (threshold 0)
    model.b = -10.0
    classify_mentions(mentions, model, params)
    assert mentions[0].best_qid is None


def test_mentions_from_rows_roundtrip():
    df = pd.DataFrame(
        [
            {
                "doc_id": "d",
                "start": 0,
                "end": 7,
                "phrase": "Vanuatu",
                "log_likelihood": 2.5,
                "qid": "Q686",
                "label": "Vanuatu",
                "rank": 3.0,
                "nb_statements": 4,
                "nb_sitelinks": 5,
                "edges": [1, 2],
            },
            {
                "doc_id": "d",
                "start": 0,
                "end": 7,
                "phrase": "Vanuatu",
                "log_likelihood": 2.5,
                "qid": "Q99",
                "label": "other",
                "rank": 7.0,
                "nb_statements": 1,
                "nb_sitelinks": 1,
                "edges": [],
            },
        ]
    )
    mentions = mentions_from_rows(df)
    assert len(mentions) == 1
    assert [t.id for t in mentions[0].tags] == ["Q99", "Q686"]  # rank desc


def test_design_matrix_validity():
    mentions = vanuatu_mentions()
    params = ClassifierParams(max_similarity_distance=10, similarity_smoothing=2)
    compute_similarities(mentions, params)
    gold = {(0, 7): "Q686", (37, 43): "Q999"}
    X, y = doc_design_matrix(mentions, gold, params)
    assert len(X) == 3
    assert y == [1, 0, 0]  # Q686 valid, Q34 != Q999, Q458 unlabeled


def test_evaluate_predictions():
    pred = pd.DataFrame(
        [
            {"doc_id": "a", "start": 0, "end": 7, "best_qid": "Q686"},
            {"doc_id": "a", "start": 10, "end": 12, "best_qid": "Q1"},
        ]
    )
    gold = pd.DataFrame(
        [
            {"doc_id": "a", "begin": 0, "end": 7, "gold_qid": "Q686"},
            {"doc_id": "a", "begin": 20, "end": 25, "gold_qid": "Q2"},
        ]
    )
    m = evaluate_predictions(pred, gold)
    assert m["precision"] == 0.5
    assert m["recall"] == 0.5
    assert m["f1"] == 0.5
