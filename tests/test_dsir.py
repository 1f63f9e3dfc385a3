"""DSIR importance weights: quantized per-feature log ratios, int64 sums."""

import pandas as pd
import pytest


def test_dsir_weights_hand_case(ray_session):
    import ray.data

    from opentapioca_ray.stages.dsir import dsir_weights

    # target doc (en): bigrams {a b: 2, b a: 1}; source doc (fr):
    # {a b: 1, b c: 1, c d: 1}. T=3, S=6.
    # r(a b) = ln(2/3) - ln(3/6) = ln(4/3) -> 287682 e6
    # r(b a) = ln(1/3) - ln(1/6) = ln(2)  -> 693147 e6
    # b c / c d unseen in target -> 0
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b a b", "lang": "en"},
            {"doc_id": 2, "text": "a b c d", "lang": "fr"},
        ]
    )
    out = (
        dsir_weights(ds, target_column="lang", target_value="en")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_feats"] == 3
    assert out.loc[2, "n_feats"] == 3
    assert out.loc[1, "weight_e6"] == 2 * 287682 + 693147
    assert out.loc[2, "weight_e6"] == 287682


def test_dsir_short_and_empty_docs(ray_session):
    import ray.data

    from opentapioca_ray.stages.dsir import dsir_weights

    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "only", "lang": "en"},
            {"doc_id": 2, "text": "", "lang": "en"},
            {"doc_id": 3, "text": "x y", "lang": "en"},
        ]
    )
    out = dsir_weights(ds).to_pandas()
    # docs 1/2 have no bigrams; doc 3's only bigram has t=s, T=S -> ratio 0
    assert out["doc_id"].tolist() == [3]
    assert out["weight_e6"].tolist() == [0]


def test_dsir_no_target_docs_returns_empty(ray_session):
    import ray.data

    from opentapioca_ray.stages.dsir import dsir_weights

    ds = ray.data.from_items([{"doc_id": 1, "text": "a b c", "lang": "fr"}])
    out = dsir_weights(ds, target_value="en").to_pandas()
    assert len(out) == 0
