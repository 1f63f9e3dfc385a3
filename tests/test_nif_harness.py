"""End-to-end F1 on the reference's REAL labeled corpora (ISTEX /
RSS-500 .ttl from /root/reference/data) through the full Ray pipeline:
corpus-derived catalog -> trie tagger -> BOW -> similarity -> linear
classifier -> micro P/R/F1 (reference classifier.py:221-260). Pinned
intervals, not exact values: design-matrix row order (take_all block
order) can vary across runs, moving the fitted weights slightly."""

import os

import pytest

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/istex_train.ttl"),
    reason="reference corpora not present",
)


def test_istex_end_to_end_f1(ray_session):
    from opentapioca_ray.pipelines.nif_harness import run_f1

    m = run_f1(f"{DATA}/istex_train.ttl", f"{DATA}/istex_test.ttl")
    assert m["nb_gold"] == 670
    assert m["precision"] >= 0.90, m
    assert 0.55 <= m["recall"] <= 0.90, m
    assert 0.70 <= m["f1"] <= 0.92, m


def test_rss500_end_to_end_f1(ray_session):
    from opentapioca_ray.pipelines.nif_harness import run_f1

    m = run_f1(f"{DATA}/RSS-500_wd.train.ttl", f"{DATA}/RSS-500_wd.test.ttl")
    assert m["nb_gold"] == 151
    assert m["precision"] >= 0.75, m
    assert 0.45 <= m["recall"] <= 0.85, m
    assert 0.55 <= m["f1"] <= 0.85, m
