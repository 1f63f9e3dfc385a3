"""Fidelity of the dependency-free NIF reader against the reference's real
shipped corpora (reference data/*.ttl, loaded by classifier.py:174-195 via
pynif; SURVEY.md §5 records the expected context counts)."""

import os

import pytest

from opentapioca_ray.functions.nif import parse_nif_turtle

DATA = "/root/reference/data"

# Actual `a nif:Context` subject counts per file. (SURVEY.md §5 quoted
# 751/251/376/126 by counting the string "nif:Context", which also hits the
# one nif:ContextCollection header per file — off by one each.)
EXPECTED_CONTEXTS = {
    "istex_train.ttl": 750,
    "istex_test.ttl": 250,
    "RSS-500_wd.train.ttl": 375,
    "RSS-500_wd.test.ttl": 125,
}


def _load(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"reference corpus {name} not available")
    with open(path, encoding="utf-8") as f:
        return parse_nif_turtle(f.read())


@pytest.mark.parametrize("name,expected", sorted(EXPECTED_CONTEXTS.items()))
def test_context_counts_match_survey(name, expected):
    contexts = _load(name)
    assert len(contexts) == expected


def test_istex_train_phrases_anchor_offsets_consistent():
    contexts = _load("istex_train.ttl")
    n_phrases = sum(len(c["phrases"]) for c in contexts)
    assert n_phrases > 1500  # 2073 taIdentRef statements in the file
    checked = 0
    for c in contexts:
        assert c["text"], f"context {c['uri']} lost its isString"
        for p in c["phrases"]:
            # NIF offsets are character offsets into isString: the anchor
            # text must be exactly the slice
            assert c["text"][p["begin"] : p["end"]] == p["phrase"], (
                c["uri"],
                p,
            )
            assert p["gold_qid"] is None or p["gold_qid"].startswith("Q")
            checked += 1
    assert checked == n_phrases


def test_rss500_gold_ids_present():
    contexts = _load("RSS-500_wd.test.ttl")
    golds = [
        p["gold_qid"] for c in contexts for p in c["phrases"] if p["gold_qid"]
    ]
    assert len(golds) > 50
