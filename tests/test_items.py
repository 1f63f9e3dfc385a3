"""Item-accessor + indexing-profile goldens (reference test_wditem.py,
test_indexingprofile.py — fixtures rebuilt synthetically with the same
structure; goldens: extra aliases {'@IRIF_Paris','UMR8243'}, filtered-out
entity -> None, multi-type flags, label fallback)."""

import json

import pytest

from opentapioca_ray.sources.items import (
    AliasProperty,
    IndexingProfile,
    TypeConstraint,
    TypeMatcher,
    get_all_terms,
    get_default_label,
    get_identifiers,
    get_nb_sitelinks,
    get_nb_statements,
    get_outgoing_edges,
    get_types,
)


def claim(pid_value_qid=None, numeric=None, value=None, qualifiers=None):
    if value is None:
        value = {"id": pid_value_qid, "numeric-id": numeric}
    c = {"mainsnak": {"datavalue": {"value": value}}}
    if qualifiers:
        c["qualifiers"] = qualifiers
    return c


@pytest.fixture
def human_item():
    """Q62653454-like: a human with a P2427 (GRID) id."""
    return {
        "id": "Q62653454",
        "lastrevid": 900557325,
        "labels": {"en": {"value": "Elisabeth Hauterive"}},
        "descriptions": {"en": {"value": "researcher"}},
        "aliases": {"en": [{"value": "E. Hauterive"}]},
        "claims": {
            "P31": [claim("Q5", 5)],
            "P108": [claim("Q777", 777)],
        },
        "sitelinks": {},
    }


@pytest.fixture
def org_item():
    """Q51783269-like: org with GRID + Twitter + acronym alias properties."""
    return {
        "id": "Q51783269",
        "lastrevid": 2,
        "labels": {"en": {"value": "IRIF"}},
        "descriptions": {},
        "aliases": {},
        "claims": {
            "P31": [claim("Q43229", 43229)],
            "P2427": [{"mainsnak": {"datavalue": {"value": "grid.1234.5"}}}],
            "P2002": [{"mainsnak": {"datavalue": {"value": "IRIF_Paris"}}}],
            "P4550": [{"mainsnak": {"datavalue": {"value": "UMR8243"}}}],
        },
        "sitelinks": {},
    }


@pytest.fixture
def tree_item():
    """Q8502-like: a mountain — filtered out by the affiliations profile."""
    return {
        "id": "Q8502",
        "labels": {"en": {"value": "mountain"}},
        "claims": {"P31": [claim("Q99999", 99999)]},
        "sitelinks": {},
    }


@pytest.fixture
def matcher():
    # static closure fixture (mirrors the reference's TypeMatcherStub,
    # test_indexingprofile.py:16-25)
    return TypeMatcher(
        {"Q5": {5, 62653454}, "Q43229": {43229, 3918, 43702, 51783269}, "Q618123": {618123, 43702}}
    )


@pytest.fixture
def profile():
    return IndexingProfile(
        name="affiliations",
        language="en",
        restrict_types=[
            TypeConstraint(qid="Q43229", pid="P31"),
            TypeConstraint(qid="Q618123", pid="P31"),
            TypeConstraint(qid="Q5", pid="P31"),
        ],
        restrict_properties=["P2427", "P1566", "P496"],
        alias_properties=[
            AliasProperty(property="P496"),
            AliasProperty(property="P2002", prefix="@"),
            AliasProperty(property="P4550"),
        ],
    )


def test_accessors(human_item):
    assert get_default_label(human_item, "en") == "Elisabeth Hauterive"
    assert get_nb_statements(human_item) == 2
    assert get_nb_sitelinks(human_item) == 0
    assert get_types(human_item) == ["Q5"]
    assert get_all_terms(human_item) == {"Elisabeth Hauterive", "E. Hauterive"}
    assert get_outgoing_edges(human_item) == [5, 777]
    assert get_outgoing_edges(human_item, include_p31=False) == [777]
    assert get_identifiers(human_item, "P108") == [{"id": "Q777", "numeric-id": 777}]


def test_label_fallback():
    item = {"labels": {"fr": {"value": "seulement"}}}
    assert get_default_label(item, "en") == "seulement"
    item2 = {"labels": {"en": {"value": "en label"}, "de": {"value": "de"}}}
    assert get_default_label(item2, "nl") == "en label"
    assert get_default_label({"labels": {}}, "en") is None


def test_qualifier_edges():
    item = {
        "claims": {
            "P361": [
                claim(
                    "Q1",
                    1,
                    qualifiers={"P580": [{"datavalue": {"value": {"numeric-id": 55}}}]},
                )
            ]
        }
    }
    assert get_outgoing_edges(item) == [1, 55]


def test_entity_to_document(profile, human_item, matcher):
    doc = profile.entity_to_document(human_item, matcher)
    assert doc is not None
    assert doc["label"] == "Elisabeth Hauterive"
    assert doc["revid"] == 900557325
    assert doc["aliases"] == ["E. Hauterive"]


def test_filtered_out(profile, tree_item, matcher):
    assert profile.entity_to_document(tree_item, matcher) is None


def test_extra_aliases(profile, org_item, matcher):
    doc = profile.entity_to_document(org_item, matcher)
    assert doc is not None
    types = json.loads(doc["types"])
    assert types["Q43229"]
    assert types["P2427"]
    assert set(doc["extra_aliases"]) == {"@IRIF_Paris", "UMR8243"}


def test_profile_json_roundtrip(profile, tmp_path):
    f = str(tmp_path / "p.json")
    profile.save(f)
    loaded = IndexingProfile.load(f)
    assert loaded.json() == profile.json()
    assert loaded.restrict_properties == ["P2427", "P1566", "P496"]


def test_no_restriction_profile_keeps_all(human_item, tree_item, matcher):
    profile = IndexingProfile(name="all")
    assert profile.entity_to_document(human_item, matcher) is not None
    assert profile.entity_to_document(tree_item, matcher) is not None
