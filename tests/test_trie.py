"""Dictionary-matcher goldens: Vanuatu offsets [10,17]
(reference test_taggerfactory.py:70-71), NO_SUB overlap semantics
(Solr /tag handler, reference tagger.py:44)."""

from opentapioca_ray.state.trie import SurfaceFormTrie


def build(entries):
    trie = SurfaceFormTrie()
    for phrase, eid in entries:
        trie.add(phrase, eid)
    return trie


def test_vanuatu_offsets():
    trie = build([("Vanuatu", "Q686")])
    assert trie.match("I live in Vanuatu") == [(10, 17, ["Q686"])]


def test_possessive_and_fold_match():
    trie = build([("Vanuatu", "Q686"), ("Universität", "Q1")])
    # query-side possessive strip
    m = trie.match("Vanuatu's parliament")
    assert m[0][:2] == (0, 9)
    assert m[0][2] == ["Q686"]
    # ascii-fold parity both sides
    assert trie.match("at Universitat Berlin")[0][2] == ["Q1"]


def test_no_sub_drops_contained():
    trie = build([("New York", "Q60"), ("York", "Q42"), ("New York City", "Q60b")])
    m = trie.match("welcome to New York City")
    # only the longest span survives; 'York' and 'New York' are contained
    assert len(m) == 1
    assert m[0][2] == ["Q60b"]
    # standalone York still matches
    m2 = trie.match("York is old")
    assert m2[0][2] == ["Q42"]


def test_overlapping_not_nested_both_kept():
    trie = build([("San Francisco", "A"), ("Francisco Bay", "B")])
    m = trie.match("San Francisco Bay area")
    assert len(m) == 2


def test_multi_entity_same_surface():
    trie = build([("Mercury", "Q308"), ("Mercury", "Q925")])
    m = trie.match("Mercury rises")
    assert sorted(m[0][2]) == ["Q308", "Q925"]


def test_tags_limit():
    trie = build([("a1", "X")])
    text = " ".join(["a1"] * 600)
    assert len(trie.match(text, tags_limit=500)) == 500


def test_case_sensitive():
    # analyzer chain has no lowercasing (managed-schema:63-75)
    trie = build([("Vanuatu", "Q686")])
    assert trie.match("i live in vanuatu") == []
