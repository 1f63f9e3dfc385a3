"""Int-code Aho-Corasick matcher equivalence (round-5 verdict item 3).

The compiled automaton (`state/trie.py: CompiledMatcher`) must reproduce the
position-restart trie walk (`SurfaceFormTrie.match`) exactly — same spans,
same entity-id lists, same NO_SUB filtering and cap — and the vectorized
`TaggerStage.__call__` built on it must emit byte-identical rows to the
per-row `tag_document` reference path.
"""

import random

import numpy as np
import pyarrow as pa
import pytest

from opentapioca_ray.stages.tagger import (
    EntityCatalog,
    TAGS_SCHEMA,
    TaggerStage,
    tag_document,
)
from opentapioca_ray.state.bow import BOWLanguageModel
from opentapioca_ray.state.graph import pagerank_from_vector
from opentapioca_ray.state.trie import SurfaceFormTrie
from opentapioca_ray.functions.text import tokenize_with_offsets

DICTS = {
    # overlapping multi-token keys, shared prefixes/suffixes, possessives
    "places": [
        ("Q1", "New York"),
        ("Q2", "New York City"),
        ("Q3", "York"),
        ("Q4", "City Hall"),
        ("Q5", "Vanuatu"),
        ("Q6", "Republic of Vanuatu"),
        ("Q7", "San Francisco Bay"),
        ("Q8", "Francisco"),
        ("Q9", "Universität Berlin"),
        ("Q10", "of"),  # prunable surface
    ],
    # single-token dictionary exercises the vectorized root fast path
    "words": [
        ("Q1", "alpha"),
        ("Q2", "beta"),
        ("Q3", "Gamma"),
        ("Q4", "delta's"),
    ],
    # suffix-link stress: keys that are suffixes of other keys
    "suffix": [
        ("Q1", "a b c d"),
        ("Q2", "b c d"),
        ("Q3", "c d"),
        ("Q4", "d"),
        ("Q5", "b c"),
    ],
}

WORDS = [
    "New", "York", "City", "Hall", "Vanuatu", "Republic", "of", "San",
    "Francisco", "Bay", "Universität", "Berlin", "alpha", "beta", "Gamma",
    "delta's", "a", "b", "c", "d", "noise", "words", "in", "between", "1 1",
]


def make_trie(pairs):
    trie = SurfaceFormTrie()
    for eid, phrase in pairs:
        trie.add(phrase, eid)
    return trie


def random_texts(seed, n=60):
    rng = random.Random(seed)
    texts = []
    for _ in range(n):
        k = rng.randint(0, 30)
        texts.append(" ".join(rng.choice(WORDS) for _ in range(k)))
    texts += [
        "",
        "New York City Hall in the Republic of Vanuatu",
        "a b c d b c d c d d",
        "Universität Berlin's York",
        "delta's alpha beta Gamma of of of",
    ]
    return texts


@pytest.mark.parametrize("name", sorted(DICTS))
def test_find_raw_matches_trie_walk(name):
    """Raw automaton hits == raw position-walk hits (pre-NO_SUB)."""
    trie = make_trie(DICTS[name])
    mat = trie.compiled()
    for text in random_texts(hash(name) & 0xFFFF):
        tokens = tokenize_with_offsets(text)
        # reference raw enumeration: walk from every position
        raw_ref = []
        root = trie._root
        for i in range(len(tokens)):
            node = root
            for j in range(i, min(len(tokens), i + trie.max_key_len)):
                nxt = node.get(tokens[j][0])
                if nxt is None:
                    break
                if nxt["$"]:
                    raw_ref.append((tokens[i][1], tokens[j][2], tuple(nxt["$"])))
                node = nxt["c"]
        codes = [mat.vocab.get(t, -1) for t, _, _ in tokens]
        rs, re_, rn = mat.find_raw(codes)
        raw_auto = sorted(
            (tokens[s][1], tokens[e][2], tuple(mat.out_ids[t]))
            for s, e, t in zip(rs, re_, rn)
        )
        assert raw_auto == sorted(raw_ref)


def entities_table(pairs):
    return pa.Table.from_pylist(
        [
            {
                "id": eid,
                "label": phrase,
                "aliases": [],
                "extra_aliases": [],
                "edges": [int(eid[1:]) * 7 % 13, 99],
                "nb_statements": int(eid[1:]),
                "nb_sitelinks": int(eid[1:]) % 3,
            }
            for eid, phrase in pairs
        ],
        schema=pa.schema(
            [
                ("id", pa.string()),
                ("label", pa.string()),
                ("aliases", pa.list_(pa.string())),
                ("extra_aliases", pa.list_(pa.string())),
                ("edges", pa.list_(pa.int64())),
                ("nb_statements", pa.int32()),
                ("nb_sitelinks", pa.int32()),
            ]
        ),
    )


@pytest.mark.parametrize("name", sorted(DICTS))
def test_stage_matches_tag_document(name):
    """Vectorized stage rows == per-row reference path rows, in order."""
    ents = entities_table(DICTS[name])
    catalog = EntityCatalog(ents)
    bow = BOWLanguageModel()
    bow.ingest(["alpha", "york", "vanuatu", "b", "c"])
    pr = (np.arange(1000) % 97 + 1) / 5000.0
    graph = pagerank_from_vector(pr)

    texts = random_texts(1234 + len(name), n=40)
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "text": pa.array(texts),
        }
    )
    stage = TaggerStage(
        ents,
        {"word_count": bow.word_count, "total_count": bow.total_count},
        pr,
    )
    got = stage(batch).to_pylist()

    want = []
    for i, text in enumerate(texts):
        want.extend(tag_document(f"d{i}", text, catalog, bow, graph))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for key in TAGS_SCHEMA.names:
            if isinstance(w[key], float):
                assert g[key] == pytest.approx(w[key]), key
            else:
                assert g[key] == w[key], key


def test_tags_limit_cap_via_stage():
    ents = entities_table([("Q1", "Xy")])
    stage = TaggerStage(ents, None, np.ones(4), tags_limit=5)
    batch = pa.table(
        {"doc_id": pa.array(["a"]), "text": pa.array([" ".join(["Xy"] * 50)])}
    )
    assert stage(batch).num_rows == 5


def test_truncation_respected_by_stage():
    ents = entities_table([("Q1", "zzz")])
    stage = TaggerStage(ents, None, np.ones(4), max_length=10)
    batch = pa.table(
        {"doc_id": pa.array(["a"]), "text": pa.array(["zzz aa " + "zzz " * 20])}
    )
    out = stage(batch)
    # only the occurrences inside the 10-char truncation window survive
    assert out.column("start").to_pylist() == [0, 7]
