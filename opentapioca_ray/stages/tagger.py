"""Tagger stage: candidate generation over documents.

Ray-Data re-expression of the reference's Solr-backed tagger
(opentapioca/tagger.py:35-119): a stateful actor-pool `map_batches` stage.
Each actor builds, ONCE in `__init__`, from broadcast (`ray.put`) objects:

- a `SurfaceFormTrie` over every entity surface form (label + aliases +
  extra_aliases) — the FST dictionary analog;
- the BOW language model (surface log-likelihood);
- the pagerank vector (rank = 23 + log(pagerank), OOV 0.01/N).

Per batch it emits one row per (mention, candidate tag), already:
- truncated to 10,000 chars per doc (reference tagger.py:33,41),
- capped at 500 matches/doc (tagger.py:45) and top-10 tags/mention by rank
  (tagger.py:118),
- pruned of short lowercase/digit mentions (tagger.py:71-77),
- log_likelihood = NEGATIVE BOW log-likelihood (tagger.py:105,117).
"""

from __future__ import annotations

import pyarrow as pa

from opentapioca_ray.state.bow import BOWLanguageModel
from opentapioca_ray.state.graph import pagerank_from_vector
from opentapioca_ray.state.trie import SurfaceFormTrie
from opentapioca_ray.functions.text import prune_phrase

TAGS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("phrase", pa.string()),
        ("log_likelihood", pa.float64()),
        ("qid", pa.string()),
        ("label", pa.string()),
        ("rank", pa.float64()),
        ("nb_statements", pa.int32()),
        ("nb_sitelinks", pa.int32()),
        ("edges", pa.list_(pa.int64())),
    ]
)


class EntityCatalog:
    """In-actor entity side state: trie + per-entity records."""

    def __init__(self, entities: pa.Table):
        self.docs: dict[str, dict] = {}
        self.trie = SurfaceFormTrie()
        cols = entities.to_pydict()
        n = len(cols["id"])
        has = lambda name: name in cols
        for i in range(n):
            eid = cols["id"][i]
            label = cols["label"][i]
            rec = {
                "id": eid,
                "label": label,
                "aliases": cols["aliases"][i] if has("aliases") else [],
                "extra_aliases": cols["extra_aliases"][i] if has("extra_aliases") else [],
                "edges": cols["edges"][i] if has("edges") else [],
                "nb_statements": cols["nb_statements"][i] if has("nb_statements") else 0,
                "nb_sitelinks": cols["nb_sitelinks"][i] if has("nb_sitelinks") else 0,
            }
            self.docs[eid] = rec
            for form in [label, *(rec["aliases"] or []), *(rec["extra_aliases"] or [])]:
                if form:
                    self.trie.add(form, eid)


def tag_document(
    doc_id: str,
    text: str,
    catalog: EntityCatalog,
    bow: BOWLanguageModel,
    graph,
    max_length: int = 10000,
    tags_limit: int = 500,
    top_k: int = 10,
    prune: bool = True,
) -> list[dict]:
    """Reference `tag_and_rank` semantics over the in-actor trie."""
    text = text[:max_length]
    rows: list[dict] = []
    for start, end, ids in catalog.trie.match(text, tags_limit=tags_limit):
        surface = text[start:end]
        if prune and prune_phrase(surface):
            continue
        neg_ll = -bow.log_likelihood(surface)
        tags = []
        for eid in ids:
            rec = catalog.docs[eid]
            numeric = int(eid[1:]) if eid[:1] in ("Q", "R") and eid[1:].isdigit() else -1
            tags.append((rec, graph.rank_feature(numeric)))
        tags.sort(key=lambda t: -t[1])
        for rec, rank in tags[:top_k]:
            rows.append(
                {
                    "doc_id": doc_id,
                    "start": start,
                    "end": end,
                    "phrase": surface,
                    "log_likelihood": neg_ll,
                    "qid": rec["id"],
                    "label": rec["label"],
                    "rank": rank,
                    "nb_statements": int(rec["nb_statements"] or 0),
                    "nb_sitelinks": int(rec["nb_sitelinks"] or 0),
                    "edges": [int(e) for e in (rec["edges"] or [])],
                }
            )
    return rows


class TaggerStage:
    """Callable class for `ds.map_batches(TaggerStage, concurrency=N, ...)`.

    Constructor args are `ray.ObjectRef`s so the (large) entity table, BOW
    dict and pagerank vector ship through the object store once per actor,
    not once per batch.
    """

    def __init__(
        self,
        entities_ref,
        bow_ref=None,
        pagerank_ref=None,
        doc_id_column: str = "doc_id",
        text_column: str = "text",
        max_length: int = 10000,
        tags_limit: int = 500,
        top_k: int = 10,
        prune: bool = True,
    ):
        import numpy as np
        import ray

        def resolve(x):
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        self.catalog = EntityCatalog(resolve(entities_ref))
        bow = resolve(bow_ref)
        if bow is None:
            bow = BOWLanguageModel.from_counts({}, 0)
        elif isinstance(bow, dict):
            bow = BOWLanguageModel.from_counts(bow["word_count"], bow["total_count"])
        self.bow = bow
        pr = resolve(pagerank_ref)
        if pr is None:
            pr = np.array([1.0])
        self.graph = pagerank_from_vector(pr)
        self.doc_id_column = doc_id_column
        self.text_column = text_column
        self.max_length = max_length
        self.tags_limit = tags_limit
        self.top_k = top_k
        self.prune = prune
        # per-actor memo caches (round-3 verdict item 4): BOW likelihood /
        # prune verdict are pure functions of the surface string, and the
        # rank-sorted candidate list is pure per trie node — surfaces and
        # nodes repeat constantly across a corpus, so caching them removes
        # the per-match re-tokenization that dominated the profile. Keyed
        # by surface text / id(trie node list); both live for the actor's
        # lifetime, so ids are stable.
        self._surface_cache: dict = {}
        self._node_cache: dict = {}

    def _surface_info(self, surface: str):
        hit = self._surface_cache.get(surface)
        if hit is None:
            if self.prune and prune_phrase(surface):
                hit = (True, 0.0)
            else:
                hit = (False, -self.bow.log_likelihood(surface))
            self._surface_cache[surface] = hit
        return hit

    def _node_tags(self, ids: list):
        key = id(ids)
        hit = self._node_cache.get(key)
        if hit is None:
            tags = []
            for eid in ids:
                rec = self.catalog.docs[eid]
                numeric = (
                    int(eid[1:])
                    if eid[:1] in ("Q", "R") and eid[1:].isdigit()
                    else -1
                )
                tags.append((rec, self.graph.rank_feature(numeric)))
            tags.sort(key=lambda t: -t[1])
            hit = tuple(
                (
                    rec["id"],
                    rec["label"],
                    rank,
                    int(rec["nb_statements"] or 0),
                    int(rec["nb_sitelinks"] or 0),
                    [int(e) for e in (rec["edges"] or [])],
                )
                for rec, rank in tags[: self.top_k]
            )
            self._node_cache[key] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in TAGS_SCHEMA.names}
        app = {name: cols[name].append for name in TAGS_SCHEMA.names}
        doc_ids = batch.column(self.doc_id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        trie_match = self.catalog.trie.match
        for doc_id, text in zip(doc_ids, texts):
            if not text:
                continue
            doc_id = str(doc_id)
            text = text[: self.max_length]
            for start, end, ids in trie_match(text, tags_limit=self.tags_limit):
                pruned, neg_ll = self._surface_info(text[start:end])
                if pruned:
                    continue
                surface = text[start:end]
                for qid, label, rank, nb_st, nb_si, edges in self._node_tags(
                    ids
                ):
                    app["doc_id"](doc_id)
                    app["start"](start)
                    app["end"](end)
                    app["phrase"](surface)
                    app["log_likelihood"](neg_ll)
                    app["qid"](qid)
                    app["label"](label)
                    app["rank"](rank)
                    app["nb_statements"](nb_st)
                    app["nb_sitelinks"](nb_si)
                    app["edges"](edges)
        if not cols["doc_id"]:
            return TAGS_SCHEMA.empty_table()
        return pa.table(
            {
                name: pa.array(cols[name], type=TAGS_SCHEMA.field(name).type)
                for name in TAGS_SCHEMA.names
            },
            schema=TAGS_SCHEMA,
        )
