"""Wikidata-style item accessors + indexing profile.

Behavior parity with the reference's item wrapper and profile-driven index
projection (opentapioca/wditem.py:2-111, opentapioca/indexingprofile.py:3-205,
opentapioca/typematcher.py:4-51). Items are plain parsed-JSON dicts; the
profile turns an item into a flat entity record or None (filtered out) —
the core index-build map (SURVEY.md M2-M10), run distributed via
`map_batches` in pipelines/index_build.py.

The type-subclass closure is a static broadcast fixture (dict parent_qid ->
set of numeric descendant qids) instead of the reference's per-run SPARQL
fetch — exactly how the reference's own tests stub it
(test_indexingprofile.py:16-25).
"""

from __future__ import annotations

import json

from opentapioca_ray.functions.text import to_q


# --- item accessors (reference wditem.py) -----------------------------------

def get_outgoing_edges(item: dict, include_p31: bool = True, numeric: bool = True) -> list:
    claims = item.get("claims", {})
    final_key = "numeric-id" if numeric else "id"
    res = []
    for pid, pclaims in claims.items():
        if pid == "P31" and not include_p31:
            continue
        for c in pclaims:
            try:
                res.append(c["mainsnak"]["datavalue"]["value"][final_key])
            except (KeyError, TypeError):
                pass
            for qs in c.get("qualifiers", {}).values():
                for q in qs:
                    try:
                        res.append(q["datavalue"]["value"][final_key])
                    except (KeyError, TypeError):
                        pass
    return res


def get_nb_statements(item: dict) -> int:
    return sum(len(pclaims) for pclaims in item.get("claims", {}).values())


def get_nb_sitelinks(item: dict) -> int:
    return len(item.get("sitelinks", []))


def get_types(item: dict, pid: str = "P31") -> list[str]:
    return [
        qid
        for qid in (
            claim.get("mainsnak", {}).get("datavalue", {}).get("value", {}).get("id")
            for claim in item.get("claims", {}).get(pid, [])
        )
        if qid
    ]


def get_default_label(item: dict, language: str) -> str | None:
    """Preferred-language label, fallback en, fallback any
    (reference wditem.py:69-82)."""
    labels = item.get("labels", {})
    preferred = labels.get(language, {}).get("value")
    if preferred:
        return preferred
    enlabel = labels.get("en", {}).get("value")
    if enlabel:
        return enlabel
    for other_lang in labels:
        return labels.get(other_lang, {}).get("value")
    return None


def get_all_terms(item: dict) -> set[str]:
    terms = {label["value"] for label in item.get("labels", {}).values()}
    for aliases in item.get("aliases", {}).values():
        terms |= {alias["value"] for alias in aliases}
    return terms


def get_identifiers(item: dict, pid: str) -> list:
    return [
        v
        for v in (
            claim.get("mainsnak", {}).get("datavalue", {}).get("value", {})
            for claim in item.get("claims", {}).get(pid, [])
        )
        if v
    ]


# --- type matcher (static closure fixture) ----------------------------------

class TypeMatcher:
    """`is_subclass(q1, q2)` against a broadcast dict of transitive
    subclass closures: {parent_qid: {numeric descendant ids}}."""

    def __init__(self, closures: dict[str, set] | None = None):
        self.sets = {k: set(v) for k, v in (closures or {}).items()}

    def is_subclass(self, qid_1: str, qid_2: str) -> bool:
        closure = self.sets.get(qid_2)
        if closure is None:
            return False
        return int(qid_1[1:]) in closure

    def to_json(self) -> dict:
        return {k: sorted(v) for k, v in self.sets.items()}

    @classmethod
    def from_json(cls, dct: dict) -> "TypeMatcher":
        return cls({k: set(v) for k, v in dct.items()})


# --- indexing profile --------------------------------------------------------

class AliasProperty:
    def __init__(self, property: str, prefix: str | None = None):
        self.property = property
        self.prefix = prefix

    def json(self):
        return {"property": self.property, "prefix": self.prefix}

    @classmethod
    def from_json(cls, repr):
        return cls(property=repr["property"], prefix=repr.get("prefix"))

    def extract(self, item: dict) -> list[str]:
        values = get_identifiers(item, self.property)
        if self.prefix:
            values = [self.prefix + v for v in values]
        return values


class TypeConstraint:
    def __init__(self, qid: str, pid: str):
        self.qid = qid
        self.pid = pid

    def json(self):
        return {"type": self.qid, "property": self.pid}

    @classmethod
    def from_json(cls, repr):
        return cls(qid=repr["type"], pid=repr["property"])

    def satisfied(self, item: dict, type_matcher: TypeMatcher) -> bool:
        return any(
            type_matcher.is_subclass(qid, self.qid) for qid in get_types(item, self.pid)
        )


class IndexingProfile:
    """Declarative selection/enrichment config (reference
    indexingprofile.py:76-205; profiles/*.json)."""

    def __init__(
        self,
        name: str | None = None,
        solrconfig: str = "tapioca",
        language: str = "en",
        restrict_types: list[TypeConstraint] | None = None,
        restrict_properties: list[str] | None = None,
        alias_properties: list[AliasProperty] | None = None,
    ):
        self.name = name
        self.solrconfig = solrconfig
        self.language = language
        self.restrict_types = restrict_types
        self.restrict_properties = restrict_properties
        self.alias_properties = alias_properties or []

    def entity_to_document(self, item: dict, type_matcher: TypeMatcher) -> dict | None:
        """Profile-driven filter + flat projection
        (reference indexingprofile.py:106-157)."""
        type_features = {
            constraint.qid: constraint.satisfied(item, type_matcher)
            for constraint in self.restrict_types or []
        }
        type_features.update(
            {
                pid: get_identifiers(item, pid) != []
                for pid in self.restrict_properties or []
            }
        )
        correct_type = any(type_features.values())
        valid_item = correct_type or (
            not self.restrict_types and not self.restrict_properties
        )
        if not valid_item:
            return None

        enlabel = get_default_label(item, self.language)
        endesc = item.get("descriptions", {}).get(self.language, {}).get("value")
        if not enlabel:
            return None

        aliases = get_all_terms(item)
        aliases.remove(enlabel)
        edges = get_outgoing_edges(item, include_p31=False, numeric=True)
        extra_aliases: list[str] = []
        for extractor in self.alias_properties:
            extra_aliases += extractor.extract(item)

        return {
            "id": item.get("id"),
            "revid": item.get("lastrevid") or 1,
            "label": enlabel,
            "desc": endesc or "",
            "edges": edges,
            "types": json.dumps(type_features),
            "aliases": list(aliases),
            "extra_aliases": extra_aliases,
            "nb_statements": get_nb_statements(item),
            "nb_sitelinks": get_nb_sitelinks(item),
        }

    def json(self) -> dict:
        return {
            "name": self.name,
            "solrconfig": self.solrconfig,
            "language": self.language,
            "restrict_types": [c.json() for c in self.restrict_types or []],
            "restrict_properties": self.restrict_properties,
            "alias_properties": [a.json() for a in self.alias_properties],
        }

    @classmethod
    def from_json(cls, repr: dict) -> "IndexingProfile":
        return cls(
            name=repr.get("name"),
            solrconfig=repr.get("solrconfig") or "tapioca",
            language=repr.get("language") or "en",
            restrict_types=[
                TypeConstraint.from_json(d) for d in repr.get("restrict_types") or []
            ]
            or None,
            restrict_properties=repr.get("restrict_properties"),
            alias_properties=[
                AliasProperty.from_json(d) for d in repr.get("alias_properties") or []
            ],
        )

    @classmethod
    def load(cls, filename: str) -> "IndexingProfile":
        with open(filename) as f:
            return cls.from_json(json.load(f))

    def save(self, filename: str) -> None:
        with open(filename, "w") as f:
            json.dump(self.json(), f, indent=4)
