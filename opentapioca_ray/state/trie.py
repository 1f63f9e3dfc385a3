"""Token-trie dictionary matcher with Solr `overlaps=NO_SUB` semantics.

Replaces the reference's Solr FST `/tag` handler (reference
opentapioca/tagger.py:35-77 + configsets/tapioca/conf/solrconfig.xml): the
dictionary is every normalized surface form (label + aliases +
extra_aliases) of every entity; a query emits every dictionary match whose
span is not strictly contained in another match's span (NO_SUB), capped at
`tags_limit` matches per document (reference tagger.py:45).

Tokens are normalized with the SAME analyzer chain on the index and query
side (functions/text.py: analyze_phrase / tokenize_with_offsets) — the
blocking-key parity requirement.

Built once per Tagger actor in `__init__` from the broadcast entities table;
matching is a per-token-position trie walk, O(text_tokens × max_key_len).
"""

from __future__ import annotations

from opentapioca_ray.functions.text import analyze_phrase, tokenize_with_offsets


class SurfaceFormTrie:
    """Token-level trie: tuple-of-normalized-tokens -> list of entity ids."""

    __slots__ = ("_root", "max_key_len")

    def __init__(self):
        self._root: dict = {}
        self.max_key_len = 0

    def add(self, phrase: str, entity_id) -> None:
        key = analyze_phrase(phrase)
        if not key:
            return
        node = self._root
        for tok in key:
            nxt = node.get(tok)
            if nxt is None:
                nxt = {"$": None, "c": {}}
                node[tok] = nxt
            node = nxt["c"]
            last = nxt
        if last["$"] is None:
            last["$"] = []
        if entity_id not in last["$"]:
            last["$"].append(entity_id)
        self.max_key_len = max(self.max_key_len, len(key))

    @classmethod
    def from_entities(cls, ids, surface_form_lists) -> "SurfaceFormTrie":
        """Build from parallel sequences of entity id -> list of surface forms."""
        trie = cls()
        for eid, forms in zip(ids, surface_form_lists):
            for form in forms:
                if form:
                    trie.add(form, eid)
        return trie

    def match(self, text: str, tags_limit: int = 500) -> list[tuple[int, int, list]]:
        """All NO_SUB matches as `(start_char, end_char, entity_ids)`.

        1. tokenize with offsets; 2. at every token position walk the trie
        collecting every dictionary hit; 3. drop hits strictly contained in
        another hit; 4. cap at `tags_limit` (document order).
        """
        tokens = tokenize_with_offsets(text)
        n = len(tokens)
        raw: list[tuple[int, int, list]] = []
        for i in range(n):
            node = self._root
            for j in range(i, min(n, i + self.max_key_len)):
                nxt = node.get(tokens[j][0])
                if nxt is None:
                    break
                if nxt["$"]:
                    raw.append((tokens[i][1], tokens[j][2], nxt["$"]))
                node = nxt["c"]
        if not raw:
            return []
        # NO_SUB: drop spans strictly contained in another span. Sorted by
        # (start asc, end desc), span (s,e) is contained in some earlier span
        # iff the running max end over earlier spans is >= e (earlier spans
        # all have start <= s; equal (s,e) spans cannot repeat).
        raw.sort(key=lambda m: (m[0], -m[1]))
        kept: list[tuple[int, int, list]] = []
        running_max_end = -1
        for start, end, ids in raw:
            if end <= running_max_end:
                continue
            running_max_end = end
            kept.append((start, end, ids))
            if len(kept) >= tags_limit:
                break
        return kept
