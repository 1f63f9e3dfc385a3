"""Annotation output projections: mention/tag JSON and NIF round-trip.

Re-expressions of the reference's output formatters (behavior, not code):
- `Mention.json()` / `Tag.json()` API projections (reference
  opentapioca/mention.py:22-30, tag.py:48-62) -> `mention_json_rows`;
- NIF phrase output `Mention.add_phrase_to_nif_context` (reference
  mention.py:46-65, served at /api/nif, app.py:83-103) -> `to_nif_turtle`;
- NIF corpus loading (reference uses pynif at classifier.py:174-195; the
  `data/*.ttl` ISTEX/RSS-500 corpora) -> `parse_nif_turtle`, a dependency-
  free reader for the subset of NIF 2.0 those corpora use (contexts with
  isString + phrases with beginIndex/endIndex/taIdentRef).
"""

from __future__ import annotations

import re

NIF_PREFIXES = """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
"""


def mention_json_rows(result_df) -> list[dict]:
    """Classify-result rows (RESULT_COLUMNS) -> per-document annotation JSON:
    one dict per document with its mentions, each mention carrying its
    candidate tags and the winning entity (reference Mention.json shape)."""
    out: list[dict] = []
    for doc_id, doc_rows in result_df.groupby("doc_id", sort=True):
        mentions = []
        for (start, end), m_rows in doc_rows.groupby(["start", "end"], sort=True):
            first = m_rows.iloc[0]
            tags = [
                {
                    "id": r["qid"],
                    "score": float(r["score"]),
                    "valid": bool(r["is_best"]),
                }
                for _, r in m_rows.iterrows()
            ]
            mentions.append(
                {
                    "phrase": first["phrase"],
                    "start": int(start),
                    "end": int(end),
                    "best_qid": None if first["best_qid"] is None else str(first["best_qid"]),
                    "tags": tags,
                }
            )
        out.append({"doc_id": doc_id, "mentions": mentions})
    return out


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def to_nif_turtle(doc_uri: str, text: str, mentions: list[dict], only_matching: bool = True) -> str:
    """Document + mentions -> NIF 2.0 Turtle (one context + one phrase per
    mention). `only_matching=True` keeps only mentions with a winning entity
    (the reference's `only_matching` flag, app.py:96-99)."""
    n = len(text)
    lines = [NIF_PREFIXES]
    ctx = f"<{doc_uri}#offset_0_{n}>"
    lines.append(
        f"{ctx} a nif:Context, nif:OffsetBasedString ;\n"
        f'    nif:isString "{_escape(text)}"^^xsd:string ;\n'
        f'    nif:beginIndex "0"^^xsd:nonNegativeInteger ;\n'
        f'    nif:endIndex "{n}"^^xsd:nonNegativeInteger .\n'
    )
    for m in mentions:
        qid = m.get("best_qid")
        if only_matching and not qid:
            continue
        start, end = int(m["start"]), int(m["end"])
        phrase = f"<{doc_uri}#offset_{start}_{end}>"
        body = (
            f"{phrase} a nif:OffsetBasedString, nif:Phrase ;\n"
            f'    nif:anchorOf "{_escape(m["phrase"])}"^^xsd:string ;\n'
            f'    nif:beginIndex "{start}"^^xsd:nonNegativeInteger ;\n'
            f'    nif:endIndex "{end}"^^xsd:nonNegativeInteger ;\n'
            f"    nif:referenceContext {ctx}"
        )
        if qid:
            body += f" ;\n    itsrdf:taIdentRef <http://www.wikidata.org/entity/{qid}>"
        lines.append(body + " .\n")
    return "\n".join(lines)


# Context subjects come in three shapes across the reference's corpora and
# this engine's own output: `<doc#offset_0_N>` (our serving path and the
# reference's), plain `<.../train/17>` (data/istex_*.ttl), and
# `<...#char=0,150>` (data/RSS-500_wd*.ttl, NIF char-fragment style) — the
# offset fragment, when present, is stripped to form the context key. The
# negative lookahead keeps `nif:ContextCollection` headers from parsing as
# contexts. Phrases are recognized by their `nif:Phrase` type and carry
# their offsets as beginIndex/endIndex properties (falling back to the URI
# fragment), so both fragment styles parse identically.
_CTX_RE = re.compile(
    r"(<[^>]*>)\s+a[^.]*?nif:Context(?![A-Za-z])(?P<body>.*?)(?<!\\)\.\s*\n",
    re.DOTALL,
)
_IS_STRING_RE = re.compile(r'nif:isString\s+"(?P<s>(?:[^"\\]|\\.)*)"')
_PHRASE_RE = re.compile(
    r"<(?P<uri>[^>]*)>\s+a[^.]*?nif:Phrase(?P<body>.*?)(?<!\\)\.\s*\n",
    re.DOTALL,
)
_REF_RE = re.compile(r"itsrdf:taIdentRef\s+<[^>]*/(?P<q>Q\d+)>")
_ANCHOR_RE = re.compile(r'nif:anchorOf\s+"(?P<s>(?:[^"\\]|\\.)*)"')
_REFCTX_RE = re.compile(r"nif:referenceContext\s+<(?P<uri>[^>]*)>")
_BEGIN_RE = re.compile(r'nif:beginIndex\s+"(\d+)"')
_END_RE = re.compile(r'nif:endIndex\s+"(\d+)"')
_FRAG_RE = re.compile(r"(.*)#(?:offset_(\d+)_(\d+)|char=(\d+),(\d+))$")


def _ctx_key(uri: str) -> str:
    m = _FRAG_RE.match(uri)
    return m.group(1) if m else uri


def _unescape(s: str) -> str:
    return s.replace("\\n", "\n").replace('\\"', '"').replace("\\\\", "\\")


def parse_nif_turtle(ttl: str) -> list[dict]:
    """Turtle NIF corpus -> list of contexts:
    {uri, text, phrases: [{begin, end, phrase, gold_qid}]}."""
    contexts: dict[str, dict] = {}
    for m in _CTX_RE.finditer(ttl):
        uri = _ctx_key(m.group(1)[1:-1])
        s = _IS_STRING_RE.search(m.group("body"))
        contexts[uri] = {
            "uri": uri,
            "text": _unescape(s.group("s")) if s else "",
            "phrases": [],
        }
    for m in _PHRASE_RE.finditer(ttl):
        body = m.group("body")
        ref = _REFCTX_RE.search(body)
        uri = _ctx_key(ref.group("uri") if ref else m.group("uri"))
        if uri not in contexts:
            continue
        b = _BEGIN_RE.search(body)
        e = _END_RE.search(body)
        if b and e:
            begin, end = int(b.group(1)), int(e.group(1))
        else:
            frag = _FRAG_RE.match(m.group("uri"))
            if not frag:
                continue
            begin = int(frag.group(2) or frag.group(4))
            end = int(frag.group(3) or frag.group(5))
        anchor = _ANCHOR_RE.search(body)
        gold = _REF_RE.search(body)
        contexts[uri]["phrases"].append(
            {
                "begin": begin,
                "end": end,
                "phrase": _unescape(anchor.group("s")) if anchor else "",
                "gold_qid": gold.group("q") if gold else None,
            }
        )
    return list(contexts.values())
