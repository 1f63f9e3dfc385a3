"""Dump / stream sources.

- `read_wikidata_dump`: JSON-lines (optionally .bz2 / bracketed JSON-array
  lines) -> items Dataset. Ray-native replacement for the reference's
  single-threaded iterator (opentapioca/readers/dumpreader.py:6-36): the
  file is read as text blocks and parsed inside `map_batches`, so parsing
  scales with the cluster instead of one process. The reference's
  line-format quirks are preserved: trailing `,` stripped, bare `[` / `]`
  lines skipped, unparseable lines dropped.
- `items_from_seed`: driver-side seed list (the SparqlReader analog,
  reference readers/sparqlreader.py:11-46 — the query step is a driver-side
  seed, the fetch becomes `from_items`).
- Delta/stream ingestion (reference readers/streamreader.py) is covered by
  re-running the batch pipeline on a delta partition + `compact_by_key`
  (stages/dedup.py) — see SURVEY.md §2.10.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _parse_lines(batch: pa.Table) -> pa.Table:
    out = []
    for line in batch.column("text").to_pylist():
        if line is None:
            continue
        line = line.strip()
        if not line or line in ("[", "]"):
            continue
        if line.endswith(","):
            line = line[:-1]
        try:
            item = json.loads(line)
        except ValueError:
            continue
        out.append({"id": item.get("id", ""), "item_json": json.dumps(item)})
    return pa.Table.from_pylist(
        out, schema=pa.schema([("id", pa.string()), ("item_json", pa.string())])
    )


def read_wikidata_dump(path: str):
    """Path to a .json / .jsonl (optionally .bz2) dump -> Dataset of
    (id, item_json) rows."""
    import ray.data

    arrow_open_stream_args = None
    if path.endswith(".bz2"):
        arrow_open_stream_args = {"compression": "bz2"}
    ds = ray.data.read_text(path, arrow_open_stream_args=arrow_open_stream_args)
    return ds.map_batches(_parse_lines, batch_format="pyarrow")


def items_from_seed(items: list[dict]):
    """Driver-side seed (SPARQL-reader analog): list of parsed item dicts."""
    import ray.data

    return ray.data.from_items(
        [{"id": it.get("id", ""), "item_json": json.dumps(it)} for it in items]
    )
