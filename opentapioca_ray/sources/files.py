"""The `files` table (BASELINE.json input_hint):
(repo, path, commit, lang, content) + derived (file_id, sha256).

`files_from_documents` derives the table deterministically from the
driver-generated `documents` parquet (no wall-clock, no randomness beyond
content hashes), so tests/bench/oracles all see the same rows. The sha256
column is computed in the FIRST map over the data and carried through every
stage — the per-row invariant vs the reference (input_hint).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from opentapioca_ray.functions.text import sha256_hex

FILES_SCHEMA = pa.schema(
    [
        ("file_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("sha256", pa.string()),
    ]
)

_EXT = {"en": "py", "fr": "js", "de": "java", "es": "md", "zh": "rs"}


def _files_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    rows = []
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        text = text or ""
        repo = f"org{doc_id % 20}/{source}"
        ext = _EXT.get(lang, "txt")
        path = f"src/pkg{doc_id % 7}/mod_{doc_id}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}@{doc_id}".encode()).hexdigest()
        rows.append(
            {
                "file_id": int(doc_id),
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": text,
                "sha256": sha256_hex(text),
            }
        )
    return pa.Table.from_pylist(rows, schema=FILES_SCHEMA)


def files_from_documents(documents_ds):
    """documents Dataset -> files Dataset (stateless zero-copy map)."""
    return documents_ds.map_batches(_files_batch, batch_format="pyarrow")


def read_files(sf_dir: str):
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return files_from_documents(docs)


def verify_sha256(ds, id_column: str = "file_id") -> int:
    """Recompute the digest at the sink and count mismatches (should be 0)."""

    def check(batch: pa.Table) -> pa.Table:
        bad = 0
        for content, digest in zip(
            batch.column("content").to_pylist(), batch.column("sha256").to_pylist()
        ):
            if sha256_hex(content or "") != digest:
                bad += 1
        return pa.table({"mismatches": pa.array([bad], type=pa.int64())})

    out = ds.map_batches(check, batch_format="pyarrow")
    return int(out.sum("mismatches") or 0)
