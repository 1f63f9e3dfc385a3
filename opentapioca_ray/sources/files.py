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


_REPLICATE_STRIDE = 10_000_000


def replicate_files(files_ds, n: int):
    """Deterministic n-fold scale-up of the files table for saturation
    benchmarks: copy k gets file_id + k*stride and every token suffixed
    `_k`, so copies occupy DISJOINT shingle spaces — the near-dup structure
    within each copy is preserved, copies never pair with each other, and
    the workload scales linearly in shape. Purely derived — no randomness,
    no wall-clock."""
    if n <= 1:
        return files_ds

    def expand(batch: pa.Table) -> pa.Table:
        tables = [batch]
        for k in range(1, n):
            ids = [i + k * _REPLICATE_STRIDE for i in batch.column("file_id").to_pylist()]
            suffix = f"_{k}"
            contents = [
                " ".join(t + suffix for t in (c or "").split(" "))
                for c in batch.column("content").to_pylist()
            ]
            tables.append(
                pa.table(
                    {
                        "file_id": pa.array(ids, type=pa.int64()),
                        "repo": batch.column("repo"),
                        "path": batch.column("path"),
                        "commit": batch.column("commit"),
                        "lang": batch.column("lang"),
                        "content": pa.array(contents, type=pa.large_string()),
                        "sha256": pa.array(
                            [sha256_hex(c) for c in contents], type=pa.string()
                        ),
                    }
                ).cast(FILES_SCHEMA)
            )
        return pa.concat_tables([t.cast(FILES_SCHEMA) for t in tables])

    return files_ds.map_batches(expand, batch_format="pyarrow")


def read_files(sf_dir: str, replicate: int = 1):
    """files table; `replicate` scales it n-fold (disjoint token spaces).

    The base parquet reads as only ~8 blocks and `replicate_files` expands
    rows IN PLACE, so without a split the replicated dataset would keep ~8
    blocks however large it grows — capping every downstream map stage at
    8-way parallelism. Repartition the base table proportionally to the
    replication factor BEFORE expanding (cheap block split, no shuffle;
    same block structure at every CPU count, so scaling runs compare like
    with like)."""
    import ray
    import ray.data

    # A single parquet file reads as ~8 blocks by default, capping every
    # downstream map at 8 tasks regardless of cluster size — split the read
    # to ~2 blocks per CPU (at real scale the input is many files and this
    # is moot).
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        override_num_blocks=max(16, min(256, cpus * 2)),
    )
    files = files_from_documents(docs)
    if replicate > 1:
        # enough blocks to keep every CPU busy, but bounded: Ray's sort
        # shuffle materializes ~blocks x partitions intermediate objects, so
        # oversplitting (e.g. 512 blocks x 128 partitions) multiplies
        # coordination cost superlinearly on the wide stages
        files = files.repartition(max(16, min(128, replicate * 4)))
    return replicate_files(files, replicate)


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


def read_sized(path, columns=None, rows_per_block: int = 16_384):
    """`read_parquet` that right-sizes the block count for SINGLE-FILE
    inputs: one footer read gives the row count, blocks =
    ceil(rows / rows_per_block) clamped to [1, 4 x CPUs].

    Ray's default split of one small file (~64 blocks regardless of size)
    makes every downstream sort/groupby exchange pay per-block task
    overhead that dwarfs the data (measured 9.3s -> <1s for a 75k-row
    reduce-side join exchange at 32 CPUs). Directory / multi-file inputs —
    the 100 TB shape — pass through to Ray's own partitioning untouched,
    so this never caps parallelism at real scale."""
    import os

    import ray
    import ray.data

    if not (isinstance(path, str) and os.path.isfile(path)):
        return ray.data.read_parquet(path, columns=columns)
    import pyarrow.parquet as pq

    rows = pq.ParquetFile(path).metadata.num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    target = max(1, min((rows + rows_per_block - 1) // rows_per_block, cpus * 4))
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=target)
