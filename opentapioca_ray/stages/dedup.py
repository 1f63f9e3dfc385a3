"""Deduplication operators over document/file tables.

First-class training-data-pipeline components (driver brief): exact dedup
(hash-partitioned), MinHash-LSH near-dedup, SimHash near-dedup, n-gram
Jaccard verification, embedding-cosine near-dup. The transitive-closure step
reuses stages/cc.py; the reference's exact upsert-by-id semantics are
mirrored by `compact_by_key` (reference taggerfactory.py:103-120, Solr
last-write-wins on uniqueKey id — SURVEY.md D5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from opentapioca_ray.functions.minhash import (
    hamming64,
    jaccard,
    minhash_signature_fast,
    shingle_hashes_fast,
    simhash,
)
from opentapioca_ray.functions.text import tokenize
from opentapioca_ray.stages.cc import connected_components
from opentapioca_ray.stages.pairs import blocking_batch, make_pair_group_fn


def add_hash_column(
    batch: pa.Table, text_column: str = "text", algo: str = "md5", name: str = "text_hash"
) -> pa.Table:
    fn = hashlib.md5 if algo == "md5" else hashlib.sha256
    hashes = [
        fn((t or "").encode("utf-8")).hexdigest()
        for t in batch.column(text_column).to_pylist()
    ]
    return batch.append_column(name, pa.array(hashes, type=pa.string()))


def exact_dedup(ds, id_column: str, text_column: str = "text", algo: str = "md5"):
    """Hash-partition + per-group first: one row per distinct content hash
    with the minimal id as representative and the duplicate count.

    Pre-aggregates inside map_batches? Not needed: the groupby moves only
    (hash, id) pairs after column pruning."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_hash_column(b, text_column, algo),
        batch_format="pyarrow",
    ).select_columns(["text_hash", id_column])
    return hashed.groupby("text_hash").aggregate(
        Min(id_column, alias_name="keep_id"),
        Count(alias_name="dup_count"),
    )


def compact_by_key(ds, key: str = "id", version: str = "revid"):
    """Upsert compaction: keep the row with max version per key
    (reference Solr last-write-wins, taggerfactory.py:103-120)."""

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(version, kind="mergesort").tail(1)

    return ds.groupby(key).map_groups(keep_latest, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dedup
# ---------------------------------------------------------------------------

def _verify_pairs_group_fn(threshold: float, shingle_k: int):
    """Within a block: emit verified near-dup edges (token-shingle Jaccard on
    the carried token prefixes >= threshold)."""

    pair_fn = make_pair_group_fn()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        pairs = pair_fn(df)
        rows = []
        for r in pairs.itertuples():
            sa = set(
                map(tuple, zip(*[r.left_tokens[i:] for i in range(shingle_k)]))
            ) if len(r.left_tokens) >= shingle_k else {tuple(r.left_tokens)}
            sb = set(
                map(tuple, zip(*[r.right_tokens[i:] for i in range(shingle_k)]))
            ) if len(r.right_tokens) >= shingle_k else {tuple(r.right_tokens)}
            if jaccard(sa, sb) >= threshold:
                rows.append({"u": r.left_id, "v": r.right_id})
        return pd.DataFrame(rows, columns=["u", "v"], dtype=np.int64)

    return fn


def minhash_dedup(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
):
    """shingle -> minhash -> band -> bucket groupby -> verify -> CC.

    Returns (node, component) assignments for every doc in a near-dup
    cluster of size >= 2."""
    blocks = ds.map_batches(
        lambda b: blocking_batch(
            b,
            id_column=id_column,
            text_column=text_column,
            repo_column=None,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
    )
    from opentapioca_ray.stages.pairs import prefilter_singleton_blocks

    edges = prefilter_singleton_blocks(blocks).groupby("block_key").map_groups(
        _verify_pairs_group_fn(threshold, shingle_k), batch_format="pandas"
    )
    # dedup edges across bands before CC
    from ray.data.aggregate import Count

    edges = edges.groupby(["u", "v"]).aggregate(Count(alias_name="nb_bands"))
    edges = edges.select_columns(["u", "v"])
    return connected_components(edges)


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------

def simhash_batch(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text", shingle_k: int = 3
) -> pa.Table:
    """Per doc: 64-bit simhash + 4 x 16-bit band keys (a pair within
    hamming distance 3 shares at least one band by pigeonhole)."""
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(text_column).to_pylist()
    out_id, out_sim, out_band = [], [], []
    for fid, text in zip(ids, texts):
        toks = tokenize((text or "")[:10000])
        h = simhash(shingle_hashes_fast(toks, shingle_k))
        for band in range(4):
            chunk = (h >> (band * 16)) & 0xFFFF
            out_id.append(fid)
            out_sim.append(h)
            out_band.append(f"s{band}:{chunk:04x}")
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "simhash": pa.array(out_sim, type=pa.uint64()),
            "block_key": pa.array(out_band, type=pa.string()),
        }
    )


def simhash_dedup(ds, id_column: str = "doc_id", text_column: str = "text", max_hamming: int = 3):
    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("doc_id")
        rows = []
        recs = list(df.itertuples())
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                if hamming64(int(recs[i].simhash), int(recs[j].simhash)) <= max_hamming:
                    u, v = sorted((int(recs[i].doc_id), int(recs[j].doc_id)))
                    rows.append({"u": u, "v": v})
        return pd.DataFrame(rows, columns=["u", "v"], dtype=np.int64)

    from opentapioca_ray.stages.pairs import prefilter_singleton_blocks

    sims = ds.map_batches(
        lambda b: simhash_batch(b, id_column, text_column), batch_format="pyarrow"
    )
    sims = prefilter_singleton_blocks(sims, min_size=2)
    edges = sims.groupby("block_key").map_groups(verify, batch_format="pandas")
    from ray.data.aggregate import Count

    edges = edges.groupby(["u", "v"]).aggregate(Count(alias_name="nb"))
    return connected_components(edges.select_columns(["u", "v"]))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dedup
# ---------------------------------------------------------------------------

def gram_table(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text", k: int = 3
) -> pa.Table:
    """Per doc: distinct word-k-gram set (strings, reference tokenizer).

    Docs shorter than k tokens collapse to a single whole-doc gram; empty
    docs yield no grams (and thus join no candidate pairs)."""
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(text_column).to_pylist()
    keep_ids, gram_lists = [], []
    for fid, text in zip(ids, texts):
        toks = tokenize(text or "")
        if not toks:
            continue
        if len(toks) < k:
            grams = [" ".join(toks)]
        else:
            grams = sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
        keep_ids.append(fid)
        gram_lists.append(grams)
    return pa.table(
        {
            "doc_id": pa.array(keep_ids, type=pa.int64()),
            "grams": pa.array(gram_lists, type=pa.list_(pa.string())),
        }
    )


def _explode_grams(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    col = batch.column("grams")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col)
    return pa.table(
        {
            "gram": pc.list_flatten(col),
            "doc_id": pc.take(batch.column("doc_id"), parents),
        }
    )


def ngram_jaccard_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
):
    """Exact n-gram Jaccard near-dup pairs: candidates = pairs sharing >= 1
    distinct word-k-gram; verified with exact Jaccard over the gram sets.

    Scale notes: exact gram blocking is the verification-grade variant —
    common grams create O(n^2) blocks, so at scale pass `max_df` to drop
    grams appearing in more than `max_df` docs (stop-gram pruning: pairs
    sharing only ultra-common grams are missed by design, and intersection
    counts then cover surviving grams only — a lower bound on true Jaccard).
    `minhash_dedup` is the approximate scale path.
    Returns (u, v, jaccard) with u < v and jaccard >= threshold."""
    grams = ds.map_batches(
        lambda b: gram_table(b, id_column, text_column, k), batch_format="pyarrow"
    ).materialize()  # consumed twice: sizes + explode
    exploded = grams.map_batches(_explode_grams, batch_format="pyarrow")
    # Singleton grams (the overwhelming majority) can't produce pairs: drop
    # them before the wide groupby; `max_df` additionally drops stop-grams.
    from opentapioca_ray.stages.pairs import prefilter_singleton_blocks

    exploded = prefilter_singleton_blocks(
        exploded.map_batches(
            lambda b: b.rename_columns(["block_key", "doc_id"]), batch_format="pyarrow"
        ),
        min_size=2,
        max_size=max_df,
    ).map_batches(lambda b: b.rename_columns(["gram", "doc_id"]), batch_format="pyarrow")
    # Key identity: |A n B| for a doc pair equals the pair's MULTIPLICITY
    # across shared-gram groups (each shared distinct gram contributes the
    # pair exactly once), and |A| / |B| are the per-doc distinct-gram counts
    # already known from gram_table. So exact Jaccard needs NO gram-set
    # payloads at all: count pair occurrences + two size lookups.
    #
    # Surviving (gram, doc) rows after the singleton prefilter are a small
    # fraction of the corpus; they merge on the driver (vectorized
    # dictionary-encode + sort + per-group all-pairs). At scales beyond
    # driver memory the same kernel runs per coarse hash partition
    # (`groupby(gram-hash % P).map_groups`) followed by a pair-count
    # groupby-sum — identical math, all-shuffle (see
    # pipelines/linkage.py build_id_pairs for the pattern).
    import ray
    import ray.data

    _EMPTY = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("jaccard", pa.float64())]
    ).empty_table()

    # per-doc distinct gram counts (|A| side), collected as two arrays
    sizes = grams.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_grams": pa.array(
                    [len(g) for g in b.column("grams").to_pylist()], type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    size_ids, size_ns = [], []
    for ref in sizes.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            continue
        size_ids.append(t.column("doc_id").to_numpy(zero_copy_only=False))
        size_ns.append(t.column("n_grams").to_numpy(zero_copy_only=False))
    if not size_ids:
        return ray.data.from_arrow(_EMPTY)
    size_ids = np.concatenate(size_ids)
    size_ns = np.concatenate(size_ns).astype(np.int64)
    order = np.argsort(size_ids)
    size_ids, size_ns = size_ids[order], size_ns[order]

    # surviving (gram, doc) rows -> pair occurrence counts
    gram_chunks, id_chunks = [], []
    for ref in exploded.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "gram" not in t.column_names:
            continue
        col = t.column("gram")
        gram_chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
        id_chunks.append(t.column("doc_id").to_numpy(zero_copy_only=False))
    if not gram_chunks:
        return ray.data.from_arrow(_EMPTY)
    codes = (
        pa.chunked_array(gram_chunks)
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
    )
    ids = np.concatenate(id_chunks).astype(np.int64)
    o = np.lexsort((ids, codes))
    codes, ids = codes[o], ids[o]
    starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
    ends = np.concatenate((starts[1:], [len(codes)]))
    sizes_g = ends - starts
    lefts, rights = [], []
    s2 = starts[sizes_g == 2]
    if len(s2):
        a, b = ids[s2], ids[s2 + 1]
        ok = a != b
        lefts.append(np.minimum(a[ok], b[ok]))
        rights.append(np.maximum(a[ok], b[ok]))
    for s, e in zip(starts[sizes_g > 2], ends[sizes_g > 2]):
        gid = np.unique(ids[s:e])
        n = len(gid)
        if n < 2:
            continue
        iu, ju = np.triu_indices(n, k=1)
        lefts.append(gid[iu])
        rights.append(gid[ju])
    if not lefts:
        return ray.data.from_arrow(_EMPTY)
    left = np.concatenate(lefts)
    right = np.concatenate(rights)
    pair_mat = np.stack([left, right], axis=1)
    po = np.lexsort((right, left))
    pair_mat = pair_mat[po]
    new = np.concatenate(([True], (pair_mat[1:] != pair_mat[:-1]).any(axis=1)))
    group = np.cumsum(new) - 1
    inter = np.bincount(group).astype(np.int64)
    uniq = pair_mat[new]
    na = size_ns[np.searchsorted(size_ids, uniq[:, 0])]
    nb = size_ns[np.searchsorted(size_ids, uniq[:, 1])]
    jac = inter / (na + nb - inter)
    keep = jac >= threshold
    table = pa.table(
        {
            "u": pa.array(uniq[keep, 0], type=pa.int64()),
            "v": pa.array(uniq[keep, 1], type=pa.int64()),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        }
    )
    n_slices = max(1, min(32, table.num_rows // 4096 + 1))
    step = max(1, (table.num_rows + n_slices - 1) // n_slices)
    slices = [table.slice(i, step) for i in range(0, table.num_rows, step)]
    return ray.data.from_arrow(slices or [table])


def ngram_jaccard_dedup(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
):
    """Transitive n-gram-Jaccard near-dedup: verified pairs -> CC clusters."""
    pairs = ngram_jaccard_pairs(ds, id_column, text_column, k, threshold, max_df)
    return connected_components(pairs.select_columns(["u", "v"]))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(
    ds,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
):
    """Random-hyperplane LSH buckets + exact cosine verification + CC."""
    rng = np.random.RandomState(997)
    planes_holder: dict = {}

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vector_column).to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        planes = planes_holder.get(dim)
        if planes is None:
            planes = np.random.RandomState(997).randn(dim, num_planes)
            planes_holder[dim] = planes
        signs = (vecs @ planes > 0).astype(np.uint64)
        codes = (signs << np.arange(num_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = vecs / norm
        return pa.table(
            {
                "vec_id": batch.column(id_column),
                "block_key": pa.array([f"e:{c:x}" for c in codes], type=pa.string()),
                "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
            }
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("vec_id")
        ids = df["vec_id"].to_numpy()
        mat = np.array(df["unit"].tolist(), dtype=np.float64)
        rows = []
        if len(ids) >= 2:
            sims = mat @ mat.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= threshold
            for i, j in zip(iu[hit], ju[hit]):
                u, v = sorted((int(ids[i]), int(ids[j])))
                rows.append({"u": u, "v": v})
        return pd.DataFrame(rows, columns=["u", "v"], dtype=np.int64)

    from opentapioca_ray.stages.pairs import prefilter_singleton_blocks

    buckets = ds.map_batches(bucket, batch_format="pyarrow")
    buckets = prefilter_singleton_blocks(buckets, min_size=2)
    edges = buckets.groupby("block_key").map_groups(verify, batch_format="pandas")
    from ray.data.aggregate import Count

    edges = edges.groupby(["u", "v"]).aggregate(Count(alias_name="nb"))
    return connected_components(edges.select_columns(["u", "v"]))
