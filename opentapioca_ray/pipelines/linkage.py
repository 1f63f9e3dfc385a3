"""Flagship record-linkage pipeline (BASELINE.json north_star):

files -> blocking (MinHash-LSH map_batches) -> candidate pairs
(groupby(block_key) with skew guard) -> pairwise scoring (stateful actor
pool) -> threshold -> match edges -> large-star/small-star connected
components -> clusters.

Every wide step is a keyed shuffle with explicit keys (SURVEY.md §7.3);
broadcast state (IDF stats, repo prior, model) ships via `ray.put` once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from opentapioca_ray.stages.cc import connected_components
from opentapioca_ray.stages.pairs import (
    FEATURE_NAMES,
    PairFeaturizer,
    PairScorerStage,
    blocking_batch,
    make_pair_group_fn,
)
from opentapioca_ray.state.linear import LinearModel
from opentapioca_ray.stages.exchange import arrow_blocks


# ---------------------------------------------------------------------------
# Broadcast corpus statistics
# ---------------------------------------------------------------------------

def train_idf(
    files_ds,
    text_column: str = "content",
    max_vocab: int = 500_000,
    driver_limit: int = 5_000_000,
) -> dict:
    """Document-frequency per token -> idf = log(N / (1 + df)).

    Distinct-per-row extraction is combined inside `map_batches` before any
    exchange (same shuffle shape as BOW training, SURVEY.md A1). Scale-
    adaptive final merge: when the partial (word, count) rows fit under
    `driver_limit` they merge with one vectorized pass on the driver (no
    shuffle); above that a distributed groupby(word).sum runs first. The
    result dict is the broadcast small side either way; vocabulary beyond
    `max_vocab` falls back to the default idf."""
    import ray
    from ray.data.aggregate import Sum

    from opentapioca_ray.state.bow import partial_word_counts

    n_docs = files_ds.count()
    partial = files_ds.map_batches(
        lambda b: partial_word_counts(b, text_column),
        batch_format="pyarrow",
    ).materialize()

    idf: dict[str, float] = {}
    if partial.count() <= driver_limit:
        word_chunks, cnt_chunks = [], []
        for t in arrow_blocks(partial):
            if t.num_rows == 0 or "word" not in t.column_names:
                continue
            col = t.column("word")
            word_chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
            cnt_chunks.append(t.column("count").to_numpy(zero_copy_only=False))
        if word_chunks:
            # dictionary-encode: the weighted merge runs on int codes
            enc = pa.chunked_array(word_chunks).combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            cnts = np.concatenate(cnt_chunks).astype(np.int64)
            sums = np.bincount(codes, weights=cnts).astype(np.int64)
            vals = np.log(n_docs / (1.0 + sums))
            idf = dict(zip(enc.dictionary.to_pylist(), vals.tolist()))
    else:
        counts = partial.groupby("word").aggregate(Sum("count", alias_name="count"))
        for t in arrow_blocks(counts):
            if t.num_rows == 0 or "word" not in t.column_names:
                continue
            for w, c in zip(t.column("word").to_pylist(), t.column("count").to_pylist()):
                idf[w] = float(np.log(n_docs / (1.0 + c)))
    if len(idf) > max_vocab:
        keep = sorted(idf.items(), key=lambda kv: kv[1])[:max_vocab]
        idf = dict(keep)
    return idf


def corpus_stats(
    files_ds,
    text_column: str = "content",
    repo_column: str = "repo",
    max_vocab: int = 500_000,
    mode: str = "auto",
    driver_limit: int = 5_000_000,
) -> tuple[dict, dict]:
    """One pass over files -> (idf dict, repo prior dict).

    Fuses `train_idf` + `repo_in_degree_prior` into a single map: each batch
    emits tagged partial counts (kind 0 = word document frequency, kind 1 =
    repo file count), so the corpus is read and tokenized once and there is
    no separate shuffle for the prior. Scale-adaptive final merge (same
    guard as `train_idf`): partial rows under `driver_limit` merge with one
    vectorized pass on the driver; above that — or with `mode="shuffle"`,
    which `linkage_clusters(distributed=True)` forces — a distributed
    groupby(kind, key).sum runs first and only the (vocab-bounded)
    aggregated rows come back to build the broadcast dicts."""
    import ray

    from opentapioca_ray.state.bow import partial_word_counts

    n_docs = files_ds.count()

    def partial(batch: pa.Table) -> pa.Table:
        words = partial_word_counts(batch, text_column)
        repos: dict[str, int] = {}
        if repo_column in batch.column_names:
            for r in batch.column(repo_column).to_pylist():
                repos[r] = repos.get(r, 0) + 1
        n_w, n_r = words.num_rows, len(repos)
        return pa.table(
            {
                "kind": pa.array([0] * n_w + [1] * n_r, type=pa.int8()),
                "key": pa.concat_arrays(
                    [
                        words.column("word").combine_chunks(),
                        pa.array(list(repos.keys()), type=pa.string()),
                    ]
                ),
                "count": pa.concat_arrays(
                    [
                        words.column("count").cast(pa.int64()).combine_chunks(),
                        pa.array(list(repos.values()), type=pa.int64()),
                    ]
                ),
            }
        )

    parts = files_ds.map_batches(partial, batch_format="pyarrow")
    if mode == "auto":
        parts = parts.materialize()
        mode = "driver" if parts.count() <= driver_limit else "shuffle"
    if mode == "shuffle":
        # ONE coarse exchange on hash(key) % P (int sort, not a full
        # string-key groupby over every partial row); each partition sums
        # its (kind, key) groups vectorized, so only vocab-sized aggregated
        # rows come back to the driver.
        from opentapioca_ray.stages.exchange import coarse_group_apply

        def sum_partition(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {
                        "kind": pd.Series(dtype=np.int8),
                        "key": pd.Series(dtype=object),
                        "count": pd.Series(dtype=np.int64),
                    }
                )
            out = (
                df.groupby(["kind", "key"], sort=False)["count"]
                .sum()
                .reset_index()
            )
            out["count"] = out["count"].astype(np.int64)
            return out

        parts = coarse_group_apply(parts, "key", sum_partition)
    tables = []
    for t in arrow_blocks(parts):
        if t.num_rows and "kind" in t.column_names:
            tables.append(t)
    if not tables:
        return {}, {}
    merged = pa.concat_tables(tables).combine_chunks()

    def _sum_by_key(t: pa.Table) -> dict:
        # vectorized: dictionary-encode keys, bincount the counts
        enc = t.column("key").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnts = t.column("count").to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.bincount(codes, weights=cnts).astype(np.int64)
        return dict(zip(enc.dictionary.to_pylist(), sums.tolist()))

    import pyarrow.compute as pc

    word_sum = _sum_by_key(merged.filter(pc.equal(merged.column("kind"), 0)))
    repo_sum = _sum_by_key(merged.filter(pc.equal(merged.column("kind"), 1)))
    idf = {w: float(np.log(n_docs / (1.0 + c))) for w, c in word_sum.items()}
    if len(idf) > max_vocab:
        idf = dict(sorted(idf.items(), key=lambda kv: kv[1])[:max_vocab])
    if repo_sum:
        logs = {k: float(np.log1p(v)) for k, v in repo_sum.items()}
        mx = max(logs.values()) or 1.0
        prior = {k: v / mx for k, v in logs.items()}
    else:
        prior = {}
    return idf, prior


def repo_in_degree_prior(
    files_ds, repo_column: str = "repo", max_repos: int = 2_000_000
) -> dict:
    """PageRank-style popularity prior from repo in-degree (north_star):
    log1p(file count per repo), normalized to [0, 1].

    The prior is broadcast state, so the per-repo aggregate must fit on the
    driver; `max_repos` caps the collect at the top-N repos by file count
    (missing repos score the 0.0 floor in the pair features — the same
    OOV treatment as the reference's pagerank default,
    opentapioca/wikidatagraph.py:165-170)."""
    from ray.data.aggregate import Count

    counts = files_ds.groupby(repo_column).aggregate(Count(alias_name="n"))
    if counts.count() > max_repos:
        counts = counts.sort("n", descending=True).limit(max_repos)
    rows = counts.take_all()
    if not rows:
        return {}
    log_counts = {r[repo_column]: float(np.log1p(r["n"])) for r in rows}
    mx = max(log_counts.values()) or 1.0
    return {k: v / mx for k, v in log_counts.items()}


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def build_blocks(files_ds, num_perm=128, bands=32, shingle_k=3):
    return files_ds.map_batches(
        lambda b: blocking_batch(
            b,
            id_column="file_id",
            text_column="content",
            repo_column="repo",
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
    )


def build_pairs(blocks_ds, max_block_size=64, window=8):
    """Inline-payload pair generation: ONE coarse-partition exchange on
    hash(block_key) % P; the partition kernel splits its blocks at the
    pandas level and applies the skew-guarded pair fn per block — not a
    Ray-level per-block `map_groups` (tiny-group overhead at millions of
    band keys)."""
    from opentapioca_ray.stages.exchange import coarse_group_apply
    from opentapioca_ray.stages.pairs import (
        PAIR_COLUMNS,
        prefilter_singleton_blocks,
    )

    candidates = prefilter_singleton_blocks(blocks_ds)
    block_fn = make_pair_group_fn(max_block_size, window)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(PAIR_COLUMNS))
        outs = [block_fn(g) for _, g in df.groupby("block_key", sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(columns=list(PAIR_COLUMNS))
        return pd.concat(outs, ignore_index=True)

    return coarse_group_apply(candidates, "block_key", partition_fn)


def score_pairs(
    pairs_ds,
    idf: dict,
    prior: dict,
    model: LinearModel | None,
    concurrency=None,
    mode: str = "tasks",
):
    """Pairwise feature + score stage.

    `tasks` (default): stateless map_batches on the already-warm worker
    pool; the broadcast state (idf/prior/model) ships once via ray.put and
    each task reads it zero-copy from plasma — no actor spin-up cost.
    `actors`: explicit actor pool (state resolved once per actor in
    __init__) — preferable when state resolution itself is expensive
    (large model load) and the stage runs long enough to amortize pool
    startup."""
    import ray

    idf_ref = ray.put(idf)
    prior_ref = ray.put(prior)
    model_dict = model.to_dict() if model is not None else None

    if mode == "tasks":
        def score_batch(batch: pa.Table) -> pa.Table:
            stage = PairScorerStage(
                idf_ref=idf_ref, repo_prior_ref=prior_ref, model_dict=model_dict
            )
            return stage(batch)

        return pairs_ds.map_batches(score_batch, batch_format="pyarrow")

    if concurrency is None:
        # autoscale the actor pool to the cluster (1 CPU per actor)
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, cpus))
    return pairs_ds.map_batches(
        PairScorerStage,
        fn_constructor_kwargs={
            "idf_ref": idf_ref,
            "repo_prior_ref": prior_ref,
            "model_dict": model_dict,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def dedup_scored_pairs(scored_ds):
    """A pair can be emitted by several bands — keep one row per pair.
    Scores are deterministic per pair, so Max == first."""
    from ray.data.aggregate import Count, Max

    aggs = [Max(c, alias_name=c) for c in [*FEATURE_NAMES, "score"]]
    return scored_ds.groupby(["left_id", "right_id"]).aggregate(
        *aggs, Count(alias_name="nb_bands")
    )


def match_edges(scored_unique_ds, threshold: float = 0.0):
    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater(batch.column("score"), threshold)
        t = batch.filter(mask)
        return pa.table({"u": t.column("left_id"), "v": t.column("right_id")})

    return scored_unique_ds.map_batches(to_edges, batch_format="pyarrow")


_DRIVER_PAIRS_LIMIT = 20_000_000


def _pair_arrays(keys, ids, sigs, max_block_size: int, window: int):
    """Vectorized pairing kernel over MANY blocks at once: rows sorted by
    (key, sig); emits (left, right, capped) arrays. Size-2 groups (the
    overwhelming majority under LSH banding) are fully vectorized; larger
    groups loop with the all-pairs / sorted-neighborhood skew guard."""
    order = np.lexsort((sigs, keys))
    keys, ids, sigs = keys[order], ids[order], sigs[order]
    starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
    ends = np.concatenate((starts[1:], [len(keys)]))
    sizes = ends - starts
    lefts, rights, caps = [], [], []
    s2 = starts[sizes == 2]
    if len(s2):
        a, b = ids[s2], ids[s2 + 1]
        valid = a != b
        a, b = a[valid], b[valid]
        lefts.append(np.minimum(a, b))
        rights.append(np.maximum(a, b))
        caps.append(np.zeros(len(a), dtype=np.int64))
    for s, e in zip(starts[sizes > 2], ends[sizes > 2]):
        # drop duplicate file_ids keeping first occurrence (rows are already
        # in sig_head order within the group)
        _, first_pos = np.unique(ids[s:e], return_index=True)
        gid = ids[s:e][np.sort(first_pos)]
        n = len(gid)
        if n < 2:
            continue
        if n <= max_block_size:
            iu, ju = np.triu_indices(n, k=1)
            capped = 0
        else:
            offs = np.arange(1, window + 1)
            iu = np.repeat(np.arange(n), window)
            ju = iu + np.tile(offs, n)
            keep = ju < n
            iu, ju = iu[keep], ju[keep]
            capped = n * (n - 1) // 2 - len(iu)
        lefts.append(np.minimum(gid[iu], gid[ju]))
        rights.append(np.maximum(gid[iu], gid[ju]))
        caps.append(np.full(len(iu), capped, dtype=np.int64))
    if not lefts:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return np.concatenate(lefts), np.concatenate(rights), np.concatenate(caps)


def _driver_id_pairs(cands_ds, max_block_size: int, window: int):
    """Small-regime pair generation: surviving candidate rows (already a
    tiny fraction after the singleton prefilter) are collected as three
    numpy columns and paired + cross-band-deduplicated vectorized on the
    driver — zero shuffles. Same semantics (all-pairs / sorted-neighborhood
    skew guard / Max(capped) / band count) as the distributed path."""
    import ray
    import ray.data as rd

    DRIVER_COLLECTS["pairs_proportional"] += 1  # candidate rows
    key_chunks, id_chunks, sig_chunks = [], [], []
    for t in arrow_blocks(cands_ds):
        if t.num_rows == 0 or "block_key" not in t.column_names:
            continue
        col = t.column("block_key")
        key_chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
        id_chunks.append(t.column("file_id").to_numpy(zero_copy_only=False))
        sig_chunks.append(t.column("sig_head").to_numpy(zero_copy_only=False))
    empty = pa.schema(
        [("left_id", pa.int64()), ("right_id", pa.int64()),
         ("capped", pa.int64()), ("nb_bands", pa.int64())]
    ).empty_table()
    if not key_chunks:
        return rd.from_arrow(empty)
    # int keys sort directly; string keys dictionary-encode to int codes
    key_arr = pa.chunked_array(key_chunks).combine_chunks()
    if pa.types.is_string(key_arr.type) or pa.types.is_large_string(key_arr.type):
        keys = key_arr.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    else:
        keys = key_arr.to_numpy(zero_copy_only=False)
    ids = np.concatenate(id_chunks).astype(np.int64)
    sigs = np.concatenate(sig_chunks).astype(np.uint64)
    left, right, cap = _pair_arrays(keys, ids, sigs, max_block_size, window)
    if not len(left):
        return rd.from_arrow(empty)
    # cross-band dedupe: unique (left,right), Max(capped), Count(bands)
    pair_mat = np.stack([left, right], axis=1)
    o = np.lexsort((cap, right, left))
    pair_mat, cap = pair_mat[o], cap[o]
    new = np.concatenate(
        ([True], (pair_mat[1:] != pair_mat[:-1]).any(axis=1))
    )
    group = np.cumsum(new) - 1
    nb_bands = np.bincount(group)
    max_cap = np.maximum.reduceat(cap, np.flatnonzero(new))
    uniq = pair_mat[new]
    table = pa.table(
        {
            "left_id": pa.array(uniq[:, 0], type=pa.int64()),
            "right_id": pa.array(uniq[:, 1], type=pa.int64()),
            "capped": pa.array(max_cap, type=pa.int64()),
            "nb_bands": pa.array(nb_bands, type=pa.int64()),
        }
    )
    return rd.from_arrow(table)


def build_id_pairs(
    files_ds,
    num_perm=128,
    bands=32,
    shingle_k=3,
    max_block_size=64,
    window=8,
    mode: str = "auto",
    prefilter_mode: str = "auto",
):
    """Slim blocking + pair generation: the band shuffle moves only
    (block_key, file_id, sig_head); candidate pairs are deduplicated across
    bands BEFORE any payload is attached or scored.

    Scale-adaptive: surviving candidate rows below `_DRIVER_PAIRS_LIMIT`
    pair up vectorized on the driver (no shuffle); above, the
    groupby(block_key) + groupby(pair) shuffles run distributed."""
    from ray.data.aggregate import Count, Max

    from opentapioca_ray.stages.pairs import (
        make_id_pair_group_fn,
        prefilter_singleton_blocks,
    )

    blocks = files_ds.map_batches(
        lambda b: blocking_batch(
            b,
            id_column="file_id",
            text_column="content",
            repo_column=None,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            include_tokens=False,
            key_type="u64",
        ),
        batch_format="pyarrow",
    )
    if mode == "auto":
        # The auto decision must itself be cheap. Deciding from an exact
        # post-prefilter count pays the prefilter first — and above ITS
        # driver regime (DRIVER_COMBINE_LIMIT band rows) that is a full
        # distributed groupby(block_key) count over every band row:
        # measured 507 s at 82M band rows (2.56M files x 32 bands) vs 43 s
        # for the entire forced-shuffle job. So above that volume go
        # straight to the shuffle path with NO prefilter (the coarse pair
        # kernel drops singletons vectorized at ~zero cost — same
        # reasoning as the forced-shuffle branch below); the band-row
        # count is exact and free (blocking emits `bands` rows per file).
        from opentapioca_ray.stages.pairs import DRIVER_COMBINE_LIMIT

        if files_ds.count() * bands > DRIVER_COMBINE_LIMIT:
            mode = "shuffle"
            candidates = blocks
        else:
            candidates = prefilter_singleton_blocks(
                blocks, mode=prefilter_mode
            ).materialize()
            mode = (
                "driver"
                if candidates.count() <= _DRIVER_PAIRS_LIMIT
                else "shuffle"
            )
    elif mode == "driver":
        candidates = prefilter_singleton_blocks(blocks, mode=prefilter_mode).materialize()
    else:
        # Shuffle mode: NO singleton prefilter. The prefilter exists to
        # shrink a per-key exchange, but the coarse pair kernel drops
        # singleton blocks vectorized at ~zero cost — and the prefilter's
        # own count is a full groupby(block_key) sort over every band row
        # (5M distinct keys), strictly more expensive than the one
        # coarse-partition sort (P distinct keys) it would be saving.
        candidates = blocks
    if mode == "driver":
        return _driver_id_pairs(candidates, max_block_size, window)

    # Scale path: shuffle by a COARSE partition key (hash of block_key mod
    # P) so each group holds many whole blocks and is paired with the same
    # vectorized kernel — per-group work is O(partition), not a per-tiny-
    # group pandas call (which collapses at millions of singleton-ish keys).
    n_parts = 1024

    def add_part(batch: pa.Table) -> pa.Table:
        # one C-level hash pass for string or int keys alike (never a
        # per-row Python loop on a shuffle path) — stages/exchange.py
        from opentapioca_ray.stages.exchange import _coarse_codes

        return batch.append_column(
            "part", _coarse_codes(batch.column("block_key"), n_parts)
        )

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["block_key"].to_numpy()
        if keys.dtype == object:
            _, keys = np.unique(keys, return_inverse=True)
        ids = df["file_id"].to_numpy(dtype=np.int64)
        sigs = df["sig_head"].to_numpy()
        left, right, cap = _pair_arrays(keys, ids, sigs, max_block_size, window)
        return pd.DataFrame({"left_id": left, "right_id": right, "capped": cap})

    pairs = (
        candidates.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partition, batch_format="pandas")
    )
    # cross-band dedup via a SECOND coarse exchange + vectorized pandas
    # aggregate — Ray's sort-based two-key groupby().aggregate() costs 106s
    # on the same 1M pair rows this does in 1.5s (tiny numerous groups)
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    return coarse_groupby_agg(
        pairs,
        ["left_id", "right_id"],
        {"capped": ("capped", "max"), "nb_bands": ("capped", "size")},
    )


_DRIVER_ATTACH_LIMIT = 200_000

# Telemetry for the scaling contract: every driver-side collect whose volume
# is proportional to #pairs / #candidate-files bumps this counter (the
# broadcast-small-side collects in corpus_stats/train_idf are vocab-bounded
# and exempt). The distributed paths (mode="shuffle", i.e. what
# linkage_clusters(distributed=True) forces) must leave it untouched —
# asserted in tests/test_distributed_modes.py.
DRIVER_COLLECTS = {"pairs_proportional": 0}


def attach_pair_tokens(pairs_ds, files_ds, tokens_cap: int | None = None, mode: str = "auto"):
    """Reduce-side join: ship each candidate file's token prefix (packed as
    one \\x1f string) to its pairs via union + groupby(file_id), one pass per
    side.

    mode="driver" (small regime, <= _DRIVER_ATTACH_LIMIT pairs): candidate
    ids come to the driver once for a broadcast `is_in` prefilter and a
    vectorized dict join. mode="shuffle" (the 100 TB path): NOTHING
    proportional to #pairs touches the driver — candidate token rows are
    selected by a distributed semi-join on the slim pair-id column
    (stages/exchange.coarse_semi_join), then attached to both pair sides
    with coarse exchanges."""
    import ray
    import pyarrow.compute as pc

    from opentapioca_ray.functions.text import tokenize
    from opentapioca_ray.stages.pairs import TOKENS_CAP

    cap = tokens_cap or TOKENS_CAP
    pairs_ds = pairs_ds.materialize()  # small: deduped candidate pairs
    if pairs_ds.count() == 0:
        return None
    if mode == "auto":
        mode = "driver" if pairs_ds.count() <= _DRIVER_ATTACH_LIMIT else "shuffle"

    def make_token_rows(ids_ref):
        """Tokenize file contents into packed \\x1f-joined prefixes. With
        `ids_ref` (driver mode) a broadcast `is_in` prefilter keeps only
        candidate files; without (shuffle mode) every file is tokenized and
        the semi-join exchange drops non-candidates."""

        def token_rows(batch: pa.Table) -> pa.Table:
            from opentapioca_ray.functions.text import tokenize_flat

            if ids_ref is not None:
                mask = pc.is_in(batch.column("file_id"), value_set=ray.get(ids_ref))
                t = batch.filter(mask)
            else:
                t = batch
            texts = [(c or "")[:10000] for c in t.column("content").to_pylist()]
            flat, counts = tokenize_flat(texts)
            capped = np.minimum(counts, cap)
            starts = np.cumsum(counts) - counts
            take_idx = (
                np.concatenate([np.arange(s, s + c) for s, c in zip(starts, capped)])
                if len(texts)
                else np.zeros(0, dtype=np.int64)
            )
            offsets = np.zeros(len(texts) + 1, dtype=np.int64)
            np.cumsum(capped, out=offsets[1:])
            token_lists = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(flat[take_idx], type=pa.string()),
            )
            return pa.table(
                {
                    "file_id": t.column("file_id"),
                    "repo": t.column("repo"),
                    "packed": pc.binary_join(token_lists, "\x1f"),
                }
            )

        return token_rows

    if mode == "driver":
        # candidate-id broadcast: one vectorized np.unique over the pair id
        # columns (bounded by 2 x #pairs int64s — small by the mode guard)
        DRIVER_COLLECTS["pairs_proportional"] += 1
        id_chunks = []
        for t in arrow_blocks(pairs_ds):
            if t.num_rows == 0 or "left_id" not in t.column_names:
                continue
            id_chunks.append(t.column("left_id").to_numpy(zero_copy_only=False))
            id_chunks.append(t.column("right_id").to_numpy(zero_copy_only=False))
        if not id_chunks:
            return None
        cand_ids = np.unique(np.concatenate(id_chunks)).astype(np.int64)
        if not len(cand_ids):
            return None
        ids_ref = ray.put(pa.array(cand_ids, type=pa.int64()))
        tokens = files_ds.map_batches(make_token_rows(ids_ref), batch_format="pyarrow")
        # Small regime: tokenization stays distributed (the map above); only
        # the packed prefixes of candidate files (bounded by cand_ids x cap)
        # and the deduped pairs come to the driver for a vectorized dict
        # join, then ship back as sliced Arrow blocks for the actor pool.
        import ray.data as rd

        # vectorized dict join: sorted token-id arrays + two searchsorted
        # lookups over the pair columns (no per-row Python)
        DRIVER_COLLECTS["pairs_proportional"] += 2  # token rows + pair rows
        tid_c, trepo_c, tpack_c = [], [], []
        for t in arrow_blocks(tokens):
            if t.num_rows == 0 or "file_id" not in t.column_names:
                continue
            tid_c.append(t.column("file_id").to_numpy(zero_copy_only=False))
            trepo_c.append(t.column("repo").to_numpy(zero_copy_only=False))
            tpack_c.append(t.column("packed").to_numpy(zero_copy_only=False))
        if not tid_c:
            return None
        tids = np.concatenate(tid_c).astype(np.int64)
        o = np.argsort(tids)
        tids = tids[o]
        trepo = np.concatenate(trepo_c)[o]
        tpack = np.concatenate(tpack_c)[o]
        pl_c, pr_c, pc_c, pn_c = [], [], [], []
        for t in arrow_blocks(pairs_ds):
            if t.num_rows == 0 or "left_id" not in t.column_names:
                continue
            pl_c.append(t.column("left_id").to_numpy(zero_copy_only=False))
            pr_c.append(t.column("right_id").to_numpy(zero_copy_only=False))
            pc_c.append(t.column("capped").to_numpy(zero_copy_only=False))
            pn_c.append(t.column("nb_bands").to_numpy(zero_copy_only=False))
        pl = np.concatenate(pl_c).astype(np.int64)
        pr = np.concatenate(pr_c).astype(np.int64)
        pcap = np.concatenate(pc_c).astype(np.int64)
        pnb = np.concatenate(pn_c).astype(np.int64)
        li = np.clip(np.searchsorted(tids, pl), 0, len(tids) - 1)
        ri = np.clip(np.searchsorted(tids, pr), 0, len(tids) - 1)
        ok = (tids[li] == pl) & (tids[ri] == pr)
        table = pa.table(
            {
                "left_id": pa.array(pl[ok], type=pa.int64()),
                "right_id": pa.array(pr[ok], type=pa.int64()),
                "capped": pa.array(pcap[ok], type=pa.int64()),
                "nb_bands": pa.array(pnb[ok], type=pa.int64()),
                "left_repo": pa.array(trepo[li[ok]], type=pa.string()),
                "left_packed": pa.array(tpack[li[ok]], type=pa.string()),
                "right_repo": pa.array(trepo[ri[ok]], type=pa.string()),
                "right_packed": pa.array(tpack[ri[ok]], type=pa.string()),
            }
        )
        # slice into multiple blocks so the scorer actor pool parallelizes
        import ray as _ray

        n_slices = max(1, min(64, int(_ray.cluster_resources().get("CPU", 8)) * 2))
        step = max(1, (table.num_rows + n_slices - 1) // n_slices)
        slices = [table.slice(i, step) for i in range(0, table.num_rows, step)]
        return rd.from_arrow(slices or [table])

    # Shuffle regime below — the 100 TB path. Candidate tokens are selected
    # by ONE distributed semi-join exchange: every file is tokenized in
    # place (a local map; packed prefixes are capped, so the exchanged
    # volume is O(corpus prefixes), the same order as reading the corpus
    # once), the slim pair-id column (int64s) is unioned in as key rows,
    # and each hash(file_id) % P partition keeps only files present in some
    # pair. No driver collect anywhere on this path. The surviving token
    # set feeds BOTH side-attaches — materialize once, and collapse the
    # blocks >> rows regime (the filtered candidate tokens inherit the
    # corpus's block count; Ray's sort groupby pays per-block task
    # overhead) before the exchanges.
    from opentapioca_ray.stages.exchange import coarse_semi_join, right_size

    key_schema = pa.schema([("file_id", pa.int64())])

    def pair_id_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "left_id" not in batch.column_names:
            return key_schema.empty_table()
        left = batch.select(["left_id"]).rename_columns(["file_id"])
        right = batch.select(["right_id"]).rename_columns(["file_id"])
        return pa.concat_tables([left, right]).cast(key_schema)

    token_schema = pa.schema(
        [("file_id", pa.int64()), ("repo", pa.string()), ("packed", pa.string())]
    )
    tokens = coarse_semi_join(
        files_ds.map_batches(make_token_rows(None), batch_format="pyarrow"),
        "file_id",
        pairs_ds.map_batches(pair_id_rows, batch_format="pyarrow"),
        schema=token_schema,
    )
    tokens = right_size(tokens.materialize())
    pairs_ds = right_size(pairs_ds)

    def _attach(side_pairs_ds, key: str, prefix: str, carry: list[tuple[str, pa.DataType]]):
        """union(pair rows keyed by `key`, token rows) -> ONE coarse-
        partition exchange on hash(file_id) % P -> pair rows +
        {prefix}_repo/{prefix}_packed. The partition kernel joins ALL its
        files with one sorted-array searchsorted pass — not per-file groups
        (per-group overhead collapses at millions of candidate files)."""
        carry_names = [c for c, _ in carry]
        union_schema = pa.schema(
            [("file_id", pa.int64()), ("is_token", pa.bool_()),
             ("repo", pa.string()), ("packed", pa.string()), *carry]
        )

        def pair_rows(batch: pa.Table) -> pa.Table:
            if "left_id" not in batch.column_names:
                return union_schema.empty_table()
            n = batch.num_rows
            cols = {
                "file_id": batch.column(key).cast(pa.int64()),
                "is_token": pa.array([False] * n, type=pa.bool_()),
                "repo": pa.array([""] * n, type=pa.string()),
                "packed": pa.array([""] * n, type=pa.string()),
            }
            for c, typ in carry:
                cols[c] = batch.column(c).cast(typ)
            return pa.table(cols).cast(union_schema)

        def tok_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "file_id": batch.column("file_id").cast(pa.int64()),
                "is_token": pa.array([True] * n, type=pa.bool_()),
                "repo": batch.column("repo"),
                "packed": batch.column("packed"),
            }
            for c, typ in carry:
                cols[c] = pa.nulls(n, type=typ)
            return pa.table(cols).cast(union_schema)

        unioned = side_pairs_ds.map_batches(pair_rows, batch_format="pyarrow").union(
            tokens.map_batches(tok_rows, batch_format="pyarrow")
        )
        out_schema = pa.schema(
            [*carry, (f"{prefix}_repo", pa.string()), (f"{prefix}_packed", pa.string())]
        )

        def attach_partition(df: pd.DataFrame) -> pd.DataFrame:
            tok = df[df["is_token"]]
            mem = df[~df["is_token"]]
            if tok.empty or mem.empty:
                return out_schema.empty_table().to_pandas()
            tk = tok["file_id"].to_numpy(dtype=np.int64)
            o = np.argsort(tk)
            tk = tk[o]
            trepo = tok["repo"].to_numpy()[o]
            tpack = tok["packed"].to_numpy()[o]
            mk = mem["file_id"].to_numpy(dtype=np.int64)
            idx = np.clip(np.searchsorted(tk, mk), 0, len(tk) - 1)
            ok = tk[idx] == mk
            out = mem.loc[ok, carry_names].reset_index(drop=True)
            # token rows carry nulls in the pair columns, so pandas widened
            # the ints to float64 across the union — restore the schema dtype
            for c, typ in carry:
                if pa.types.is_integer(typ):
                    out[c] = out[c].astype(np.int64)
            out[f"{prefix}_repo"] = trepo[idx[ok]]
            out[f"{prefix}_packed"] = tpack[idx[ok]]
            return out

        from opentapioca_ray.stages.exchange import coarse_group_apply

        return coarse_group_apply(unioned, "file_id", attach_partition)

    base_carry = [
        ("left_id", pa.int64()),
        ("right_id", pa.int64()),
        ("capped", pa.int64()),
        ("nb_bands", pa.int64()),
    ]
    with_left = right_size(_attach(pairs_ds, "left_id", "left", base_carry).materialize())
    return _attach(
        with_left,
        "right_id",
        "right",
        base_carry + [("left_repo", pa.string()), ("left_packed", pa.string())],
    )


def linkage_clusters(
    files_ds,
    model: LinearModel | None = None,
    idf: dict | None = None,
    prior: dict | None = None,
    threshold: float = 0.0,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    max_block_size: int = 64,
    window: int = 8,
    concurrency=None,
    payload_mode: str = "auto",
    inline_threshold: int = 0,
    distributed: bool = False,
):
    """Full pipeline -> (clusters_ds (node, component), scored_pairs_ds).

    `distributed=True` forces every VOLUME-carrying stage (corpus stats,
    blocking, singleton prefilter, pair generation, token attach) onto its
    distributed/shuffle implementation — no driver-side small-regime
    shortcuts on anything that scales with the input; the configuration the
    scaling benchmark measures. Connected components keeps its own
    scale-adaptive threshold even here: its input is the derived MATCH-EDGE
    set (a tiny fraction of the corpus by construction), so a multi-node
    100TB run takes the same local union-find below `local_threshold`
    edges; the shuffle star rounds are forced and equivalence-tested
    separately (tests/test_cc.py, local_threshold=0).

    Two payload strategies for the wide block shuffle:
    - "inline": token prefixes ride along in the band shuffle (one wide
      exchange, fewest barriers) — fastest while `bands x files x TOKENS_CAP`
      fits comfortably through the object store;
    - "attach": the band shuffle ships ids only, pairs are deduplicated
      across bands FIRST, then token payloads are attached to surviving
      pairs by a reduce-side join and each pair is scored exactly once —
      the 100TB path (shuffle bytes independent of content width).
    "auto" picks inline below `inline_threshold` files; with the vectorized
    attach/pair kernels, attach measures faster at every tested scale, so
    the default threshold is 0 (attach always); inline stays available for
    workloads with very wide bands-per-pair ratios.
    """
    import ray.data as rd

    files_ds = files_ds.materialize()  # consumed by idf, prior, blocks, tokens
    stats_mode = "shuffle" if distributed else "auto"
    if idf is None and prior is None:
        idf, prior = corpus_stats(files_ds, mode=stats_mode)
    elif idf is None:
        idf = train_idf(files_ds)
    elif prior is None:
        prior = repo_in_degree_prior(files_ds)
    if distributed:
        payload_mode = "attach"
    elif payload_mode == "auto":
        payload_mode = "inline" if files_ds.count() <= inline_threshold else "attach"
    if payload_mode == "inline":
        blocks = build_blocks(files_ds, num_perm, bands, shingle_k)
        pairs = build_pairs(blocks, max_block_size, window)
        scored = dedup_scored_pairs(score_pairs(pairs, idf, prior, model, concurrency))
    else:
        sub_mode = "shuffle" if distributed else "auto"
        pairs = build_id_pairs(
            files_ds, num_perm, bands, shingle_k, max_block_size, window,
            mode=sub_mode, prefilter_mode=sub_mode,
        )
        enriched = attach_pair_tokens(pairs, files_ds, mode=sub_mode)
        if enriched is None:  # no candidate pairs at all
            empty_sc = pa.schema(
                [("left_id", pa.int64()), ("right_id", pa.int64()), ("score", pa.float64())]
            ).empty_table()
            empty_cl = pa.schema(
                [("node", pa.int64()), ("component", pa.int64())]
            ).empty_table()
            return rd.from_arrow(empty_cl), rd.from_arrow(empty_sc)
        scored = score_pairs(enriched, idf, prior, model, concurrency)
    # scored is consumed at least twice (match-edge derivation here, and
    # callers re-read it: F1 eval, the oracle's match-edge dump); left lazy,
    # each consumer re-runs the whole blocking+scoring pipeline
    scored = scored.materialize()
    edges = match_edges(scored, threshold)
    clusters = connected_components(edges)
    return clusters, scored


def linkage_checkpointed(
    sf_dir: str,
    out_root: str,
    model: LinearModel | None = None,
    threshold: float = 0.0,
    replicate: int = 1,
    **kwargs,
):
    """Stage-by-stage checkpointed run (north rule: every stage to Parquet
    with per-partition lineage + metrics; a re-run skips stages whose
    manifest is complete and fingerprint-matches its params + upstreams).

    Stages: files -> pairs -> scored -> clusters. Returns
    (clusters_ds, checkpoint) — `checkpoint.metrics()` is the per-stage
    lineage/row-count roll-up."""
    from opentapioca_ray.checkpoint import StageCheckpoint
    from opentapioca_ray.sources.files import read_files

    ckpt = StageCheckpoint(out_root)
    base_params = {"sf_dir": sf_dir, "replicate": replicate}

    files = ckpt.run("files", base_params, [], lambda: read_files(sf_dir, replicate))
    files = files.materialize()

    idf, prior = corpus_stats(files)

    # fingerprint EVERY param build_id_pairs consumes (max_block_size and
    # window change the emitted pair set too) so a re-run with different
    # values invalidates the stage instead of reusing a stale checkpoint
    _PAIR_KEYS = ("num_perm", "bands", "shingle_k", "max_block_size", "window",
                  "mode", "prefilter_mode")
    pair_kwargs = {k: kwargs[k] for k in _PAIR_KEYS if k in kwargs}
    pair_params = {**base_params, **pair_kwargs}
    pairs = ckpt.run(
        "pairs", pair_params, ["files"],
        lambda: build_id_pairs(files, **pair_kwargs),
    )

    def build_scored():
        enriched = attach_pair_tokens(pairs, files)
        if enriched is None:
            return _empty_scored()
        return score_pairs(enriched, idf, prior, model)

    def _empty_scored():
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("left_id", pa.int64()), ("right_id", pa.int64()),
                 ("score", pa.float64())]
            ).empty_table()
        )

    score_params = {**base_params, "model": model.to_dict() if model else None}
    scored = ckpt.run("scored", score_params, ["pairs"], build_scored)

    cluster_params = {**base_params, "threshold": threshold}
    clusters = ckpt.run(
        "clusters",
        cluster_params,
        ["scored"],
        lambda: connected_components(match_edges(scored, threshold)),
    )
    return clusters, ckpt


# ---------------------------------------------------------------------------
# Training on labeled pairs
# ---------------------------------------------------------------------------

def featurize_labeled_pairs(
    files_df: pd.DataFrame, labeled: pd.DataFrame, idf: dict, prior: dict
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side design matrix for the (small) labeled-pairs corpus."""
    from opentapioca_ray.functions.text import tokenize
    from opentapioca_ray.stages.pairs import TOKENS_CAP

    feat = PairFeaturizer(idf, prior)
    by_id = files_df.set_index("file_id")
    X, y = [], []
    for r in labeled.itertuples():
        left = by_id.loc[r.left_id]
        right = by_id.loc[r.right_id]
        row = {
            "left_tokens": tokenize(str(left["content"])[:10000])[:TOKENS_CAP],
            "right_tokens": tokenize(str(right["content"])[:10000])[:TOKENS_CAP],
            "left_repo": left["repo"],
            "right_repo": right["repo"],
        }
        X.append(feat.features(row))
        y.append(int(r.is_match))
    return np.asarray(X), np.asarray(y)


def train_linkage_model(
    files_df: pd.DataFrame,
    labeled: pd.DataFrame,
    idf: dict,
    prior: dict,
    C: float = 1.0,
    max_iter: int = 300,
) -> LinearModel:
    X, y = featurize_labeled_pairs(files_df, labeled, idf, prior)
    return LinearModel(C=C, max_iter=max_iter).fit(X, y)


def train_linkage_model_ds(
    files_ds,
    labeled: pd.DataFrame,
    idf: dict,
    prior: dict,
    C: float = 1.0,
    max_iter: int = 300,
) -> LinearModel:
    """`train_linkage_model` over a Dataset WITHOUT collecting the corpus
    (round-5 verdict item 4): the labeled pairs reference at most
    2×|labeled| file ids, so broadcast that id set into a distributed
    filter and collect only the referenced rows — the driver never holds
    more than the labeled corpus's own files, however big `files_ds` is."""
    import pyarrow.compute as pc

    needed = set(labeled["left_id"].astype(str)) | set(
        labeled["right_id"].astype(str)
    )
    id_set = pa.array(sorted(needed), type=pa.string())

    def keep_labeled(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "file_id" not in batch.column_names:
            return batch
        return batch.filter(
            pc.is_in(batch.column("file_id").cast(pa.string()), value_set=id_set)
        )

    files_df = files_ds.map_batches(
        keep_labeled, batch_format="pyarrow"
    ).to_pandas()
    return train_linkage_model(
        files_df, labeled, idf, prior, C=C, max_iter=max_iter
    )
