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


# ---------------------------------------------------------------------------
# Broadcast corpus statistics
# ---------------------------------------------------------------------------

def train_idf(files_ds, text_column: str = "content", max_vocab: int = 500_000) -> dict:
    """Document-frequency per token -> idf = log(N / (1 + df)).

    Distinct-per-row extraction is combined inside `map_batches` before the
    word groupby (same shuffle shape as BOW training, SURVEY.md A1). The
    collected dict is the broadcast small side; vocabulary beyond
    `max_vocab` most-frequent entries falls back to the default idf."""
    from ray.data.aggregate import Sum

    from opentapioca_ray.state.bow import partial_word_counts

    n_docs = files_ds.count()
    partial = files_ds.map_batches(
        lambda b: partial_word_counts(b, text_column),
        batch_format="pyarrow",
    )
    counts = partial.groupby("word").aggregate(Sum("count", alias_name="count"))
    import ray

    idf: dict[str, float] = {}
    rows = 0
    for ref in counts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "word" not in t.column_names:
            continue
        for w, c in zip(t.column("word").to_pylist(), t.column("count").to_pylist()):
            idf[w] = float(np.log(n_docs / (1.0 + c)))
            rows += 1
    if len(idf) > max_vocab:
        keep = sorted(idf.items(), key=lambda kv: kv[1])[:max_vocab]
        idf = dict(keep)
    return idf


def repo_in_degree_prior(files_ds, repo_column: str = "repo") -> dict:
    """PageRank-style popularity prior from repo in-degree (north_star):
    log1p(file count per repo), normalized to [0, 1]."""
    from ray.data.aggregate import Count

    counts = files_ds.groupby(repo_column).aggregate(Count(alias_name="n"))
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
    from opentapioca_ray.stages.pairs import prefilter_singleton_blocks

    candidates = prefilter_singleton_blocks(blocks_ds)
    return candidates.groupby("block_key").map_groups(
        make_pair_group_fn(max_block_size, window), batch_format="pandas"
    )


def score_pairs(pairs_ds, idf: dict, prior: dict, model: LinearModel | None, concurrency=None):
    import ray

    kwargs = {
        "idf_ref": ray.put(idf),
        "repo_prior_ref": ray.put(prior),
        "model_dict": model.to_dict() if model is not None else None,
    }
    if concurrency is None:
        # autoscale the actor pool to the cluster (1 CPU per actor)
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, cpus))
    return pairs_ds.map_batches(
        PairScorerStage,
        fn_constructor_kwargs=kwargs,
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
):
    """Full pipeline -> (clusters_ds (node, component), scored_pairs_ds)."""
    if idf is None:
        idf = train_idf(files_ds)
    if prior is None:
        prior = repo_in_degree_prior(files_ds)
    blocks = build_blocks(files_ds, num_perm, bands, shingle_k)
    pairs = build_pairs(blocks, max_block_size, window)
    scored = dedup_scored_pairs(score_pairs(pairs, idf, prior, model, concurrency))
    edges = match_edges(scored, threshold)
    clusters = connected_components(edges)
    return clusters, scored


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
