"""Flagship-pipeline conformance: pairwise F1 >= 0.99 on the labeled
synthetic corpus at the same blocking keys (BASELINE.json north_rule),
plus sha256 invariant end-to-end."""

import numpy as np
import pandas as pd
import pytest

from opentapioca_ray.pipelines.linkage import (
    linkage_clusters,
    repo_in_degree_prior,
    train_idf,
    train_linkage_model,
)
from opentapioca_ray.sources.files import verify_sha256
from opentapioca_ray.sources.synthetic import pairwise_f1, synthesize_files


@pytest.fixture(scope="module")
def corpus():
    files_df, truth = synthesize_files(
        n_clusters=25, cluster_size=3, n_singletons=25, seed=7
    )
    return files_df, truth


def test_linkage_f1_gate(ray_session, corpus):
    import ray.data

    files_df, truth = corpus
    files_ds = ray.data.from_pandas(files_df)
    idf = train_idf(files_ds)
    prior = repo_in_degree_prior(files_ds)
    model = train_linkage_model(files_df, truth, idf, prior)
    clusters, scored = linkage_clusters(
        files_ds, model=model, idf=idf, prior=prior, threshold=0.0
    )
    assignments = {r["node"]: r["component"] for r in clusters.take_all()}
    metrics = pairwise_f1(assignments, truth)
    assert metrics["f1"] >= 0.99, metrics


def test_linkage_untrained_still_clusters(ray_session, corpus):
    import ray.data

    files_df, truth = corpus
    files_ds = ray.data.from_pandas(files_df)
    clusters, _ = linkage_clusters(files_ds, model=None, threshold=0.2)
    assignments = {r["node"]: r["component"] for r in clusters.take_all()}
    metrics = pairwise_f1(assignments, truth)
    assert metrics["f1"] >= 0.95, metrics


def test_sha256_invariant(ray_session, corpus):
    import ray.data

    files_df, _ = corpus
    files_ds = ray.data.from_pandas(files_df)
    assert verify_sha256(files_ds) == 0


def test_idf_and_prior(ray_session, corpus):
    import ray.data

    files_df, _ = corpus
    files_ds = ray.data.from_pandas(files_df)
    idf = train_idf(files_ds)
    assert len(idf) > 0
    assert all(np.isfinite(v) for v in idf.values())
    prior = repo_in_degree_prior(files_ds)
    assert prior and max(prior.values()) == 1.0


def test_repo_prior_max_repos_cap(ray_session, corpus):
    """The broadcast-state guard keeps only the top-N repos by file count;
    the surviving entries keep the same normalized values."""
    import ray.data

    files_df, _ = corpus
    files_ds = ray.data.from_pandas(files_df)
    full = repo_in_degree_prior(files_ds)
    n_keep = max(1, len(full) // 2)
    capped = repo_in_degree_prior(files_ds, max_repos=n_keep)
    assert len(capped) == n_keep
    # kept repos are the highest-count ones and retain their values
    kept_min = min(capped.values())
    dropped = {k: v for k, v in full.items() if k not in capped}
    assert all(v <= kept_min for v in dropped.values())
    assert all(full[k] == v for k, v in capped.items())


def test_corpus_stats_matches_separate_passes(ray_session, corpus):
    import ray.data

    from opentapioca_ray.pipelines.linkage import corpus_stats

    files_df, _ = corpus
    files_ds = ray.data.from_pandas(files_df)
    idf1, prior1 = corpus_stats(files_ds)
    idf2 = train_idf(files_ds)
    prior2 = repo_in_degree_prior(files_ds)
    assert set(idf1) == set(idf2)
    assert all(abs(idf1[k] - idf2[k]) < 1e-12 for k in idf1)
    assert prior1 == pytest.approx(prior2)


def test_linkage_checkpointed_stages_and_resume(ray_session, tmp_path):
    from opentapioca_ray.pipelines.linkage import linkage_checkpointed

    out = str(tmp_path / "run")
    clusters, ckpt = linkage_checkpointed(
        "/root/testdata/sf0.001", out, threshold=0.2
    )
    n1 = clusters.count()
    m = ckpt.metrics()
    assert set(m) == {"files", "pairs", "scored", "clusters"}
    assert m["files"]["rows"] == 500
    assert n1 > 0
    # re-run: every stage manifest matches -> no stage rebuilds (same rows)
    clusters2, ckpt2 = linkage_checkpointed(
        "/root/testdata/sf0.001", out, threshold=0.2
    )
    assert clusters2.count() == n1
    # changing a downstream param invalidates only downstream stages
    clusters3, ckpt3 = linkage_checkpointed(
        "/root/testdata/sf0.001", out, threshold=0.9
    )
    m3 = ckpt3.metrics()
    assert m3["files"]["fingerprint"] == m["files"]["fingerprint"]
    assert m3["clusters"]["fingerprint"] != m["clusters"]["fingerprint"]
