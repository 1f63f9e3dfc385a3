"""Distributed k-means over an embedding column (topic-style clustering).

Lloyd's algorithm, Ray-Data-first: each iteration is ONE streaming pass —
centroids broadcast via `ray.put`, every batch computes its assignments and
a (k x dim) partial sum + count matrix (the combiner), and only those tiny
partials reach the driver for the centroid update. The corpus is never
materialized; per-iteration driver state is O(k x dim), same acceptance as
PageRank's O(|V|) rank vector (pipelines/pagerank.py).

Cosine geometry (unit sphere), matching the embedding-dedup / ANN stages:
vectors are L2-normalized once per batch, assignment is argmax dot product,
and updated centroids are re-normalized means.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from opentapioca_ray.functions.vectors import list_to_matrix


def _unit(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 10,
    vector_column: str = "embedding",
    sample_size: int = 2000,
    seed: int = 42,
) -> np.ndarray:
    """Fit k unit centroids. Deterministic: init from a seeded choice over
    the first `sample_size` rows, then `iters` full Lloyd passes."""
    import ray

    head = ds.limit(sample_size).to_pandas()
    init = _unit(np.array(head[vector_column].tolist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    centroids = init[rng.choice(len(init), size=min(k, len(init)), replace=False)]
    dim = centroids.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            vecs = _unit(list_to_matrix(batch.column(vector_column)))
            assign = (vecs @ cents.T).argmax(axis=1)
            sums = np.zeros((len(cents), vecs.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(cents)), type=pa.int64()),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "n": pa.array(counts, type=pa.int64()),
                }
            )

        part_ds = ds.select_columns([vector_column]).map_batches(
            partials, batch_format="pyarrow"
        )
        total = np.zeros((k, dim), dtype=np.float64)
        total_n = np.zeros(k, dtype=np.int64)
        for ref in part_ds.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows == 0 or "cluster" not in t.column_names:
                continue
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            vs = list_to_matrix(t.column("vsum"))
            nn = t.column("n").to_numpy(zero_copy_only=False)
            np.add.at(total, cl, vs)
            np.add.at(total_n, cl, nn)
        nonzero = total_n > 0
        new = centroids.copy()
        new[nonzero] = total[nonzero] / total_n[nonzero, None]
        centroids = _unit(new)
    return centroids


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
):
    """Label every row with its nearest (cosine) centroid — one stateless
    broadcast pass; output (id_column, cluster, cosine)."""
    import ray

    cent_ref = ray.put(_unit(np.asarray(centroids, dtype=np.float64)))

    def fn(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        vecs = _unit(list_to_matrix(batch.column(vector_column)))
        sims = vecs @ cents.T
        assign = sims.argmax(axis=1)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "cluster": pa.array(assign, type=pa.int64()),
                "cosine": pa.array(sims[np.arange(len(assign)), assign], type=pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
