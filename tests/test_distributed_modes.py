"""Forced distributed/shuffle regimes must match the driver small-regime
results — the correctness contract behind the scale-adaptive switches."""

import numpy as np
import pandas as pd
import pytest


def _files(ray_session):
    import ray.data

    from opentapioca_ray.sources.files import read_files

    return read_files("/root/testdata/sf0.001").materialize()


def test_build_id_pairs_modes_agree(ray_session):
    from opentapioca_ray.pipelines.linkage import build_id_pairs

    files = _files(ray_session)
    cols = ["left_id", "right_id", "capped", "nb_bands"]
    a = (
        build_id_pairs(files, mode="driver")
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    b = (
        build_id_pairs(files, mode="shuffle", prefilter_mode="shuffle")
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_count_edges_modes_agree(ray_session):
    import ray.data

    from opentapioca_ray.pipelines.pagerank import count_edges

    li = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    cols = ["src", "dst", "count"]
    a = (
        count_edges(li, "l_partkey", "l_suppkey", mode="driver")
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    li2 = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    b = (
        count_edges(li2, "l_partkey", "l_suppkey", mode="shuffle")
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_linkage_distributed_matches_adaptive(ray_session):
    from opentapioca_ray.pipelines.linkage import linkage_clusters
    from opentapioca_ray.sources.files import read_files

    files = read_files("/root/testdata/sf0.001")
    adaptive, _ = linkage_clusters(files, model=None, threshold=0.2)
    dist, _ = linkage_clusters(
        read_files("/root/testdata/sf0.001"), model=None, threshold=0.2, distributed=True
    )
    a = {r["node"]: r["component"] for r in adaptive.take_all()}
    b = {r["node"]: r["component"] for r in dist.take_all()}
    assert a == b and len(a) > 0


def test_sorted_edge_arrays_modes_agree(ray_session):
    import ray.data

    from opentapioca_ray.pipelines.pagerank import (
        count_edges,
        normalize_edges,
        sorted_edge_arrays,
    )

    li = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    edges = normalize_edges(count_edges(li, "l_partkey", "l_suppkey")).materialize()
    s1, d1, w1 = sorted_edge_arrays(edges, mode="driver")
    s2, d2, w2 = sorted_edge_arrays(edges, mode="shuffle")
    assert np.array_equal(s1, s2)
    assert np.array_equal(d1, d2)
    assert np.allclose(w1, w2)
