import json

import numpy as np
import pytest

from opentapioca_ray.pipelines.pagerank import (
    compute_pagerank_distributed,
    compute_pagerank_local,
    extract_edges,
    normalize_edges,
)
from opentapioca_ray.sources.dumpreader import items_from_seed
from opentapioca_ray.state.graph import LinkGraph


def tiny_items():
    def item(qid, targets):
        return {
            "id": qid,
            "claims": {
                "P1": [
                    {"mainsnak": {"datavalue": {"value": {"numeric-id": t}}}}
                    for t in targets
                ]
            },
        }

    return [
        item("Q1", [2, 3, 2]),  # duplicate edge -> multiplicity 2
        item("Q2", [1]),
        item("Q3", [1, 2]),
        item("Q4", []),  # no edges -> dropped
        {"id": "P5", "claims": {}},  # non-Q -> skipped
    ]


def test_extract_and_normalize(ray_session):
    ds = items_from_seed(tiny_items())
    edges = extract_edges(ds).take_all()
    by_src = {}
    for r in edges:
        by_src.setdefault(r["src"], []).append((r["dst"], r["count"]))
    assert sorted(by_src[1]) == [(2, 2), (3, 1)]
    assert by_src[2] == [(1, 1)]
    assert 4 not in by_src and 5 not in by_src
    norm = normalize_edges(extract_edges(ds)).take_all()
    w = {(r["src"], r["dst"]): r["weight"] for r in norm}
    assert w[(1, 2)] == pytest.approx(2 / 3)
    assert w[(1, 3)] == pytest.approx(1 / 3)


def test_local_pagerank_matches_reference_kernel(ray_session):
    ds = items_from_seed(tiny_items())
    norm = normalize_edges(extract_edges(ds))
    graph = compute_pagerank_local(norm, shape=4)
    # same graph straight through the numpy kernel
    ref = LinkGraph.from_edge_multiset([1, 1, 1, 2, 3, 3], [2, 3, 2, 1, 1, 2], shape=4)
    ref.compute_pagerank()
    np.testing.assert_allclose(graph.pagerank, ref.pagerank, atol=1e-12)
    assert abs(graph.pagerank.sum() - 1.0) < 1e-9


def test_distributed_matches_local(ray_session):
    ds = items_from_seed(tiny_items())
    norm = normalize_edges(extract_edges(ds))
    local = compute_pagerank_local(norm, shape=4).pagerank
    dist = compute_pagerank_distributed(norm, shape=4)
    np.testing.assert_allclose(dist, local, atol=1e-10)
