"""PageRank semantics goldens (reference test_wikidatagraph.py:11-26,
wikidatagraph.py:131-170): unsorted input raises, 16 iterations + loss
compensation, OOV default 0.01/N."""

import numpy as np
import pytest

from opentapioca_ray.state.graph import LinkGraph, pagerank_from_vector


def test_unsorted_raises():
    with pytest.raises(ValueError):
        LinkGraph.from_sorted_edges(
            np.array([2, 1]), np.array([0, 0]), np.array([1.0, 1.0])
        )


def test_row_normalization_from_multiset():
    # node 0 links to 1 twice and 2 once -> weights 2/3, 1/3
    g = LinkGraph.from_edge_multiset([0, 0, 0], [1, 1, 2], shape=3)
    assert g.indptr.tolist() == [0, 2, 2, 2]
    assert g.indices.tolist() == [1, 2]
    np.testing.assert_allclose(g.data, [2 / 3, 1 / 3])


def test_pagerank_sums_to_one_and_ranks_hub():
    # star: everyone links to node 0
    src = [1, 2, 3, 4]
    dst = [0, 0, 0, 0]
    g = LinkGraph.from_edge_multiset(src, dst, shape=5)
    v = g.compute_pagerank()
    assert abs(v.sum() - 1.0) < 1e-9
    assert v[0] == v.max()
    # loss compensation keeps dangling node 0's mass in the system
    assert all(v > 0)


def test_pagerank_two_cycle_symmetric():
    g = LinkGraph.from_edge_multiset([0, 1], [1, 0], shape=2)
    v = g.compute_pagerank()
    np.testing.assert_allclose(v, [0.5, 0.5], atol=1e-12)


def test_oov_default():
    g = pagerank_from_vector(np.array([0.6, 0.4]))
    assert g.get_pagerank(0) == 0.6
    assert g.get_pagerank(99) == 0.01 / 2


def test_rank_feature_transform():
    g = pagerank_from_vector(np.array([np.e**-3, 0.5]))
    assert abs(g.rank_feature(0) - 20.0) < 1e-9
