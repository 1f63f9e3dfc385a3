"""Property-based tests (hypothesis) for the pure kernels — an upgrade over
the reference's golden-only strategy (SURVEY.md §5: "No property-based or
randomized tests")."""

import numpy as np
from hypothesis import given, settings, strategies as st

token = st.text(alphabet="abcdexyz", min_size=1, max_size=4)
tokens = st.lists(token, min_size=0, max_size=40)


def _ref_edit_distance(a, b, cap=48):
    a, b = a[:cap], b[:cap]
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


@settings(max_examples=200, deadline=None)
@given(tokens, tokens)
def test_edit_distance_matches_reference_dp(a, b):
    from opentapioca_ray.stages.pairs import bounded_edit_distance

    assert abs(bounded_edit_distance(a, b) - _ref_edit_distance(a, b)) < 1e-12


@settings(max_examples=200, deadline=None)
@given(tokens)
def test_edit_distance_identity_and_bounds(a):
    from opentapioca_ray.stages.pairs import bounded_edit_distance

    assert bounded_edit_distance(a, a) == 1.0
    b = a + ["zzz_new"]
    sim = bounded_edit_distance(a, b)
    assert 0.0 <= sim <= 1.0


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(0, 50)), st.sets(st.integers(0, 50)))
def test_jaccard_bounds_and_symmetry(a, b):
    from opentapioca_ray.functions.minhash import jaccard

    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    if a == b:
        assert j == 1.0


@settings(max_examples=50, deadline=None)
@given(tokens)
def test_minhash_identical_docs_identical_signatures(toks):
    from opentapioca_ray.functions.minhash import (
        minhash_signature_fast,
        shingle_hashes_fast,
    )

    s1 = minhash_signature_fast(shingle_hashes_fast(list(toks), 3), 64)
    s2 = minhash_signature_fast(shingle_hashes_fast(list(toks), 3), 64)
    assert (s1 == s2).all()
    assert len(s1) == 64


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="aAbB 12,-?", max_size=60))
def test_tokenize_never_emits_empty_tokens(text):
    from opentapioca_ray.functions.text import tokenize

    toks = tokenize(text)
    assert all(t for t in toks)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcXYZ' .Ü", max_size=40))
def test_analyzer_parity_index_vs_query_side(phrase):
    """The blocking-key correctness linchpin (SURVEY.md §7.4.2): indexing a
    phrase and tokenizing it as a query must yield identical token keys."""
    from opentapioca_ray.functions.text import analyze_phrase, tokenize_with_offsets

    index_side = analyze_phrase(phrase)
    query_side = tuple(t for t, _, _ in tokenize_with_offsets(phrase))
    assert index_side == query_side


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=60
    )
)
def test_union_find_oracle_properties(edges):
    from opentapioca_ray.stages.cc import connected_components_local

    comp = connected_components_local(edges)
    for u, v in edges:
        assert comp[u] == comp[v]          # endpoints co-assigned
    for n, c in comp.items():
        assert c <= n                       # root is min id of component
        assert comp[c] == c                 # root maps to itself


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50), st.integers(1, 10))
def test_sessionize_kernel_invariants(ts_list, gap):
    """Sessions partition the events; boundaries respect the gap."""
    ts = np.sort(np.array(ts_list, dtype=np.int64))
    new = np.concatenate(([False], np.diff(ts) > gap))
    sid = np.cumsum(new)
    # every event in exactly one session; session count == boundary count + 1
    assert sid[-1] + 1 == int(new.sum()) + 1
    for i in range(1, len(ts)):
        if sid[i] == sid[i - 1]:
            assert ts[i] - ts[i - 1] <= gap
        else:
            assert ts[i] - ts[i - 1] > gap
