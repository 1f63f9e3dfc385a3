"""Property tests (hypothesis) for the pure vectorized kernels that the
distributed operators lean on — no Ray session needed; these pin the
numpy kernels against brute-force definitions on adversarial inputs."""

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=0, max_size=60))
def test_segment_pairs_matches_bruteforce(keys):
    from opentapioca_ray.stages.triangles import _segment_pairs

    arr = np.sort(np.array(keys, dtype=np.int64))
    li, ri = _segment_pairs(arr)
    got = sorted(zip(li.tolist(), ri.tolist()))
    want = sorted(
        (i, j)
        for i in range(len(arr))
        for j in range(i + 1, len(arr))
        if arr[i] == arr[j]
    )
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.binary(min_size=0, max_size=40) | st.text(max_size=30).map(lambda s: s.encode()),
        min_size=0,
        max_size=50,
    )
)
def test_row_md5_u64_matches_naive(rows):
    from opentapioca_ray.stages.quality import _row_md5_u64

    arr = pa.array(rows, type=pa.binary())
    got = _row_md5_u64(arr)
    want = np.array(
        [
            int.from_bytes(hashlib.md5(r).digest()[:8], "big")
            for r in rows
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(got, want)


def test_row_md5_u64_sliced_and_empty():
    from opentapioca_ray.stages.quality import _row_md5_u64

    arr = pa.array([b"aa", b"bb", b"cc", b"dd"], type=pa.binary())
    sliced = arr.slice(1, 2)  # non-zero offset buffer view
    got = _row_md5_u64(sliced)
    want = np.array(
        [int.from_bytes(hashlib.md5(x).digest()[:8], "big") for x in (b"bb", b"cc")],
        dtype=np.uint64,
    )
    assert np.array_equal(got, want)
    assert len(_row_md5_u64(pa.array([], type=pa.binary()))) == 0
    # all-empty strings: data buffer may be absent
    z = _row_md5_u64(pa.array([b"", b""], type=pa.binary()))
    e = np.uint64(int.from_bytes(hashlib.md5(b"").digest()[:8], "big"))
    assert np.array_equal(z, np.array([e, e], dtype=np.uint64))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20))
def test_analyze_term_endswith_equals_regex(token):
    """The endswith fast path must stay byte-identical to the original
    possessive-strip regex for arbitrary unicode tokens."""
    import re

    from opentapioca_ray.functions.text import analyze_term, ascii_fold

    regex_version = ascii_fold(re.sub(r"['’]s$", "", token))
    assert analyze_term(token) == regex_version


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=60
    )
)
def test_support_numpy_matches_bruteforce(raw_pairs):
    """Driver k-truss support kernel vs adjacency-set brute force."""
    from opentapioca_ray.stages.triangles import _support_numpy

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw_pairs if u != v})
    if not edges:
        return
    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    sup = _support_numpy(u, v)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = [len(adj[a] & adj[b]) for a, b in edges]
    assert sup.tolist() == want
