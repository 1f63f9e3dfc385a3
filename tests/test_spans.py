"""shared_spans: maximal duplicated token spans as diagonal k-gram runs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run(docs, **kw):
    import ray.data

    from opentapioca_ray.stages.spans import shared_spans

    ds = ray.data.from_pandas(pd.DataFrame(docs))
    out = shared_spans(ds, **kw).to_pandas()
    if out.empty:
        return out
    return out.sort_values(["u", "v", "u_start"]).reset_index(drop=True)


WORDS = [f"w{i}" for i in range(40)]


def test_single_maximal_span(ray_session):
    # docs share tokens 5..18 of doc 1 (= tokens 0..13 of doc 2): one
    # maximal 14-token span, nothing else in common
    shared = WORDS[:14]
    a = " ".join([f"a{i}" for i in range(5)] + shared + ["tail1", "tail2"])
    b = " ".join(shared + [f"b{i}" for i in range(6)])
    out = _run(
        {"doc_id": [1, 2], "text": [a, b]}, k=4, min_tokens=4, df_cap=64
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.u, r.v, r.u_start, r.v_start, r.n_tokens) == (1, 2, 5, 0, 14)


def test_two_diagonals_and_min_tokens(ray_session):
    # doc 2 repeats the shared block twice -> two maximal spans on two
    # diagonals; min_tokens filters the shorter second block
    big = WORDS[:10]
    small = WORDS[20:25]
    a = " ".join(big + ["x1", "x2"] + small)
    b = " ".join(["y0"] + big + ["y1"] + small + ["y2"] + big)
    out = _run(
        {"doc_id": [1, 2], "text": [a, b]}, k=4, min_tokens=4, df_cap=64
    )
    spans = set(zip(out.u_start, out.v_start, out.n_tokens))
    assert (0, 1, 10) in spans  # big block, first copy
    assert (0, 18, 10) in spans  # big block, second copy
    assert (12, 12, 5) in spans  # small block
    assert len(out) == 3
    out2 = _run(
        {"doc_id": [1, 2], "text": [a, b]}, k=4, min_tokens=8, df_cap=64
    )
    assert sorted(out2.n_tokens) == [10, 10]


def test_df_cap_drops_hot_gram(ray_session):
    # the same 4 tokens in every doc: gram occurs 6 times > cap 5 -> no rows
    t = " ".join(WORDS[:4])
    docs = {"doc_id": list(range(6)), "text": [t] * 6}
    assert len(_run(docs, k=4, min_tokens=4, df_cap=5)) == 0
    # raising the cap surfaces all 15 cross-doc pairs
    assert len(_run(docs, k=4, min_tokens=4, df_cap=64)) == 15


def test_short_docs_and_within_doc_repeats_ignored(ray_session):
    # doc 3 is shorter than k; doc 4 repeats its own text (no cross-doc
    # partner) -> neither produces rows
    out = _run(
        {
            "doc_id": [3, 4],
            "text": ["one two three", " ".join(WORDS[:6] + WORDS[:6])],
        },
        k=4,
        min_tokens=4,
        df_cap=64,
    )
    assert len(out) == 0


def test_positions_are_per_doc_token_offsets(ray_session):
    # three docs sharing one block at different offsets: every pair reports
    # its own 0-based starts
    blk = WORDS[30:36]
    texts = {
        10: " ".join(["p0"] + blk),
        11: " ".join(["q0", "q1", "q2"] + blk),
        12: " ".join(blk),
    }
    out = _run(
        {"doc_id": list(texts), "text": list(texts.values())},
        k=4,
        min_tokens=4,
        df_cap=64,
    )
    got = {(r.u, r.v): (r.u_start, r.v_start, r.n_tokens) for r in out.itertuples()}
    assert got[(10, 11)] == (1, 3, 6)
    assert got[(10, 12)] == (1, 0, 6)
    assert got[(11, 12)] == (3, 0, 6)


def test_span_coverage_interval_union(ray_session):
    import ray.data

    from opentapioca_ray.stages.spans import shared_spans, span_coverage

    # doc 1: 20 tokens; spans with doc 2 and doc 3 overlap inside doc 1
    # (tokens 0..9 and 5..14 -> union 0..14 = 15 covered of 20)
    w = [f"w{i}" for i in range(20)]
    doc1 = " ".join(w)
    doc2 = " ".join(w[:10] + ["x1", "x2", "x3", "x4"])
    doc3 = " ".join(["y1", "y2"] + w[5:15])
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": doc1},
            {"doc_id": 2, "text": doc2},
            {"doc_id": 3, "text": doc3},
        ]
    )
    spans = shared_spans(ds, k=4, min_tokens=4, df_cap=64)
    out = (
        span_coverage(spans, ds)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_tokens"] == 20
    assert out.loc[1, "covered_tokens"] == 15
    assert out.loc[1, "dup_fraction_e6"] == 750_000
    assert out.loc[2, "covered_tokens"] == 10
    assert out.loc[3, "covered_tokens"] == 10
    # doc 2/3 also share w[5:10) of each other -- contained in the above
    assert len(out) == 3


def test_span_removal_accounting(ray_session):
    import hashlib

    import ray.data

    from opentapioca_ray.stages.spans import shared_spans, span_removal

    w = [f"w{i}" for i in range(12)]
    doc1 = " ".join(w)                       # fully covered by doc2's copy
    doc2 = " ".join(["z1"] + w + ["z2"])     # shares all 12 tokens
    doc3 = "lonely words only here"          # untouched
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": doc1},
            {"doc_id": 2, "text": doc2},
            {"doc_id": 3, "text": doc3},
        ]
    )
    spans = shared_spans(ds, k=4, min_tokens=4, df_cap=64)
    out = (
        span_removal(spans, ds)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 3
    assert out.loc[1, "n_tokens"] == 12
    assert out.loc[1, "n_removed"] == 12
    assert out.loc[1, "clean_md5"] == hashlib.md5(b"").hexdigest()
    assert out.loc[2, "n_removed"] == 12
    assert out.loc[2, "clean_md5"] == hashlib.md5(b"z1 z2").hexdigest()
    assert out.loc[3, "n_removed"] == 0
    assert (
        out.loc[3, "clean_md5"]
        == hashlib.md5(b"lonely words only here").hexdigest()
    )
