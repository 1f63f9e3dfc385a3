"""BPE vocabulary learning (stages/bpe.py)."""

import numpy as np
import pytest


def test_bpe_learns_frequent_pairs(ray_session):
    """Sennrich-style toy corpus: the most frequent character pairs merge
    first, and later rounds build on earlier merges."""
    import ray.data

    from opentapioca_ray.stages.bpe import bpe_train

    docs = [
        {"text": "low low low low low lower lower newest newest newest "
                 "newest newest newest widest widest widest"}
    ]
    out = bpe_train(ray.data.from_items(docs), n_merges=6)
    merges = list(zip(out["left_sym"], out["right_sym"]))
    # 'es' appears in newest(6) + widest(3) = 9 -> the top pair; 'est'
    # follows immediately (count 9 again, built on the first merge)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert out["pair_count"].iloc[0] == 9
    assert out["pair_count"].iloc[1] == 9
    # 'lo' from low(5)+lower(2) = 7 next
    assert merges[2] == ("l", "o")
    assert out["pair_count"].iloc[2] == 7
    # rounds are 0..5 in order
    assert list(out["round"]) == list(range(6))


def test_bpe_tie_break_lexicographic(ray_session):
    import ray.data

    from opentapioca_ray.stages.bpe import bpe_train

    # 'ab' and 'cd' both appear twice; (a,b) < (c,d) lexicographically
    docs = [{"text": "ab ab cd cd"}]
    out = bpe_train(ray.data.from_items(docs), n_merges=2)
    assert list(zip(out["left_sym"], out["right_sym"])) == [
        ("a", "b"),
        ("c", "d"),
    ]


def test_bpe_stops_when_no_pairs(ray_session):
    import ray.data

    from opentapioca_ray.stages.bpe import bpe_train

    docs = [{"text": "a b c d e"}]  # all single-char words: zero pairs
    out = bpe_train(ray.data.from_items(docs), n_merges=5)
    assert len(out) == 0


def test_replace_semantics_identical_across_engines():
    """The merge-application contract: 6-pass non-overlapping literal
    replace behaves identically in Python, Arrow and DuckDB — including
    the documented alternating-run variant."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    cases = [
        (" a a a a a a ", " a a ", " aa "),
        (" x a b a b a b y ", " a b ", " ab "),
        (" a a a ", " a a ", " aa "),
        (" ab a b ab ", " a b ", " ab "),
    ]
    con = duckdb.connect()
    for s, p, r in cases:
        py = s
        arrow = pa.array([s])
        for _ in range(6):
            py = py.replace(p, r)
            arrow = pc.replace_substring(arrow, pattern=p, replacement=r)
        q = "SELECT " + "replace(" * 6 + "?" + ", ?, ?)" * 6
        dd = con.execute(q, [s] + [p, r] * 6).fetchone()[0]
        assert py == arrow[0].as_py() == dd
    # pin the documented variant explicitly
    assert (
        " a a a a a a ".replace(" a a ", " aa ").replace(" a a ", " aa ")
        == " aa a aa a "
    )


def test_bpe_run_variant_is_deterministic(ray_session):
    """Runs of identical symbols merge alternately (the documented
    deviation from canonical greedy packing) — and do so reproducibly."""
    import ray.data

    from opentapioca_ray.stages.bpe import bpe_train

    docs = [{"text": "aaaaaa aaaaaa"}]
    out1 = bpe_train(ray.data.from_items(docs), n_merges=3)
    out2 = bpe_train(ray.data.from_items(docs), n_merges=3)
    assert out1.equals(out2)
    assert (out1["left_sym"].iloc[0], out1["right_sym"].iloc[0]) == ("a", "a")
    # after ' a a a a a a ' -> ' aa a aa a ', the top pair is (aa, a)
    assert (out1["left_sym"].iloc[1], out1["right_sym"].iloc[1]) == ("aa", "a")


def test_bpe_encode_compression(ray_session):
    """The encode side: per-doc BPE token counts are bounded by char and
    word counts, and merges strictly compress a corpus that repeats its
    vocabulary."""
    import ray.data

    sys_docs = [
        {"doc_id": 1, "text": "lower lower lower newest newest"},
        {"doc_id": 2, "text": "low newest"},
    ]
    import sys

    sys.path.insert(0, "/root/repo")

    from opentapioca_ray.stages.bpe import bpe_train

    merges, state = bpe_train(
        ray.data.from_items(sys_docs), n_merges=4, return_state=True
    )
    # token table: word -> n_sym after 4 merges
    toks = {
        r["repr"].strip().replace(" ", ""): len(r["repr"].split())
        for r in state.take_all()
    }
    assert set(toks) == {"lower", "newest", "low"}
    for w, n in toks.items():
        assert 1 <= n <= len(w)
    # the most frequent words compressed below their char counts
    assert toks["lower"] < len("lower")
    assert toks["newest"] < len("newest")
