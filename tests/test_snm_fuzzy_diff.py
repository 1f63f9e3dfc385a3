"""Sorted-neighborhood pairs, blocked Levenshtein matching, snapshot diff."""

import numpy as np
import pyarrow as pa


def test_global_rank_string_keys(ray_session):
    import ray.data

    from opentapioca_ray.stages.snm import global_rank

    t = pa.table(
        {
            "id": [5, 1, 3, 2, 4],
            "k": ["b", "a", "b", "c", "a"],
        }
    )
    out = (
        global_rank(ray.data.from_arrow(t).repartition(3), "k", "id")
        .to_pandas()
        .set_index("id")["rn"]
        .to_dict()
    )
    # order by (k, id): (a,1) (a,4) (b,3) (b,5) (c,2)
    assert out == {1: 1, 4: 2, 3: 3, 5: 4, 2: 5}


def test_snm_pairs_matches_bruteforce(ray_session):
    import ray.data

    from opentapioca_ray.stages.snm import sorted_neighborhood_pairs

    rng = np.random.RandomState(7)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    keys = np.array([f"k{v:03d}" for v in rng.randint(0, 40, n)])
    t = pa.table({"id": ids, "k": keys})
    w = 4
    out = sorted_neighborhood_pairs(
        ray.data.from_arrow(t).repartition(5), "k", "id", window=w, chunk=32
    ).to_pandas()
    got = set(zip(out["u"], out["v"], out["gap"]))
    order = np.lexsort((ids, keys))
    expect = set()
    for d in range(1, w + 1):
        for i in range(n - d):
            expect.add((ids[order[i]], ids[order[i + d]], d))
    assert got == expect


def test_fuzzy_block_pairs_known_distances(ray_session):
    import ray.data

    from opentapioca_ray.stages.fuzzy import fuzzy_block_pairs, levenshtein_pairs, _code_matrix

    # classic values, same block
    names = np.array(["kitten", "sitting", "kitten", "flaw", "lawn", ""], dtype=object)
    codes, lens = _code_matrix(names)
    ai = np.array([0, 3, 0, 5])
    bi = np.array([1, 4, 2, 0])
    lev = levenshtein_pairs(codes, lens, ai, bi)
    assert list(lev) == [3, 2, 0, 6]

    t = pa.table(
        {
            "id": [1, 2, 3, 4],
            "name": ["kitten", "sitting", "mitten", "bitten"],
            "blk": [0, 0, 0, 1],
        }
    )
    out = fuzzy_block_pairs(
        ray.data.from_arrow(t).repartition(3), "id", "name", "blk", max_dist=2
    ).to_pandas()
    got = {(r["u"], r["v"]): r["lev"] for _, r in out.iterrows()}
    # kitten-mitten 1; kitten-sitting 3 (dropped); sitting-mitten 4 (dropped);
    # bitten in its own block -> nothing
    assert got == {(1, 3): 1}


def test_snapshot_diff_statuses(ray_session):
    import ray.data

    from opentapioca_ray.stages.diff import snapshot_diff

    old = pa.table({"k": [1, 2, 3, 4], "p": [10, 20, 30, 40]})
    new = pa.table({"k": [2, 3, 4, 5], "p": [20, 31, 40, 50]})
    out = snapshot_diff(
        ray.data.from_arrow(old).repartition(2),
        ray.data.from_arrow(new).repartition(2),
        "k",
        "p",
    ).to_pandas()
    got = {
        r["key"]: (r["status"], r["old_units"], r["new_units"])
        for _, r in out.iterrows()
    }
    # 1 removed, 2 unchanged (absent), 3 changed, 4 unchanged, 5 added
    assert got == {
        1: ("removed", 10, -1),
        3: ("changed", 30, 31),
        5: ("added", -1, 50),
    }


def test_jaro_winkler_matches_duckdb_bitwise():
    """jaro_winkler_pairs is pinned to DuckDB's jaro_winkler_similarity
    (window, half-transpositions, 0.7 boost threshold, <=4-char prefix,
    empty-string -> 0.0)."""
    import random

    import duckdb
    import numpy as np
    import pandas as pd

    from opentapioca_ray.stages.fuzzy import _code_matrix, jaro_winkler_pairs

    rng = random.Random(11)
    names = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(0, 10)))
        for _ in range(150)
    ] + ["MARTHA", "MARHTA", "DIXON", "DICKSONX", "", "a", "prefixlong", "prefixlonk"]
    arr = np.array(names, dtype=object)
    codes, lens = _code_matrix(arr)
    ai = np.random.RandomState(1).randint(0, len(names), 800)
    bi = np.random.RandomState(2).randint(0, len(names), 800)
    mine = jaro_winkler_pairs(codes, lens, ai, bi)
    df = pd.DataFrame({"a": [names[i] for i in ai], "b": [names[i] for i in bi]})
    want = (
        duckdb.connect()
        .execute("SELECT jaro_winkler_similarity(a, b) FROM df")
        .df()
        .iloc[:, 0]
        .to_numpy()
    )
    assert np.max(np.abs(mine - want)) < 1e-12


def test_jw_block_pairs_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.fuzzy import jw_block_pairs

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "name": ["martha", "marhta", "jones", "janes", "zzzzz"],
            "blk": ["a", "a", "a", "a", "b"],
        }
    )
    out = jw_block_pairs(
        ray.data.from_arrow(t), "id", "name", "blk", min_sim=0.85
    ).to_pandas()
    got = {(r["u"], r["v"]): round(r["jw"], 4) for _, r in out.iterrows()}
    assert (1, 2) in got and got[(1, 2)] == round(0.9611111111111111, 4)
    assert (3, 4) in got
    assert all(u != 5 and v != 5 for u, v in got)


def test_damerau_levenshtein_matches_duckdb():
    """damerau_levenshtein_pairs implements the TRUE (Lowrance-Wagner)
    variant DuckDB computes — DL('CA','ABC')=2 where restricted OSA says
    3 — fuzz-pinned over a transposition-dense alphabet plus the classic
    discriminating cases, across the chunked-cube path."""
    import duckdb
    import numpy as np
    import pandas as pd

    from opentapioca_ray.stages.fuzzy import (
        _code_matrix,
        damerau_levenshtein_pairs,
    )

    rng = np.random.default_rng(11)
    names = [
        "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        for _ in range(300)
    ] + ["CA", "ABC", "ab", "ba", "abcdef", "abcfed", "a cat", "an act",
         "xaby", "xbay", "", "x",
         "Supplier#000000001", "Supplier#000000010"]
    arr = np.array(names, dtype=object)
    codes, lens = _code_matrix(arr)
    ai = rng.integers(0, len(arr), 2000)
    bi = rng.integers(0, len(arr), 2000)
    mine = damerau_levenshtein_pairs(codes, lens, ai, bi, chunk=333)
    df = pd.DataFrame({"a": arr[ai], "b": arr[bi]})
    ref = (
        duckdb.connect()
        .execute("SELECT damerau_levenshtein(a, b) FROM df")
        .fetchnumpy()["damerau_levenshtein(a, b)"]
    )
    assert (mine == ref.astype(np.int64)).all()
    # the transposition actually discriminates: digit swap is DL 1, lev 2
    from opentapioca_ray.stages.fuzzy import levenshtein_pairs

    i1 = names.index("Supplier#000000001")
    i2 = names.index("Supplier#000000010")
    one = np.array([i1]); two = np.array([i2])
    assert damerau_levenshtein_pairs(codes, lens, one, two)[0] == 1
    assert levenshtein_pairs(codes, lens, one, two)[0] == 2


def test_dl_supplier_pairs_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["dl_supplier_pairs"]("/root/testdata/sf0.01")
    import ray.data as rd

    df = out.to_pandas() if isinstance(out, rd.Dataset) else out
    assert list(sorted(df.columns)) == ["dl", "u", "v"]
    assert (df["dl"] <= 2).all()
    assert (df["u"] < df["v"]).all()


def test_monge_elkan_identical_and_directional(ray_session):
    import ray.data as rd

    from opentapioca_ray.stages.fuzzy import (
        _code_matrix,
        jaro_winkler_pairs,
        monge_elkan_scores,
    )

    pairs = rd.from_items(
        [
            # identical token sets (order ignored) -> exactly 1.0 both ways
            {"u": 1, "v": 2, "nm_u": "large widget", "nm_v": "widget large"},
            # subset: every token of u is in v -> me_uv = 1.0; v->u < 1.0
            {"u": 3, "v": 4, "nm_u": "large", "nm_v": "large widget"},
        ]
    )
    out = (
        monge_elkan_scores(pairs).to_pandas().set_index("u").sort_index()
    )
    assert out.loc[1, "me_uv_u"] == 1_000_000
    assert out.loc[1, "me_vu_u"] == 1_000_000
    assert out.loc[1, "me_u"] == 1_000_000
    assert out.loc[3, "me_uv_u"] == 1_000_000
    # v->u direction: mean of {jw(large,large)=1, jw(widget,large)}
    codes, lens = _code_matrix(
        __import__("numpy").array(["large", "widget"], dtype=object)
    )
    import numpy as np

    jw = jaro_winkler_pairs(codes, lens, np.array([1]), np.array([0]))[0]
    expect = (1_000_000 + int(np.floor(jw * 1_000_000 + 0.5))) // 2
    assert out.loc[3, "me_vu_u"] == expect
    assert out.loc[3, "me_u"] == (1_000_000 + expect) // 2


def test_monge_elkan_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["monge_elkan"]("/root/testdata/sf0.001")
    import ray.data as rd

    df = out.to_pandas() if isinstance(out, rd.Dataset) else out
    assert sorted(df.columns) == ["me_u", "me_uv_u", "me_vu_u", "u", "v"]
    assert len(df) > 100
    assert (df["u"] < df["v"]).all()
    assert df["me_u"].between(0, 1_000_000).all()
    # symmetric score is the floor-mean of the two directions
    assert (
        df["me_u"] == (df["me_uv_u"] + df["me_vu_u"]) // 2
    ).all()


def test_soft_tfidf_identical_names_score_full(ray_session):
    import ray
    import ray.data as rd

    from opentapioca_ray.stages.fuzzy import soft_tfidf_scores

    idf_ref = ray.put({"large": 2000, "widget": 1000, "bolt": 3000})
    pairs = rd.from_items(
        [
            # identical token sets -> cosine of identical vectors at jw=1
            {"u": 1, "v": 2, "nm_u": "large widget", "nm_v": "widget large"},
            # disjoint, no close tokens -> 0
            {"u": 3, "v": 4, "nm_u": "widget", "nm_v": "bolt"},
        ]
    )
    out = (
        soft_tfidf_scores(pairs, idf_ref)
        .to_pandas()
        .set_index("u")["soft_uv_e6"]
    )
    assert out.loc[1] == 1_000_000
    assert out.loc[3] == 0


def test_soft_tfidf_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["soft_tfidf"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert sorted(df.columns) == ["soft_uv_e6", "u", "v"]
    assert len(df) > 100
    assert df["soft_uv_e6"].between(0, 1_000_001).all()
    # some window pairs share no close token (score 0), some do
    assert (df["soft_uv_e6"] == 0).any()
    assert (df["soft_uv_e6"] > 0).any()


def test_bloom_dice_identity_and_disjoint(ray_session):
    import ray.data as rd

    from opentapioca_ray.stages.fuzzy import bloom_dice_scores

    pairs = rd.from_items(
        [
            {"u": 1, "v": 2, "nm_u": "large widget", "nm_v": "large widget"},
            {"u": 3, "v": 4, "nm_u": "abcd", "nm_v": "wxyz"},
            {"u": 5, "v": 6, "nm_u": "large widget", "nm_v": "large bolt"},
        ]
    )
    out = (
        bloom_dice_scores(pairs).to_pandas().set_index("u")["dice_e6"]
    )
    assert out.loc[1] == 1_000_000  # identical encodings
    assert 0 <= out.loc[3] < 400_000  # disjoint grams: only md5 collisions
    assert 0 < out.loc[5] < 1_000_000  # shared prefix: partial overlap


def test_pprl_dice_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    df = entry.queries()["pprl_dice"]("/root/testdata/sf0.001").to_pandas()
    assert sorted(df.columns) == ["dice_e6", "u", "v"]
    assert len(df) > 100
    assert df["dice_e6"].between(0, 1_000_000).all()
