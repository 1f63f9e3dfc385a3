import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opentapioca_ray.stages.selection import (
    group_top_k,
    hash_sample,
    hash_sample_batch,
    rate_to_hex_threshold,
    stratified_sample,
)


def _df(n=400, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "fr", "de"], size=n),
            "n_chars": rng.integers(1, 1000, size=n).astype(np.int64),
        }
    )


def test_rate_to_hex_threshold_bounds():
    assert rate_to_hex_threshold(0.0) == "00000000"
    assert rate_to_hex_threshold(1.0) == "g"
    assert "ffffffff" < rate_to_hex_threshold(1.0)  # keep-all really keeps all
    assert rate_to_hex_threshold(0.5) == format(1 << 31, "08x")


def test_hash_sample_batch_matches_reference_filter():
    df = _df()
    batch = pa.Table.from_pandas(df, preserve_index=False)
    out = hash_sample_batch(batch, "doc_id", 0.25)
    thr = rate_to_hex_threshold(0.25)
    expected = {
        i
        for i in df.doc_id
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < thr
    }
    assert set(out.column("doc_id").to_pylist()) == expected
    # deterministic + rate in the right ballpark
    assert 0.1 < out.num_rows / batch.num_rows < 0.4


def test_hash_sample_dataset_partition_invariant(ray_session):
    import ray.data

    df = _df()
    a = hash_sample(ray.data.from_pandas(df), "doc_id", 0.3)
    b = hash_sample(
        ray.data.from_pandas(df).repartition(7), "doc_id", 0.3
    )
    ids_a = sorted(r["doc_id"] for r in a.take_all())
    ids_b = sorted(r["doc_id"] for r in b.take_all())
    assert ids_a == ids_b and len(ids_a) > 0


def test_stratified_sample_rates(ray_session):
    import ray.data

    df = _df(900)
    out = stratified_sample(
        ray.data.from_pandas(df), "doc_id", "lang", {"en": 1.0, "fr": 0.0}
    ).to_pandas()
    n_en = (df.lang == "en").sum()
    assert (out.lang == "en").sum() == n_en  # rate 1.0 keeps every row
    assert (out.lang == "fr").sum() == 0  # rate 0.0 drops every row
    assert (out.lang == "de").sum() == 0  # default_rate 0.0


def test_group_top_k_matches_pandas(ray_session):
    import ray.data

    df = _df(600)
    out = group_top_k(
        ray.data.from_pandas(df), "lang", "n_chars", 5, "doc_id"
    ).to_pandas()
    expected = (
        df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        .groupby("lang")
        .head(5)
    )
    got = set(map(tuple, out[["lang", "doc_id"]].itertuples(index=False)))
    exp = set(map(tuple, expected[["lang", "doc_id"]].itertuples(index=False)))
    assert got == exp
    assert len(out) == 15


def test_group_top_k_small_groups(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "v": [1, 2, 3], "id": [0, 1, 2]}
    )
    out = group_top_k(ray.data.from_pandas(df), "g", "v", 5, "id").to_pandas()
    assert len(out) == 3  # k larger than any group keeps everything


def test_global_top_k(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from opentapioca_ray.stages.selection import global_top_k

    # 5000 rows over many blocks; ties on value broken by ascending id
    n = 5000
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "score": rng.randint(0, 400, n)}
    )
    ds = ray.data.from_pandas([d for _, d in df.groupby(np.arange(n) % 16)])
    out = global_top_k(ds, "score", 7, "id").take_all()
    assert len(out) == 7
    want = df.sort_values(["score", "id"], ascending=[False, True]).head(7)
    assert {(r["id"], r["score"]) for r in out} == set(
        zip(want["id"], want["score"])
    )
    # ascending variant
    out_asc = global_top_k(ds, "score", 3, "id", descending=False).take_all()
    want_asc = df.sort_values(["score", "id"]).head(3)
    assert {(r["id"], r["score"]) for r in out_asc} == set(
        zip(want_asc["id"], want_asc["score"])
    )


def test_priority_sample_deterministic(ray_session):
    import ray.data

    from opentapioca_ray.stages.selection import priority_sample

    items = [{"doc_id": i, "lang": "en"} for i in range(500)]
    ds = ray.data.from_items(items)
    a = sorted(r["doc_id"] for r in priority_sample(ds, "doc_id", 50, ["doc_id", "lang"]).take_all())
    # same sample regardless of block structure
    ds2 = ray.data.from_items(items).repartition(7)
    b = sorted(r["doc_id"] for r in priority_sample(ds2, "doc_id", 50, ["doc_id", "lang"]).take_all())
    assert a == b
    assert len(a) == 50
    # matches the SQL-side md5 priority definition
    import hashlib

    def prio(i):
        return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")

    want = sorted(sorted(range(500), key=lambda i: (prio(i), i))[:50])
    assert a == want


def test_prefix_scan_select_budget_cutoff(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.selection import prefix_scan_select

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "score": [50, 40, 40, 30, 20],
            "cost": [10, 10, 10, 10, 10],
        }
    )
    out = prefix_scan_select(
        ray.data.from_arrow(t).repartition(3),
        order_columns=["score", "id"],
        descending=[True, False],
        value_column="cost",
        budget=25,
    ).to_pandas()
    # greedy in (score desc, id asc) order: ids 1 (10), 2 (20); 3 would hit 30
    assert sorted(out["id"].tolist()) == [1, 2]


def test_prefix_scan_select_exact_boundary_and_zero_budget(ray_session):
    import pyarrow as pa
    import ray.data

    from opentapioca_ray.stages.selection import prefix_scan_select

    t = pa.table({"id": [1, 2, 3], "cost": [5, 5, 5]})
    ds = ray.data.from_arrow(t).repartition(2)
    # running total <= budget keeps the row landing exactly ON the budget
    full = prefix_scan_select(ds, ["id"], [False], "cost", 15).to_pandas()
    assert sorted(full["id"].tolist()) == [1, 2, 3]
    none = prefix_scan_select(ds, ["id"], [False], "cost", 0).to_pandas()
    assert len(none) == 0


def test_corpus_prep_composition_invariants(ray_session):
    """corpus_prep = dedup -> decontaminate -> budget prefix; check the
    three stage invariants directly on the sf0.001 output."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["corpus_prep"]("/root/testdata/sf0.001").take_all()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    # no benchmark-partition docs survive
    assert all(i % 97 != 0 for i in ids)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    # every survivor is its text group's min-id representative
    reps = {
        r[0]
        for r in con.execute(
            "SELECT min(doc_id) FROM documents GROUP BY text"
        ).fetchall()
    }
    assert set(ids) <= reps
    # budget respected: selected tokens <= survivors' total // 4 and the
    # selection is the greedy best-quality prefix (non-empty at sf0.001)
    assert len(out) > 0
    assert sum(r["bpe_tokens"] for r in out) <= (
        con.execute(
            "SELECT sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) "
            "FROM documents"
        ).fetchone()[0]
    )


def test_temperature_mix_query(ray_session):
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry.queries()["temperature_mix"]("/root/testdata/sf0.001").to_pandas()
    assert sorted(out.columns) == ["n_tokens", "p_ppm", "source", "t_u"]
    assert len(out) > 1
    # probabilities sum to <= 1e6 (floor division) and within one source of it
    assert 1_000_000 - len(out) <= out["p_ppm"].sum() <= 1_000_000
    # temperature flattens: every source's share sits between uniform and
    # proportional only on the heavy side; at minimum the ordering is
    # preserved while ratios compress
    o = out.sort_values("n_tokens").reset_index(drop=True)
    assert (np.diff(o["t_u"]) >= 0).all()
    big, small = o.iloc[-1], o.iloc[0]
    if small["n_tokens"] > 0 and big["n_tokens"] > small["n_tokens"]:
        ratio_mass = big["n_tokens"] / small["n_tokens"]
        ratio_prob = big["p_ppm"] / max(small["p_ppm"], 1)
        assert ratio_prob < ratio_mass  # compression is the point
