import numpy as np
import pytest


def corpus_with_dups():
    base = " ".join(f"tok{i} filler{i % 7} word{i % 13}" for i in range(80))
    docs = []
    # cluster A: 0,1,2 near-identical
    docs.append({"doc_id": 0, "text": base})
    docs.append({"doc_id": 1, "text": base + " trailing marker one"})
    docs.append({"doc_id": 2, "text": "leading bit " + base})
    # cluster B: 10, 11 exact dups
    other = " ".join(f"alpha{i} beta{i % 5}" for i in range(70))
    docs.append({"doc_id": 10, "text": other})
    docs.append({"doc_id": 11, "text": other})
    # singletons
    docs.append({"doc_id": 20, "text": " ".join(f"unique{i}" for i in range(90))})
    docs.append({"doc_id": 21, "text": " ".join(f"solo{i}" for i in range(90))})
    return docs


def test_exact_dedup(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import exact_dedup

    docs = corpus_with_dups()
    ds = ray.data.from_items(docs)
    out = exact_dedup(ds, id_column="doc_id").take_all()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[10] == 2
    assert by_keep[0] == 1
    assert len(out) == len(docs) - 1  # 10 and 11 merge


def test_minhash_dedup_clusters(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import minhash_dedup

    ds = ray.data.from_items(corpus_with_dups())
    comp = {r["node"]: r["component"] for r in minhash_dedup(ds, threshold=0.5).take_all()}
    assert comp.get(0) == comp.get(1) == comp.get(2) == 0
    assert comp.get(10) == comp.get(11) == 10
    assert 20 not in comp or comp[20] == 20
    assert comp.get(20, 20) != comp.get(0, 0)


def test_simhash_dedup(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import simhash_dedup

    ds = ray.data.from_items(corpus_with_dups())
    comp = {r["node"]: r["component"] for r in simhash_dedup(ds).take_all()}
    # exact dups always cluster
    assert comp.get(10) == comp.get(11) == 10


def test_compact_by_key(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import compact_by_key

    ds = ray.data.from_items(
        [
            {"id": "Q1", "revid": 1, "label": "old"},
            {"id": "Q1", "revid": 5, "label": "new"},
            {"id": "Q2", "revid": 3, "label": "only"},
        ]
    )
    rows = {r["id"]: r for r in compact_by_key(ds).take_all()}
    assert rows["Q1"]["label"] == "new"
    assert rows["Q2"]["revid"] == 3


def test_embedding_dedup(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import embedding_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    rows = [
        {"vec_id": 0, "embedding": list(base)},
        {"vec_id": 1, "embedding": list(base + 0.001 * rng.randn(8))},
        {"vec_id": 2, "embedding": list(rng.randn(8))},
        {"vec_id": 3, "embedding": list(rng.randn(8))},
    ]
    ds = ray.data.from_items(rows)
    comp = {
        r["node"]: r["component"]
        for r in embedding_dedup(ds, threshold=0.99).take_all()
    }
    assert comp.get(0) == comp.get(1) == 0
    assert comp.get(2, 2) == 2


def test_ngram_jaccard_pairs_and_dedup(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import ngram_jaccard_dedup, ngram_jaccard_pairs

    ds = ray.data.from_items(corpus_with_dups())
    pairs = ngram_jaccard_pairs(ds, k=3, threshold=0.5).take_all()
    got = {(r["u"], r["v"]): r["jaccard"] for r in pairs}
    # exact dups: jaccard exactly 1.0
    assert got[(10, 11)] == 1.0
    # near dups in cluster A all pass the 0.5 bar
    assert got[(0, 1)] > 0.9 and got[(0, 2)] > 0.9 and got[(1, 2)] > 0.9
    # singletons never appear
    assert not any(20 in p or 21 in p for p in got)

    comp = {r["node"]: r["component"] for r in ngram_jaccard_dedup(ds, threshold=0.5).take_all()}
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[10] == comp[11] == 10


def test_ngram_jaccard_max_df_drops_stop_grams(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the same 3-gram preamble; max_df=2 prunes it so only
    # the genuinely-similar pair (sharing rarer grams) survives
    docs = [
        {"doc_id": i, "text": "common stop gram " + " ".join(f"w{i}x{j}" for j in range(30))}
        for i in range(5)
    ]
    docs.append({"doc_id": 100, "text": docs[0]["text"]})
    ds = ray.data.from_items(docs)
    pairs = ngram_jaccard_pairs(ds, k=3, threshold=0.5, max_df=2).take_all()
    assert {(r["u"], r["v"]) for r in pairs} == {(0, 100)}


def test_simhash_md5_pairs_equals_all_pairs(ray_session):
    """The banded pipeline must EQUAL the brute-force all-pairs answer
    (pigeonhole recall = 1 at hamming <= 3) — the property the SQL oracle
    relies on — and the md5-derived simhash must match a straightforward
    reimplementation."""
    import hashlib

    import ray.data

    from opentapioca_ray.functions.text import tokenize
    from opentapioca_ray.stages.dedup import simhash_md5_pairs

    docs = corpus_with_dups()
    ds = ray.data.from_items(docs)
    got = {
        (r["u"], r["v"]): r["hamming"]
        for r in simhash_md5_pairs(ds, max_hamming=3).take_all()
    }

    def ref_simhash(text):
        toks = tokenize((text or "")[:10000])
        if not toks:
            return None
        if len(toks) < 3:
            grams = {" ".join(toks)}
        else:
            grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        votes = [0] * 64
        for g in grams:
            h = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(64) if votes[i] > 0)

    sims = {d["doc_id"]: ref_simhash(d["text"]) for d in docs}
    want = {}
    ids = sorted(sims)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            if sims[u] is None or sims[v] is None:
                continue
            ham = bin(sims[u] ^ sims[v]).count("1")
            if ham <= 3:
                want[(u, v)] = ham
    assert got == want
    assert (10, 11) in got and got[(10, 11)] == 0  # exact dups


def test_simhash_md5_pairs_edge_cases(ray_session):
    """Empty docs join no pairs; short docs (< k tokens) collapse to the
    whole-doc gram, so two identical 2-token docs pair at hamming 0 —
    matching the SQL oracle's CASE len(arr) < 3 branch."""
    import ray.data

    from opentapioca_ray.stages.dedup import simhash_md5_pairs

    docs = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "two tokens"},
        {"doc_id": 4, "text": "two tokens"},
        {"doc_id": 5, "text": "different pair"},
    ]
    ds = ray.data.from_items(docs)
    got = {(r["u"], r["v"]): r["hamming"] for r in simhash_md5_pairs(ds).take_all()}
    assert got.get((3, 4)) == 0
    assert all(1 not in p and 2 not in p for p in got)


def test_gram_doc_rows_matches_gram_table(ray_session):
    import pyarrow as pa

    from opentapioca_ray.stages.dedup import gram_doc_rows, gram_table

    docs = corpus_with_dups() + [
        {"doc_id": 30, "text": ""},
        {"doc_id": 31, "text": "two words"},
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], type=pa.int64()),
            "text": pa.array([d["text"] for d in docs]),
        }
    )
    lists = gram_table(batch)
    rows = gram_doc_rows(batch)
    # same (doc, gram) multiset, and n_grams equals the doc's list length
    want = {}
    for did, gs in zip(lists.column("doc_id").to_pylist(), lists.column("grams").to_pylist()):
        want[did] = sorted(gs)
    got = {}
    for did, g, n in zip(
        rows.column("doc_id").to_pylist(),
        rows.column("gram").to_pylist(),
        rows.column("n_grams").to_pylist(),
    ):
        got.setdefault(did, []).append(g)
        assert n == len(want[did])
    assert {k: sorted(v) for k, v in got.items()} == want
    assert 30 not in got  # empty doc yields no grams
    assert got[31] == ["two words"]  # short doc collapses to one gram


def test_dup_components_query(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in corpus_with_dups()], type=pa.int64()),
                "text": pa.array([d["text"] for d in corpus_with_dups()]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["dup_components"](str(tmp_path)).take_all()
    comp = {r["doc_id"]: r["component"] for r in out}
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[10] == comp[11] == 10
    assert 20 not in comp  # singletons have no dup edges


def test_decontaminate_query(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    base = " ".join(f"bench{i} tok{i % 3}" for i in range(40))
    docs = [
        {"doc_id": 0, "text": base},                      # benchmark (0 % 97 == 0)
        {"doc_id": 1, "text": base + " extra suffix"},     # heavy overlap
        {"doc_id": 2, "text": " ".join(f"clean{i}" for i in range(40))},
        {"doc_id": 97, "text": "more bench material only"},  # benchmark
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], type=pa.int64()),
                "text": pa.array([d["text"] for d in docs]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["decontaminate"](str(tmp_path)).take_all()
    shared = {r["doc_id"]: r["n_shared"] for r in out}
    assert 0 not in shared and 97 not in shared  # benchmark docs excluded
    assert shared[1] >= 30  # near-copy of a benchmark doc is flagged hard
    assert 2 not in shared  # clean doc shares nothing


def test_duplicated_gram_stats(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import duplicated_gram_stats

    rows = [
        # docs 1/2 share the gram "a b c"; doc 1 also has a unique tail
        {"doc_id": 1, "text": "a b c d e"},   # grams: "a b c","b c d","c d e"
        {"doc_id": 2, "text": "a b c"},       # gram: "a b c" (all duplicated)
        {"doc_id": 3, "text": "x y"},         # short: whole-doc gram, unique
        {"doc_id": 4, "text": ""},            # empty: dropped
    ]
    out = duplicated_gram_stats(
        ray.data.from_items(rows).repartition(3), "doc_id", "text", k=3
    ).to_pandas()
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_frac_e6"])
        for _, r in out.iterrows()
    }
    assert got == {
        1: (3, 1, 333_333),
        2: (1, 1, 1_000_000),
        3: (1, 0, 0),
    }
