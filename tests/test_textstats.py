import pyarrow as pa

from opentapioca_ray.functions.textstats import (
    add_fingerprint,
    add_language_column,
    add_token_counts,
    count_tokens,
    detect_language,
    fingerprint,
    quality_stats,
)


def test_detect_language():
    assert detect_language("the cat sat on the mat and it was happy") == "en"
    assert detect_language("le chat est dans la maison et il est content") == "fr"
    assert detect_language("der Hund ist nicht mit der Katze") == "de"
    assert detect_language("el perro y el gato en la casa") == "es"
    assert detect_language("xyzzy qwerty") == "und"


def test_quality_stats_columns():
    batch = pa.table({"text": ["the quick brown fox is over the lazy dog", ""]})
    out = quality_stats(batch)
    assert out.num_rows == 2
    row = out.to_pylist()[0]
    assert row["n_tokens"] == 9
    assert 0 <= row["quality_score"] <= 1
    assert row["stopword_ratio"] > 0
    empty = out.to_pylist()[1]
    assert empty["n_tokens"] == 0


def test_token_counts():
    assert count_tokens("hello, world!") == 4  # hello , world !
    batch = pa.table({"text": ["a b c", ""]})
    out = add_token_counts(batch)
    assert out.to_pylist()[0]["ws_tokens"] == 3
    assert out.to_pylist()[1]["ws_tokens"] == 0


def test_fingerprint_whitespace_insensitive():
    assert fingerprint("a  b\t c") == fingerprint("a b c")
    assert fingerprint("a b c") != fingerprint("a b d")
    batch = pa.table({"text": ["a b", "a   b"]})
    out = add_fingerprint(batch)
    vals = out.column("fingerprint").to_pylist()
    assert vals[0] == vals[1]


def test_language_column():
    batch = pa.table({"text": ["the cat and the dog in the house"]})
    assert add_language_column(batch).column("lang_id").to_pylist() == ["en"]


def test_repetition_stats_basic():
    import pyarrow as pa

    from opentapioca_ray.functions.textstats import repetition_stats

    out = repetition_stats(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a b a b a b",      # bigrams: "a b"x3, "b a"x2 -> top 3
                    "x y z",            # all unique bigrams -> top 1
                    "w",                # no bigrams
                    "",                 # empty
                ],
            }
        )
    ).to_pandas()
    assert out["n_bigrams"].tolist() == [5, 2, 0, 0]
    assert out["top_bigram_count"].tolist() == [3, 1, 0, 0]
    # trigrams of doc1: "a b a"x2, "b a b"x2 -> 4 duplicated instances
    assert out["dup_trigram_tokens"].tolist() == [4, 0, 0, 0]


def test_repetition_stats_no_cross_doc_grams():
    import pyarrow as pa

    from opentapioca_ray.functions.textstats import repetition_stats

    # "q z" would be a bigram only if docs leaked into each other
    out = repetition_stats(
        pa.table({"doc_id": [1, 2], "text": ["p q", "z w"]})
    ).to_pandas()
    assert out["top_bigram_count"].tolist() == [1, 1]


def test_lexical_diversity(ray_session):
    import pyarrow as pa

    from opentapioca_ray.functions.textstats import lexical_diversity

    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b a  c a", "", "x x"],
        }
    )
    out = lexical_diversity(batch, "text").to_pandas().set_index("doc_id")
    # doc 2 has no tokens -> dropped
    assert sorted(out.index) == [1, 3]
    assert out.loc[1, "n_tokens"] == 5
    assert out.loc[1, "n_unique"] == 3
    assert out.loc[1, "simpson_num"] == 3 * 2  # 'a' appears 3 times
    assert out.loc[3, "n_tokens"] == 2
    assert out.loc[3, "n_unique"] == 1
    assert out.loc[3, "simpson_num"] == 2
