"""Order-aware gram novelty: earliest-holder semantics."""

import pandas as pd


def test_gram_novelty_order_awareness(ray_session):
    import ray.data

    from opentapioca_ray.stages.dedup import gram_novelty_stats

    rows = [
        # doc 1: all grams first-seen here -> fully novel
        {"doc_id": 1, "text": "a b c d e"},
        # doc 2: identical text -> every gram seen before -> novelty 0
        {"doc_id": 2, "text": "a b c d e"},
        # doc 3: half overlap: grams {a b c, b c d, c d e, d e f, e f g}
        # of which the first three were seen in doc 1
        {"doc_id": 3, "text": "a b c d e f g"},
        # doc 4: short doc -> single whole-doc gram, unseen
        {"doc_id": 4, "text": "zz qq"},
    ]
    out = (
        gram_novelty_stats(ray.data.from_items(rows).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_seen_before"] == 0
    assert out.loc[1, "novelty_e6"] == 1_000_000
    assert out.loc[2, "n_seen_before"] == out.loc[2, "n_grams"] == 3
    assert out.loc[2, "novelty_e6"] == 0
    assert out.loc[3, "n_grams"] == 5
    assert out.loc[3, "n_seen_before"] == 3
    assert out.loc[3, "novelty_e6"] == 400_000
    assert out.loc[4, "n_grams"] == 1
    assert out.loc[4, "novelty_e6"] == 1_000_000
