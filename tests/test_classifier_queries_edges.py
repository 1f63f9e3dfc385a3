"""Degenerate-corpus edges for the round-5 classifier-family queries:
empty documents table and blank/None texts must flow through the tagger,
design-matrix and micro-F1 paths without errors (empty conventions:
P=1/R=1 when nothing is predicted/gold — reference classifier.py:221-260).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    base = tmp_path_factory.mktemp("edge_corpora")
    empty = base / "empty"
    empty.mkdir()
    pq.write_table(src.slice(0, 0), str(empty / "documents.parquet"))
    blank = base / "blank"
    blank.mkdir()
    df = src.slice(0, 3).to_pandas()
    df["text"] = ["", " ", None][: len(df)]
    pq.write_table(
        pa.Table.from_pandas(df, schema=src.schema, preserve_index=False),
        str(blank / "documents.parquet"),
    )
    return str(empty), str(blank)


@pytest.mark.parametrize("which", [0, 1])
def test_classifier_queries_on_degenerate_corpora(ray_session, corpora, which):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sf = corpora[which]
    assert qs["design_matrix_stats"](sf).count() == 0
    assert qs["tag_mention_counts"](sf).count() == 0
    f1 = qs["nif_micro_f1"](sf).to_pylist()[0]
    assert f1["n_pred"] == 0 and f1["n_gold"] == 0 and f1["n_match"] == 0
    # empty conventions: precision = recall = 1, f1 = 1
    assert f1["precision_e6"] == 1_000_000
    assert f1["recall_e6"] == 1_000_000
    assert f1["f1_e6"] == 1_000_000
