"""Document chunking: boundaries, overlap, empty/short docs, unicode."""

import pyarrow as pa
import pytest


def _run(rows, **kw):
    import ray.data

    from opentapioca_ray.stages.chunking import chunk_documents

    ds = ray.data.from_arrow(pa.table(rows))
    out = chunk_documents(ds, "doc_id", "text", **kw).to_pandas()
    if out.empty:
        return out
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def test_chunk_boundaries_and_overlap(ray_session):
    text = "abcdefghij"  # len 10
    out = _run({"doc_id": [1], "text": [text]}, size=4, stride=3)
    # starts 0,3,6,9 (every start < 10)
    assert out["chunk_idx"].tolist() == [0, 1, 2, 3]
    assert out["chunk_text"].tolist() == ["abcd", "defg", "ghij", "j"]


def test_chunk_exact_multiple(ray_session):
    out = _run({"doc_id": [1], "text": ["abcdef"]}, size=3, stride=3)
    assert out["chunk_text"].tolist() == ["abc", "def"]


def test_empty_and_short_docs(ray_session):
    out = _run(
        {"doc_id": [1, 2, 3], "text": ["", "ab", "abcd"]}, size=3, stride=3
    )
    # empty doc yields no chunks; short docs yield one
    assert out["doc_id"].tolist() == [2, 3, 3]
    assert out["chunk_text"].tolist() == ["ab", "abc", "d"]


def test_unicode_codepoint_offsets(ray_session):
    out = _run({"doc_id": [1], "text": ["héllo wörld"]}, size=6, stride=6)
    assert out["chunk_text"].tolist() == ["héllo ", "wörld"]


def test_empty_dataset(ray_session):
    out = _run({"doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string())}, size=3, stride=3)
    assert len(out) == 0


def test_bad_stride_raises(ray_session):
    import ray.data

    from opentapioca_ray.stages.chunking import chunk_documents

    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, "doc_id", "text", size=3, stride=0)


def test_pack_sequences_greedy(ray_session):
    import ray.data

    from opentapioca_ray.stages.chunking import pack_sequences

    # token counts: 3, 4, 2, 5, 9, 1 with budget 8 in one partition
    texts = ["a a a", "b b b b", "c c", "d d d d d",
             "e e e e e e e e e", "f"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(6)), "text": texts})
    )
    out = (
        pack_sequences(ds, budget=8, part_size=100)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # greedy: [3,4]=7 | [2,5]=7 | [9] alone (oversized) | [1]
    assert out["seq"].tolist() == [0, 0, 1, 1, 2, 3]
    assert out["n_tok"].tolist() == [3, 4, 2, 5, 9, 1]


def test_pack_sequences_partition_boundaries(ray_session):
    import ray.data

    from opentapioca_ray.stages.chunking import pack_sequences

    # ids 0,1 in part 0; ids 2,3 in part 1 -> seq resets per part
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2, 3], "text": ["x"] * 4})
    )
    out = (
        pack_sequences(ds, budget=1, part_size=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["part"].tolist() == [0, 0, 1, 1]
    assert out["seq"].tolist() == [0, 1, 0, 1]
