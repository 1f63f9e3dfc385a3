"""BOW model goldens (reference test_languagemodel.py:9-17)."""

import pyarrow as pa
import pytest

from opentapioca_ray.state.bow import (
    BOWLanguageModel,
    bow_from_dataset,
    partial_word_counts,
)


def make_golden_bow():
    bow = BOWLanguageModel()
    bow.ingest(["the", "invited", "speaker"])
    bow.ingest(["the", "speaker", "of", "the", "house"])
    return bow


def test_ingest_counts():
    bow = make_golden_bow()
    assert bow.word_count["speaker"] == 2
    assert bow.word_count["house"] == 1
    assert bow.word_count["the"] == 3
    assert bow.total_count == 8


def test_log_likelihood_golden():
    bow = make_golden_bow()
    ll = bow.log_likelihood("dear speaker")
    assert -4.2 < ll < -4.1


def test_ingest_phrases_dedups():
    bow = BOWLanguageModel()
    bow.ingest_phrases(["the the the house", "house rules"])
    assert bow.word_count["the"] == 1
    assert bow.word_count["house"] == 1


def test_save_load_threshold(tmp_path):
    bow = make_golden_bow()
    f = str(tmp_path / "bow.json")
    bow.save(f)
    loaded = BOWLanguageModel()
    loaded.load(f)
    # words with count < 2 dropped at save (reference languagemodel.py:86-87)
    assert "house" not in loaded.word_count
    assert loaded.word_count["speaker"] == 2
    assert loaded.total_count == 8


def test_partial_word_counts_batch():
    batch = pa.table({"text": ["the invited speaker", "the speaker of the house"]})
    out = partial_word_counts(batch, "text")
    counts = dict(zip(out["word"].to_pylist(), out["count"].to_pylist()))
    assert counts["speaker"] == 2
    assert counts["the"] == 2  # deduped per row


def test_bow_from_dataset_matches_serial(ray_session):
    import ray.data

    texts = ["the invited speaker", "the speaker of the house"]
    ds = ray.data.from_items([{"text": t} for t in texts])
    bow = bow_from_dataset(ds, "text", threshold=1)
    serial = BOWLanguageModel()
    for t in texts:
        serial.ingest_phrases([t])
    assert bow.word_count == serial.word_count
    assert bow.total_count == serial.total_count
    assert abs(bow.log_likelihood("dear speaker") - serial.log_likelihood("dear speaker")) < 1e-12
