"""S2/S4: event-stream micro-batching + retry/backoff fetch semantics
(reference streamreader.py:10-70, apireaderbase.py:20-44)."""

import json

import pytest

from opentapioca_ray.sources.stream import (
    EventStreamReader,
    FetchError,
    RetryingFetcher,
    filter_event,
    micro_batches_to_dataset,
    tail_jsonl_events,
)


def _event(title, wiki="wikidatawiki", namespace=0):
    return {"wiki": wiki, "namespace": namespace, "title": title}


def test_filter_event_reference_semantics():
    assert filter_event(_event("Q42")) == "Q42"
    assert filter_event(_event("Q42", wiki="enwiki")) is None
    assert filter_event(_event("Q42", namespace=4)) is None
    assert filter_event(_event("Talk:Q42")) is None
    assert filter_event(_event("Q0")) is None  # ids start at 1
    assert filter_event({"wiki": "wikidatawiki"}) is None


def test_retrying_fetcher_backoff_then_success():
    calls = []
    sleeps = []

    def flaky(ids):
        calls.append(list(ids))
        if len(calls) < 3:
            raise ConnectionError("boom")
        return [{"id": i} for i in ids] + [{"id": "QX", "missing": ""}]

    f = RetryingFetcher(flaky, retries=5, delay=2.0, sleep=sleeps.append)
    out = f.fetch_items(["Q1", "Q2"])
    # two failures -> linear backoff (1+attempt)*delay, missing dropped
    assert sleeps == [2.0, 4.0]
    assert len(calls) == 3
    assert [o["id"] for o in out] == ["Q1", "Q2"]


def test_retrying_fetcher_raises_after_exhaustion():
    sleeps = []

    def dead(ids):
        raise ConnectionError("down")

    f = RetryingFetcher(dead, retries=5, delay=1.0, sleep=sleeps.append)
    with pytest.raises(FetchError):
        f.fetch_items(["Q1"])
    assert sleeps == [1.0, 2.0, 3.0, 4.0]  # 5 attempts, 4 backoffs


def test_retrying_fetcher_empty_batch_no_fetch():
    def never(ids):
        raise AssertionError("must not be called")

    assert RetryingFetcher(never).fetch_items([]) == []


def test_stream_reader_micro_batches_of_50():
    events = [_event(f"Q{i}") for i in range(1, 121)]
    events.insert(10, _event("Q5", wiki="enwiki"))  # filtered out
    fetched = []

    def fetch(ids):
        fetched.append(list(ids))
        return [{"id": i} for i in ids]

    reader = EventStreamReader(events, RetryingFetcher(fetch), batch_size=50)
    batches = list(reader)
    # 120 ids -> 50 + 50 + trailing 20 flushed at stream end
    assert [len(b) for b in fetched] == [50, 50, 20]
    assert [len(b) for b in batches] == [50, 50, 20]
    assert batches[0][0]["id"] == "Q1"


def test_tail_jsonl_resumes_at_offset(tmp_path):
    p = tmp_path / "events.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps(_event("Q1")) + "\n")
        f.write(json.dumps(_event("Q2")) + "\n")
        f.write('{"torn')  # incomplete line: must not be consumed
    ev1, off1 = tail_jsonl_events(str(p), 0)
    assert [e["title"] for e in ev1] == ["Q1", "Q2"]
    # writer completes the torn line and appends another
    with open(p, "a") as f:
        f.write(' json": true}\n')
        f.write(json.dumps(_event("Q3")) + "\n")
    ev2, off2 = tail_jsonl_events(str(p), off1)
    assert [e.get("title") for e in ev2] == [None, "Q3"]
    assert off2 > off1
    ev3, off3 = tail_jsonl_events(str(p), off2)
    assert ev3 == [] and off3 == off2


def test_micro_batches_to_dataset(ray_session):
    batches = [[{"id": "Q1", "labels": {}}], [{"id": "Q2"}]]
    ds = micro_batches_to_dataset(batches)
    rows = {r["id"]: json.loads(r["item_json"]) for r in ds.take_all()}
    assert set(rows) == {"Q1", "Q2"}
    assert rows["Q1"] == {"id": "Q1", "labels": {}}
