"""CLI end-to-end: each subcommand drives its Ray pipeline and writes its
artifact (the `ray job submit` surface — reference cli.py:19-220)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opentapioca_ray.cli import main


@pytest.fixture()
def docs_parquet(tmp_path):
    path = tmp_path / "docs.parquet"
    rows = [
        {"doc_id": 0, "text": "invited speakers are great speakers"},
        {"doc_id": 1, "text": "invited speakers love bow models"},
        {"doc_id": 2, "text": "invited speakers love bow models"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), path)
    return str(path)


def test_train_bow_and_shell(ray_session, docs_parquet, tmp_path, capsys):
    bow_path = str(tmp_path / "bow.json")
    assert main(["train-bow", docs_parquet, "-o", bow_path]) == 0
    assert main(["bow-shell", "-b", bow_path, "--phrase", "invited speakers"]) == 0
    out = capsys.readouterr().out
    last = [l for l in out.splitlines() if l.endswith("invited speakers")][-1]
    assert float(last.split("\t")[0]) < 0  # a log-likelihood


def test_graph_chain(ray_session, tmp_path, capsys):
    # preprocess -> compile -> compute-pagerank -> pagerank-shell
    dump = tmp_path / "dump.json"
    items = []
    for i in range(1, 5):
        claims = {
            "P31": [
                {
                    "mainsnak": {
                        "datavalue": {
                            "value": {"numeric-id": (i % 4) + 1},
                            "type": "wikibase-entityid",
                        }
                    },
                    "qualifiers": {},
                }
            ]
        }
        items.append({"id": f"Q{i}", "claims": claims})
    dump.write_text("\n".join(json.dumps(it) for it in items))
    edges_dir = str(tmp_path / "edges")
    graph_npz = str(tmp_path / "graph.npz")
    pr_npy = str(tmp_path / "pagerank.npy")
    assert main(["preprocess", str(dump), "-o", edges_dir]) == 0
    assert main(["compile", "-i", edges_dir, "-o", graph_npz]) == 0
    assert main(["compute-pagerank", "-i", graph_npz, "-o", pr_npy]) == 0
    v = np.load(pr_npy)
    assert abs(v.sum() - 1.0) < 1e-9
    assert main(["pagerank-shell", "-p", pr_npy, "--node", "Q2"]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[-1].startswith("Q2\t")


def test_index_delta_upsert(ray_session, tmp_path):
    base = tmp_path / "entities.parquet"
    delta = tmp_path / "delta.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"id": "Q1", "label": "old", "revid": 1},
                {"id": "Q2", "label": "keep", "revid": 5},
            ]
        ),
        base,
    )
    pq.write_table(
        pa.Table.from_pylist([{"id": "Q1", "label": "new", "revid": 9}]), delta
    )
    out_dir = str(tmp_path / "compacted")
    assert (
        main(["index-delta", "--entities", str(base), "--delta", str(delta), "-o", out_dir])
        == 0
    )
    got = {r["id"]: r["label"] for r in pq.read_table(out_dir).to_pylist()}
    assert got == {"Q1": "new", "Q2": "keep"}


def test_dedup_and_delete_output(ray_session, docs_parquet, tmp_path, capsys):
    out_dir = str(tmp_path / "dedup_out")
    assert main(["dedup", docs_parquet, "--method", "exact", "-o", out_dir]) == 0
    rows = pq.read_table(out_dir).to_pylist()
    by_keep = {r["keep_id"]: r["dup_count"] for r in rows}
    assert by_keep[1] == 2  # docs 1 and 2 are exact dups
    # delete-output refuses without --yes
    assert main(["delete-output", out_dir]) == 1
    assert main(["delete-output", out_dir, "--yes"]) == 0
    import os

    assert not os.path.exists(out_dir)


def test_linkage_checkpoint_cli(ray_session, tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    assert main(["linkage", "/root/testdata/sf0.001", "-o", out_dir, "--threshold", "0.2"]) == 0
    manifest = json.load(open(f"{out_dir}/clusters/_manifest.json"))
    assert manifest["complete"] and manifest["row_count"] > 0
    # re-run skips (manifest fingerprint matches): still succeeds quickly
    assert main(["linkage", "/root/testdata/sf0.001", "-o", out_dir, "--threshold", "0.2"]) == 0


def test_index_stream_ingest_and_resume(ray_session, tmp_path):
    """S2 end-to-end: JSONL feed -> filter -> micro-batch -> fetch ->
    last-write-wins upsert; a second run resumes at the stored offset and
    only ingests new events."""
    import json

    src = tmp_path / "source.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"id": f"Q{i}", "item_json": json.dumps({"id": f"Q{i}", "v": i})}
                for i in range(1, 8)
            ]
        ),
        src,
    )
    events = tmp_path / "events.jsonl"
    with open(events, "w") as f:
        for i in (1, 2, 3):
            f.write(json.dumps({"wiki": "wikidatawiki", "namespace": 0, "title": f"Q{i}"}) + "\n")
        # filtered noise: wrong wiki, wrong namespace, missing in source
        f.write(json.dumps({"wiki": "enwiki", "namespace": 0, "title": "Q4"}) + "\n")
        f.write(json.dumps({"wiki": "wikidatawiki", "namespace": 4, "title": "Q5"}) + "\n")
        f.write(json.dumps({"wiki": "wikidatawiki", "namespace": 0, "title": "Q99"}) + "\n")
    out1 = str(tmp_path / "index1")
    assert (
        main(["index-stream", "--events", str(events), "--source", str(src), "-o", out1])
        == 0
    )
    got = {r["id"] for r in pq.read_table(out1).to_pylist()}
    assert got == {"Q1", "Q2", "Q3"}  # noise filtered, Q99 dropped as missing

    # feed grows; resume picks up only the new event and upserts over out1
    with open(events, "a") as f:
        f.write(json.dumps({"wiki": "wikidatawiki", "namespace": 0, "title": "Q6"}) + "\n")
    out2 = str(tmp_path / "index2")
    assert (
        main(
            ["index-stream", "--events", str(events), "--source", str(src),
             "--entities", out1, "-o", out2]
        )
        == 0
    )
    rows = pq.read_table(out2).to_pylist()
    assert {r["id"] for r in rows} == {"Q1", "Q2", "Q3", "Q6"}
    assert len(rows) == 4  # compacted: one row per id


def test_index_dump_delete_excluded(ray_session, tmp_path):
    """Re-index with a narrower profile + --delete-excluded: now-excluded
    entities become tombstones; delta compaction drops them (reference
    taggerfactory.py:55-124, delete_excluded + None-doc deletions)."""

    def item(qid, rev, label, p31_qid, p31_num):
        return {
            "id": qid,
            "lastrevid": rev,
            "labels": {"en": {"value": label}},
            "claims": {
                "P31": [
                    {"mainsnak": {"datavalue": {"value": {"id": p31_qid, "numeric-id": p31_num}}}}
                ]
            },
            "sitelinks": {},
        }

    def write_dump(path, rev):
        with open(path, "w") as f:
            f.write(json.dumps(item("Q1", rev, "Human One", "Q5", 5)) + "\n")
            f.write(json.dumps(item("Q2", rev, "Org Two", "Q43229", 43229)) + "\n")

    dump1 = str(tmp_path / "dump1.jsonl")
    dump2 = str(tmp_path / "dump2.jsonl")
    write_dump(dump1, 10)
    write_dump(dump2, 20)

    profile_all = str(tmp_path / "profile_all.json")
    json.dump(
        {"name": "all", "language": "en", "restrict_types": [],
         "restrict_properties": [], "alias_properties": []},
        open(profile_all, "w"),
    )
    profile_humans = str(tmp_path / "profile_humans.json")
    json.dump(
        {"name": "humans", "language": "en",
         "restrict_types": [{"type": "Q5", "property": "P31"}],
         "restrict_properties": [], "alias_properties": []},
        open(profile_humans, "w"),
    )
    closures = str(tmp_path / "closures.json")
    json.dump({"Q5": [5]}, open(closures, "w"))

    base = str(tmp_path / "entities")
    assert main(["index-dump", dump1, "-p", profile_all, "-o", base]) == 0
    assert {r["id"] for r in pq.read_table(base).to_pylist()} == {"Q1", "Q2"}

    delta = str(tmp_path / "delta")
    assert (
        main(["index-dump", dump2, "-p", profile_humans,
              "--type-closures", closures, "--delete-excluded", "-o", delta])
        == 0
    )
    drows = {r["id"]: r["_deleted"] for r in pq.read_table(delta).to_pylist()}
    assert drows == {"Q1": False, "Q2": True}

    merged = str(tmp_path / "merged")
    assert (
        main(["index-delta", "--entities", base, "--delta", delta,
              "--tombstone-column", "_deleted", "-o", merged])
        == 0
    )
    rows = pq.read_table(merged).to_pylist()
    assert {r["id"] for r in rows} == {"Q1"}
    assert rows[0]["revid"] == 20  # the re-indexed row won last-write-wins

    # without the tombstone column the merge keeps Solr LWW semantics
    merged2 = str(tmp_path / "merged2")
    assert (
        main(["index-delta", "--entities", base, "--delta", delta, "-o", merged2]) == 0
    )
    assert {r["id"] for r in pq.read_table(merged2).to_pylist()} == {"Q1", "Q2"}
