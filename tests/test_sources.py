import json

import pyarrow as pa
import pytest

from opentapioca_ray.functions.text import sha256_hex


def test_files_from_documents(ray_session):
    import ray.data

    from opentapioca_ray.sources.files import files_from_documents

    docs = ray.data.from_items(
        [
            {"doc_id": 7, "text": "hello world", "lang": "en", "source": "src1"},
            {"doc_id": 8, "text": "bonjour", "lang": "fr", "source": "src2"},
        ]
    )
    rows = {r["file_id"]: r for r in files_from_documents(docs).take_all()}
    assert rows[7]["repo"] == "org7/src1"
    assert rows[7]["sha256"] == sha256_hex("hello world")
    assert rows[7]["path"].endswith(".py")
    assert rows[8]["path"].endswith(".js")
    assert len(rows[7]["commit"]) == 40
    # deterministic across invocations
    rows2 = {r["file_id"]: r for r in files_from_documents(docs).take_all()}
    assert rows == rows2


def test_read_files_sf(ray_session):
    from opentapioca_ray.sources.files import read_files, verify_sha256

    files = read_files("/root/testdata/sf0.001")
    assert files.count() == 500
    assert verify_sha256(files) == 0


def test_dumpreader(ray_session, tmp_path):
    from opentapioca_ray.sources.dumpreader import read_wikidata_dump

    dump = tmp_path / "dump.json"
    lines = ["["]
    for i in range(5):
        lines.append(json.dumps({"id": f"Q{i+1}", "labels": {}}) + ",")
    lines.append("not json at all")
    lines.append("]")
    dump.write_text("\n".join(lines))
    ds = read_wikidata_dump(str(dump))
    rows = ds.take_all()
    assert len(rows) == 5
    assert {r["id"] for r in rows} == {f"Q{i+1}" for i in range(5)}


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data

    from opentapioca_ray.checkpoint import StageCheckpoint

    ckpt = StageCheckpoint(str(tmp_path / "run"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return ray.data.range(10)

    out1 = ckpt.run("stage_a", {"p": 1}, [], build)
    assert out1.count() == 10
    assert calls["n"] == 1
    # second run skips
    out2 = ckpt.run("stage_a", {"p": 1}, [], build)
    assert out2.count() == 10
    assert calls["n"] == 1
    # changed params rebuild
    ckpt.run("stage_a", {"p": 2}, [], build)
    assert calls["n"] == 2
    # downstream invalidated when upstream fingerprint changes
    ckpt.run("stage_b", {}, ["stage_a"], build)
    assert calls["n"] == 3
    ckpt.run("stage_b", {}, ["stage_a"], build)
    assert calls["n"] == 3
    ckpt.run("stage_a", {"p": 3}, [], build)
    ckpt.run("stage_b", {}, ["stage_a"], build)
    assert calls["n"] == 5
    m = ckpt.metrics()
    assert m["stage_a"]["rows"] == 10
