"""Stage checkpointing: partitioned Parquet + per-stage manifest.

North-rule requirement (BASELINE.json): every stage checkpoints to Parquet
with per-partition lineage + metrics, and a re-run skips stages whose
manifest is complete — the Ray-native replacement for the reference's
`--skip N` / `?since=` resume knobs (reference cli.py:106,145,
taggerfactory.py:74-75, streamreader.py:33-34).

Layout: `<root>/<stage>/part-*.parquet` + `<root>/<stage>/_manifest.json`
with {stage, params_fingerprint, upstream fingerprints, row_count,
num_files, written per-file sizes}. The fingerprint chains through
upstreams, so changing an upstream's params invalidates every downstream
stage.
"""

from __future__ import annotations

import hashlib
import json
import os
from glob import glob


def _fingerprint(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class StageCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_manifest.json")

    def fingerprint(self, stage: str) -> str | None:
        m = self.manifest(stage)
        return m["fingerprint"] if m else None

    def manifest(self, stage: str) -> dict | None:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str, params: dict, upstreams: list[str]) -> bool:
        m = self.manifest(stage)
        if m is None or not m.get("complete"):
            return False
        expect = self._expected_fingerprint(params, upstreams)
        if m.get("fingerprint") != expect:
            return False
        # all parts still on disk with recorded sizes
        for fname, size in m.get("files", {}).items():
            fpath = os.path.join(self._dir(stage), fname)
            if not os.path.exists(fpath) or os.path.getsize(fpath) != size:
                return False
        return True

    def _expected_fingerprint(self, params: dict, upstreams: list[str]) -> str:
        chain = {
            "params": params,
            "upstreams": {u: self.fingerprint(u) for u in upstreams},
        }
        return _fingerprint(chain)

    def run(self, stage: str, params: dict, upstreams: list[str], build_fn):
        """Run (or skip) a stage.

        `build_fn()` must return a `ray.data.Dataset`; it is written as
        partitioned parquet under the stage dir. Returns a Dataset reading
        the checkpoint (so downstreams always consume Parquet — resumable
        and re-readable)."""
        import ray.data

        out_dir = self._dir(stage)
        if self.is_complete(stage, params, upstreams):
            return ray.data.read_parquet(out_dir)
        # (re)build
        for f in glob(os.path.join(out_dir, "*.parquet")):
            os.remove(f)
        os.makedirs(out_dir, exist_ok=True)
        ds = build_fn()
        ds.write_parquet(out_dir)
        files = {
            os.path.basename(f): os.path.getsize(f)
            for f in glob(os.path.join(out_dir, "*.parquet"))
        }
        out = ray.data.read_parquet(out_dir)
        row_count = out.count()
        manifest = {
            "stage": stage,
            "complete": True,
            "fingerprint": self._expected_fingerprint(params, upstreams),
            "params": params,
            "upstreams": {u: self.fingerprint(u) for u in upstreams},
            "row_count": row_count,
            "num_files": len(files),
            "files": files,
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=2)
        return out

    def metrics(self) -> dict:
        """Roll-up of all stage manifests (per-stage lineage + row counts)."""
        out = {}
        for path in glob(os.path.join(self.root, "*", "_manifest.json")):
            with open(path) as f:
                m = json.load(f)
            out[m["stage"]] = {
                "rows": m.get("row_count"),
                "files": m.get("num_files"),
                "fingerprint": m.get("fingerprint"),
            }
        return out
