"""Canopy clustering blocking (stages/canopy.py, __ray_entry__.canopy_blocks)."""

import sys

sys.path.insert(0, "/root/repo")

T1, T2 = 4, 10


def _run(sf_dir):
    import __ray_entry__ as entry

    return entry.queries()["canopy_blocks"](sf_dir).to_pandas()


def test_canopy_invariants(ray_session):
    out = _run("/root/testdata/sf0.001")
    assert len(out) > 0
    # every member clears the loose threshold
    assert (out["overlap"] >= T1).all()
    # one center per round; round 0's center is the global min doc id
    per_round = out.groupby("canopy_round")["center_id"].nunique()
    assert (per_round == 1).all()
    centers = out.groupby("canopy_round")["center_id"].first()
    assert centers.iloc[0] == 0  # doc_id 0 exists and is never retired before round 0
    # centers are strictly increasing? NOT guaranteed (tight-removed docs
    # skip ahead), but a center never repeats
    assert centers.is_unique
    # each center appears in its own canopy (its self-overlap = its gram
    # count >= T1 for these docs)
    for rnd, c in centers.items():
        members = set(out[out["canopy_round"] == rnd]["doc_id"])
        assert c in members
    # a doc retired by the tight threshold (or as center) never appears in
    # a LATER canopy
    retired = set()
    for rnd in sorted(out["canopy_round"].unique()):
        sub = out[out["canopy_round"] == rnd]
        assert retired.isdisjoint(set(sub["doc_id"]))
        retired |= set(sub[sub["overlap"] >= T2]["doc_id"])
        retired.add(int(sub["center_id"].iloc[0]))


def test_canopy_deterministic(ray_session):
    a = _run("/root/testdata/sf0.001")
    b = _run("/root/testdata/sf0.001")
    key = ["canopy_round", "doc_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
