"""Personalized PageRank seed expansion (stages/ppr.py)."""

import sys

sys.path.insert(0, "/root/repo")

from opentapioca_ray.stages.ppr import TOTAL_MASS


def test_ppr_mass_conserved_and_seed_biased(ray_session):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["ppr_seeds"](sf).to_pandas()
    # total mass is conserved up to the floor dust dropped at the final
    # teleport split (< |seeds| units)
    assert 0 <= TOTAL_MASS - out["ppr"].sum() < 5
    scores = dict(zip(out["node"], out["ppr"]))
    # every seed holds mass (restart guarantees it), and the seed set as a
    # whole dominates any single non-seed (teleport bias)
    seed_mass = [scores.get(s, 0) for s in range(5)]
    assert all(m > 0 for m in seed_mass)
    non_seed_max = out[out["node"] >= 5]["ppr"].max()
    assert sum(seed_mass) > non_seed_max
    # locality: far fewer touched nodes than the whole graph at 8 hops is
    # not guaranteed on this tiny graph, but scores must be positive-only
    assert (out["ppr"] > 0).all()
    assert out["node"].is_unique


def test_ppr_single_seed_restart(ray_session):
    """A node with no in-edges from the walk still accumulates the full
    teleport each round when it's the only seed."""
    import ray

    from opentapioca_ray.stages.ppr import ppr_scores

    # star: 0 -> {1,2,3,4}, no back edges; seed = 0
    edges = ray.data.from_items(
        [{"src": 0, "dst": d} for d in (1, 2, 3, 4)]
    )
    out = ppr_scores(edges, seeds=[0], iterations=4).to_pandas()
    scores = dict(zip(out["node"], out["ppr"]))
    # leaves are dangling: their mass is lost and teleports back to 0,
    # so 0 keeps the majority
    assert scores[0] > scores.get(1, 0)
    # symmetry: the four leaves hold identical mass
    leaf = {scores.get(d, 0) for d in (1, 2, 3, 4)}
    assert len(leaf) == 1
