"""Meta-blocking WNP: purge + CBS weights + reciprocal node pruning."""

import pyarrow as pa


def test_wnp_prunes_weak_edges(ray_session):
    import ray.data

    from opentapioca_ray.stages.metablocking import metablocking_wnp_pairs

    # docs 0/1 near-identical (many shared 3-grams); docs 2/3 share only a
    # couple of grams with them -> their edges fall below the means
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": 0, "text": base + " one"},
        {"doc_id": 1, "text": base + " two"},
        {"doc_id": 2, "text": "alpha beta gamma nope xx yy zz qq ww ee"},
        {"doc_id": 3, "text": "rr tt uu ii oo pp aa ss dd ff"},
    ]
    out = metablocking_wnp_pairs(
        ray.data.from_items(rows).repartition(3), k=3, max_block_size=24
    ).to_pandas()
    pairs = {(r.u, r.v): r.cbs for r in out.itertuples()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 7
    # the weak 0-2 / 1-2 edges (1 shared gram vs mean ~ high) are pruned
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_block_purge_drops_hot_blocks(ray_session):
    import ray.data

    from opentapioca_ray.stages.metablocking import metablocking_wnp_pairs

    # every doc shares the same single 3-gram; cap at 3 purges the block
    rows = [{"doc_id": i, "text": "same old gram"} for i in range(5)]
    out = metablocking_wnp_pairs(
        ray.data.from_items(rows), k=3, max_block_size=3
    ).to_pandas()
    assert len(out) == 0


def test_partition_invariance(ray_session):
    import ray.data

    from opentapioca_ray.stages.metablocking import metablocking_wnp_pairs

    rows = [
        {"doc_id": i, "text": f"tok{i % 4} common word here tok{i % 3} end{i}"}
        for i in range(20)
    ]

    def run(nblocks):
        out = metablocking_wnp_pairs(
            ray.data.from_items(rows).repartition(nblocks)
        ).to_pandas()
        return set(zip(out["u"], out["v"], out["cbs"]))

    assert run(1) == run(7)


def test_adjusted_rand_stats_reference(ray_session):
    import itertools

    import numpy as np
    import ray.data

    from opentapioca_ray.stages.blocking_eval import adjusted_rand_stats

    rng = np.random.default_rng(5)
    a = rng.integers(0, 6, size=200)
    b = np.where(rng.random(200) < 0.7, a, rng.integers(0, 6, size=200))
    rows = [{"la": f"a{x}", "lb": f"b{y}"} for x, y in zip(a, b)]
    got = adjusted_rand_stats(
        ray.data.from_items(rows).repartition(4), "la", "lb"
    ).to_pandas().iloc[0]

    # pair-counting reference: classify all C(n,2) pairs
    n = len(a)
    same_both = same_a = same_b = 0
    for i, j in itertools.combinations(range(n), 2):
        sa_, sb_ = a[i] == a[j], b[i] == b[j]
        same_a += sa_
        same_b += sb_
        same_both += sa_ and sb_
    cn2 = n * (n - 1) // 2
    exp = same_a * same_b / cn2
    want = (same_both - exp) / (0.5 * (same_a + same_b) - exp)
    assert got["n_items"] == n
    assert got["sum_comb_cells"] == same_both
    assert got["sum_comb_a"] == same_a
    assert got["sum_comb_b"] == same_b
    assert abs(got["ari_e6"] / 1e6 - want) < 2e-6


def test_ari_identical_and_independent(ray_session):
    import ray.data

    from opentapioca_ray.stages.blocking_eval import adjusted_rand_stats

    rows = [{"la": f"g{i % 5}", "lb": f"h{i % 5}"} for i in range(100)]
    same = adjusted_rand_stats(ray.data.from_items(rows), "la", "lb").to_pandas()
    assert same["ari_e6"].iloc[0] == 1_000_000


def test_arcs_weights_brute_force(ray_session):
    """ARCS = sum over shared (purged) blocks of 1e6 // C(nb, 2),
    reciprocal WNP pruning — replayed driver-side."""
    from collections import defaultdict

    import ray.data

    from opentapioca_ray.stages.metablocking import metablocking_wnp_pairs

    docs = [
        {"doc_id": 1, "text": "a b c d e"},
        {"doc_id": 2, "text": "a b c x y"},
        {"doc_id": 3, "text": "a b c d z"},
        {"doc_id": 4, "text": "p q r s t"},
        {"doc_id": 5, "text": "p q r u v"},
    ]
    out = {
        (r["u"], r["v"]): r["arcs"]
        for r in metablocking_wnp_pairs(
            ray.data.from_items(docs), k=3, max_block_size=24, scheme="arcs"
        ).take_all()
    }

    # replay: distinct word-3-grams per doc
    def grams(text):
        ws = text.split()
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    block = defaultdict(set)
    for d in docs:
        for g in grams(d["text"]):
            block[g].add(d["doc_id"])
    w = defaultdict(int)
    for g, members in block.items():
        nb = len(members)
        if nb < 2 or nb > 24:
            continue
        term = 1_000_000 // (nb * (nb - 1) // 2)
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                w[(ms[i], ms[j])] += term
    s = defaultdict(int)
    d = defaultdict(int)
    for (u, v), ww in w.items():
        s[u] += ww
        s[v] += ww
        d[u] += 1
        d[v] += 1
    exp = {
        (u, v): ww
        for (u, v), ww in w.items()
        if ww * d[u] >= s[u] and ww * d[v] >= s[v]
    }
    assert out == exp


def test_nmi_identical_independent_and_reference(ray_session):
    import math

    import numpy as np
    import ray

    from opentapioca_ray.stages.blocking_eval import nmi_stats

    # identical partitions -> NMI exactly 1e6
    rows = [{"la": str(i % 3), "lb": str(i % 3)} for i in range(30)]
    same = nmi_stats(ray.data.from_items(rows), "la", "lb").to_pandas()
    assert int(same["nmi_e6"][0]) == 1_000_000

    # one side single-cluster -> zero entropy -> NMI 0
    rows = [{"la": "x", "lb": str(i % 3)} for i in range(30)]
    z = nmi_stats(ray.data.from_items(rows), "la", "lb").to_pandas()
    assert int(z["nmi_e6"][0]) == 0

    # hand-computed 2x2 reference: la = i%2 over 8 items, lb = i//4
    # cells all n=2, marginals all 4 -> MI = ln2 + (4*2ln2 - 8*4ln4)/8 ... replay
    rows = [{"la": str(i % 2), "lb": str(i // 4)} for i in range(8)]
    got = nmi_stats(ray.data.from_items(rows), "la", "lb").to_pandas()
    n = 8
    snn = 4 * int(np.floor(2 * math.log(2) * 1e6 + 0.5))
    sm = 2 * int(np.floor(4 * math.log(4) * 1e6 + 0.5))
    mi = math.log(n) + float(snn - 2 * sm) / 1e6 / n
    h = math.log(n) - float(sm) / 1e6 / n
    expect = int(np.floor(mi / math.sqrt(h * h) * 1e6 + 0.5))
    assert int(got["nmi_e6"][0]) == expect
    # orthogonal partitions: MI ~ 0
    assert abs(int(got["nmi_e6"][0])) <= 1
