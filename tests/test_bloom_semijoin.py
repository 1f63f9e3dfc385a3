"""Bloom-prefiltered semi-join: no false negatives, exact annotation."""

import hashlib

import numpy as np


def _positions(k, m):
    d = hashlib.md5(str(k).encode()).digest()
    return (
        int.from_bytes(d[:8], "big") % m,
        int.from_bytes(d[8:16], "big") % m,
    )


def test_bloom_semijoin_no_false_negatives_and_exact_flags(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import bloom_semijoin

    m = 64  # tiny filter -> false positives guaranteed
    build_keys = [3, 17, 42]
    probe = [{"pk": int(i), "key": int(i % 100)} for i in range(500)]
    build = [{"bk": k} for k in build_keys]
    out = bloom_semijoin(
        ray.data.from_items(probe).repartition(3),
        ray.data.from_items(build),
        "key",
        "bk",
        ["pk"],
        m_bits=m,
    ).to_pandas()

    bits = set()
    for k in build_keys:
        bits.update(_positions(k, m))
    got = dict(zip(out["pk"], out["is_match"]))
    for row in probe:
        h1, h2 = _positions(row["key"], m)
        is_cand = h1 in bits and h2 in bits
        is_member = row["key"] in build_keys
        if is_member:
            # bloom never drops a true member
            assert got.get(row["pk"]) == 1, row
        elif is_cand:
            assert got.get(row["pk"]) == 0, row  # FP annotated, not silent
        else:
            assert row["pk"] not in got, row  # pruned before the exchange
    # with m=64 and 100 distinct probe keys there must BE false positives
    assert (out["is_match"] == 0).sum() > 0
