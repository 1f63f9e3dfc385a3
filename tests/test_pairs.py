import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opentapioca_ray.stages.pairs import (
    PairFeaturizer,
    PairScorerStage,
    blocking_batch,
    bounded_edit_distance,
    make_pair_group_fn,
)


def files_batch(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("file_id", pa.int64()),
                ("repo", pa.string()),
                ("content", pa.string()),
            ]
        ),
    )


BASE = " ".join(f"tok{i} filler{i % 7} word{i % 13}" for i in range(60))


def test_blocking_near_dups_share_band():
    near = BASE + " trailing marker"  # tiny edit: ~2 shingles differ
    far = " ".join(f"zz{i}" for i in range(120))
    batch = files_batch(
        [
            {"file_id": 1, "repo": "r1", "content": BASE},
            {"file_id": 2, "repo": "r2", "content": near},
            {"file_id": 3, "repo": "r3", "content": far},
        ]
    )
    out = blocking_batch(batch, bands=16)
    keys = {}
    for r in out.to_pylist():
        keys.setdefault(r["file_id"], set()).add(r["block_key"])
    assert keys[1] & keys[2], "near-duplicates must share at least one band"
    assert not (keys[1] & keys[3]), "unrelated docs must not collide"
    # token prefix carried, capped
    assert all(len(r["tokens"]) <= 128 for r in out.to_pylist())


def test_pair_group_all_pairs_and_dedup_ids():
    df = pd.DataFrame(
        {
            "file_id": [5, 3, 9, 3],
            "repo": ["a", "b", "c", "b"],
            "sig_head": [1, 2, 3, 2],
            "tokens": [["x"], ["y"], ["z"], ["y"]],
        }
    )
    pairs = make_pair_group_fn()(df)
    assert len(pairs) == 3  # 3 distinct files -> 3 pairs
    assert all(p.left_id < p.right_id for p in pairs.itertuples())
    assert (pairs["capped"] == 0).all()


def test_pair_group_skew_guard():
    n = 100
    df = pd.DataFrame(
        {
            "file_id": np.arange(n),
            "repo": ["r"] * n,
            "sig_head": np.arange(n)[::-1],
            "tokens": [["t"]] * n,
        }
    )
    pairs = make_pair_group_fn(max_block_size=64, window=8)(df)
    assert len(pairs) < n * (n - 1) // 2
    assert (pairs["capped"] > 0).all()
    # bounded: at most window pairs per member
    assert len(pairs) <= n * 8


def test_bounded_edit_distance():
    assert bounded_edit_distance(["a", "b"], ["a", "b"]) == 1.0
    assert bounded_edit_distance(["a", "b"], ["a", "c"]) == 0.5
    assert bounded_edit_distance([], []) == 1.0
    assert bounded_edit_distance(["a"], []) == 0.0


def test_featurizer():
    f = PairFeaturizer(idf={"a": 1.0, "b": 2.0}, repo_prior={"r1": 0.5})
    row = {
        "left_tokens": ["a", "b"],
        "right_tokens": ["a", "b"],
        "left_repo": "r1",
        "right_repo": "r2",
    }
    feats = f.features(row)
    assert feats[0] == pytest.approx(1.0)  # identical tfidf vectors
    assert feats[1] == 1.0 and feats[2] == 1.0 and feats[3] == 1.0
    assert feats[4] == pytest.approx(0.25)


def test_scorer_stage_untrained(ray_session):
    import ray

    batch = pa.Table.from_pylist(
        [
            {
                "left_id": 1,
                "right_id": 2,
                "left_repo": "r",
                "right_repo": "r",
                "left_tokens": ["a", "b", "c"],
                "right_tokens": ["a", "b", "c"],
                "capped": 0,
            },
            {
                "left_id": 1,
                "right_id": 3,
                "left_repo": "r",
                "right_repo": "r",
                "left_tokens": ["a", "b", "c"],
                "right_tokens": ["x", "y", "z"],
                "capped": 0,
            },
        ]
    )
    stage = PairScorerStage(idf_ref=None, repo_prior_ref=None, model_dict=None)
    out = stage(batch).to_pylist()
    assert out[0]["score"] > 0  # identical -> positive
    assert out[1]["score"] < 0  # disjoint -> negative


def test_features_batch_matches_row_featurizer():
    """The vectorized batch featurizer must reproduce the per-row reference
    implementation exactly (modulo float summation order)."""
    import numpy as np
    import pyarrow as pa

    from opentapioca_ray.stages.pairs import PairFeaturizer

    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(30)]
    idf = {w: float(0.1 + i * 0.13) for i, w in enumerate(vocab[:20])}
    prior = {"repoA": 0.7, "repoB": 0.2}
    feat = PairFeaturizer(idf, prior)

    def rand_tokens():
        k = rng.randint(0, 12)
        return [vocab[rng.randint(0, len(vocab))] for _ in range(k)]

    rows = []
    for _ in range(40):
        rows.append(
            {
                "left_tokens": rand_tokens(),
                "right_tokens": rand_tokens(),
                "left_repo": rng.choice(["repoA", "repoB", "repoC"]),
                "right_repo": rng.choice(["repoA", "repoB", "repoC"]),
            }
        )
    # edge cases: both empty, one empty, identical, shorter than bigram
    rows += [
        {"left_tokens": [], "right_tokens": [], "left_repo": "x", "right_repo": "y"},
        {"left_tokens": [], "right_tokens": ["tok1"], "left_repo": "x", "right_repo": "y"},
        {"left_tokens": ["tok1"], "right_tokens": ["tok1"], "left_repo": "repoA", "right_repo": "repoA"},
        {"left_tokens": ["tok2"], "right_tokens": ["tok3"], "left_repo": "x", "right_repo": "y"},
    ]
    expected = np.array([feat.features(r) for r in rows])
    got = feat.features_batch(
        pa.array([r["left_tokens"] for r in rows], type=pa.list_(pa.string())),
        pa.array([r["right_tokens"] for r in rows], type=pa.list_(pa.string())),
        [r["left_repo"] for r in rows],
        [r["right_repo"] for r in rows],
    )
    assert got.shape == expected.shape
    assert np.allclose(got, expected, atol=1e-12)
