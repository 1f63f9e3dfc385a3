"""Hypothesis property tests for this round's pure (non-Ray) kernels —
shrinkable random coverage on top of the fixed-seed fuzz tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SMALL_INTS = st.integers(min_value=-50, max_value=50)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=120,
    )
)
def test_skyline_sweep_nondominated(pairs):
    from opentapioca_ray.stages.skyline import _skyline_mask

    mx = np.array([p[0] for p in pairs], dtype=np.int64)
    mn = np.array([p[1] for p in pairs], dtype=np.int64)
    got = _skyline_mask(mx, mn)
    for i in range(len(pairs)):
        dominated = bool(
            np.any(
                (mx >= mx[i]) & (mn <= mn[i]) & ((mx > mx[i]) | (mn < mn[i]))
            )
        )
        assert got[i] == (not dominated)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz",
            min_size=1,
            max_size=14,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_soundex_shape_and_batch_independence(words):
    from opentapioca_ray.functions.phonetic import soundex

    batch = soundex(np.array(words, dtype=object))
    # 4-char codes: uppercase first letter + 3 digits
    for w, c in zip(words, batch):
        assert len(c) == 4 and c[0] == w[0].upper()
        assert all(d in "0123456" for d in c[1:])
    # batching never changes a word's code (flat-buffer walls hold)
    singles = [soundex(np.array([w], dtype=object))[0] for w in words]
    assert list(batch) == singles


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 30)),
        min_size=1,
        max_size=80,
    )
)
def test_fs_em_invariance_and_bounds(rows):
    """fs_em params stay in [0, 1e9] and are invariant to histogram row
    order and to zero-count rows."""
    from opentapioca_ray.stages.probabilistic import E9, fs_em

    patterns = [
        {"g1": g >> 1, "g2": g & 1, "n_pairs": n, "n_same_key": min(s, n)}
        for g, n, s in rows
        if n > 0
    ]
    if not patterns:
        return
    fit = fs_em(patterns, n_fields=2, iters=4)
    assert 0 <= fit["lam_e9"] <= E9
    for k in range(2):
        assert 0 <= fit["m_e9"][k] <= E9
        assert 0 <= fit["u_e9"][k] <= E9
    shuffled = list(reversed(patterns))
    assert fs_em(shuffled, n_fields=2, iters=4) == fit


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(1, 10)),
        min_size=1,
        max_size=60,
    )
)
def test_interval_union_bounds(rows):
    """Union length per key is bounded by the span and by the sum of
    interval lengths, and island counts never exceed interval counts."""
    import ray.data

    from opentapioca_ray.stages.windows import interval_union_per_key

    items = [
        {"k": k, "s": s, "e": s + d} for k, s, d in rows
    ]
    out = interval_union_per_key(
        ray.data.from_items(items), "k", "s", "e", n_parts=2
    ).take_all()
    per_key = {}
    for it in items:
        per_key.setdefault(it["k"], []).append((it["s"], it["e"]))
    for r in out:
        iv = per_key[r["k"]]
        span = max(e for _, e in iv) - min(s for s, _ in iv)
        total = sum(e - s for s, e in iv)
        assert 0 < r["covered"] <= min(span, total)
        assert 1 <= r["n_islands"] <= len(iv)
