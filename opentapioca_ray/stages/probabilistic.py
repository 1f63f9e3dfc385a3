"""Fellegi-Sunter probabilistic record linkage with exact-integer EM.

The classic unsupervised ER model (Fellegi & Sunter, JASA 1969; the
Splink/fastLink estimation recipe): candidate pairs get a binary
agreement vector gamma over K comparison fields; the pair population is a
two-component mixture (matches with per-field agreement probabilities
m_k, non-matches with u_k, mixing weight lambda) and EM estimates the
parameters without labels. The reference engine scores pairs with a
SUPERVISED linear model over similarity features (classifier.py:305-339,
similarities.py); this operator is the unsupervised counterpart every
large-scale linkage deployment starts from when labels don't exist.

Scale shape — the key identity: the EM statistics depend on each pair
ONLY through its gamma pattern, so the distributed work is exactly one
blocked pair enumeration that reduces to a 2^K-row pattern histogram
(ONE coarse exchange on the block key; the kernel cross-joins each
logical block A-side x B-side vectorized and bincounts patterns — the
pair set itself is never materialized, shuffled, or collected). EM then
runs driver-side over the histogram: O(2^K) state, independent of data
volume — the same shape Splink uses against SQL backends.

Determinism (the DuckDB oracle hash-matches bit-for-bit): parameters are
quantized to e9 integers after EVERY update (floor division, exact in
Python ints / DuckDB HUGEINT), and per-pattern responsibilities are
computed from those quantized params with a FIXED left-associative IEEE
double product (lam * f1 * ... * fK) then floored to e9 — identical on
both sides, so a fixed iteration count unrolls to a MATERIALIZED CTE
chain (the repo's standard iterative-oracle recipe).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)

E9 = 1_000_000_000


def _hist_empty(n_fields: int) -> pd.DataFrame:
    cols = {f"g{i + 1}": pd.Series(dtype=np.int64) for i in range(n_fields)}
    cols["n_pairs"] = pd.Series(dtype=np.int64)
    cols["n_same_key"] = pd.Series(dtype=np.int64)
    return pd.DataFrame(cols)


def fs_pattern_histogram(
    a_ds,
    b_ds,
    key_column: str,
    block_column: str,
    eq_columns: list[str],
    tol_columns: list[tuple[str, int]] | None = None,
    max_block_side: int = 50_000,
    n_parts: int | None = None,
):
    """Blocked A x B comparison-vector histogram: one exchange, 2^K rows out.

    `eq_columns` compare by exact equality (strings factorized once per
    partition — integer compares, no per-pair string work); `tol_columns`
    are (int64 column, tolerance) absolute-difference agreements. Field
    order is eq_columns then tol_columns; gamma bit i lands in output
    column `g{i+1}` (1 = agree). `n_same_key` counts pairs whose key
    columns match — the evaluation annotation for synthetic corpora where
    the key encodes ground truth; EM itself never sees it.

    Logical blocks larger than `max_block_side` on either side are
    truncated to their first `max_block_side` rows per side (in input
    order after the exchange sort) and the drop is logged — the standard
    skew guard: a hot block key at 100 TB needs a finer blocking scheme,
    not an O(hot^2) kernel.
    """
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
    )

    tol_columns = tol_columns or []
    n_fields = len(eq_columns) + len(tol_columns)
    slim = [key_column, block_column, *eq_columns, *[c for c, _ in tol_columns]]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(slim)  # inputs are sourced reads, never
            # schema-less shuffle blocks — select keeps schema even at 0 rows
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int64))
            )

        return fn

    unioned = a_ds.map_batches(tag(0), batch_format="pyarrow").union(
        b_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "__side" not in df.columns:
            return _hist_empty(n_fields)
        # factorize every string field ONCE per partition -> integer codes
        eq_codes = [pd.factorize(df[c].to_numpy())[0] for c in eq_columns]
        tol_vals = [
            (df[c].to_numpy(dtype=np.int64), tol) for c, tol in tol_columns
        ]
        keys = df[key_column].to_numpy(dtype=np.int64)
        side = df["__side"].to_numpy(dtype=np.int64)
        blk = pd.factorize(df[block_column].to_numpy())[0]
        order = np.lexsort((side, blk))
        counts = np.zeros(1 << n_fields, dtype=np.int64)
        same = np.zeros(1 << n_fields, dtype=np.int64)
        blk_s, side_s = blk[order], side[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], blk_s[1:] != blk_s[:-1], [True]))
        )
        n_dropped = 0
        # per logical block: vectorized cross join (the loop is over
        # blocks, never rows; each iteration is O(|A||B|) numpy work)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = order[s:e]
            a_idx = seg[side_s[s:e] == 0]
            b_idx = seg[side_s[s:e] == 1]
            if len(a_idx) > max_block_side:
                n_dropped += len(a_idx) - max_block_side
                a_idx = a_idx[:max_block_side]
            if len(b_idx) > max_block_side:
                n_dropped += len(b_idx) - max_block_side
                b_idx = b_idx[:max_block_side]
            if len(a_idx) == 0 or len(b_idx) == 0:
                continue
            ii = np.repeat(a_idx, len(b_idx))
            jj = np.tile(b_idx, len(a_idx))
            pattern = np.zeros(len(ii), dtype=np.int64)
            bit = n_fields - 1
            for codes in eq_codes:
                pattern |= (codes[ii] == codes[jj]).astype(np.int64) << bit
                bit -= 1
            for vals, tol in tol_vals:
                pattern |= (np.abs(vals[ii] - vals[jj]) <= tol).astype(
                    np.int64
                ) << bit
                bit -= 1
            counts += np.bincount(pattern, minlength=1 << n_fields)
            same += np.bincount(
                pattern,
                weights=(keys[ii] == keys[jj]).astype(np.float64),
                minlength=1 << n_fields,
            ).astype(np.int64)
        if n_dropped:
            logger.warning(
                "fs_pattern_histogram: %d rows dropped by max_block_side=%d "
                "(hot block key; use a finer blocking scheme for full recall)",
                n_dropped,
                max_block_side,
            )
        nz = counts > 0
        pats = np.flatnonzero(nz)
        out = {
            f"g{i + 1}": (pats >> (n_fields - 1 - i)) & 1
            for i in range(n_fields)
        }
        out["n_pairs"] = counts[nz]
        out["n_same_key"] = same[nz]
        return pd.DataFrame(out).astype(np.int64)

    partials = coarse_group_apply(unioned, block_column, kernel, n_parts=n_parts)
    return coarse_groupby_agg(
        partials,
        [f"g{i + 1}" for i in range(n_fields)],
        {"n_pairs": ("n_pairs", "sum"), "n_same_key": ("n_same_key", "sum")},
        n_parts=n_parts,
    )


def _resp_e9(lam_e9: int, m_e9: list[int], u_e9: list[int], bits: list[int]):
    """Responsibility of the match class for one gamma pattern, floored to
    e9. MUST stay bit-identical to the SQL twin: left-associative IEEE
    double product over quantized params, one division, one floor."""
    pm = lam_e9 / 1e9
    pu = (E9 - lam_e9) / 1e9
    for k, g in enumerate(bits):
        pm = pm * ((m_e9[k] if g else E9 - m_e9[k]) / 1e9)
        pu = pu * ((u_e9[k] if g else E9 - u_e9[k]) / 1e9)
    denom = pm + pu
    if denom == 0.0:
        return 0
    return int((pm / denom) * 1e9)


def fs_em(
    patterns: list[dict],
    n_fields: int,
    iters: int = 5,
    lam0_e9: int = E9 // 2,
    m0_e9: int = 900_000_000,
    u0_e9: int = 100_000_000,
) -> dict:
    """Exact-integer EM over the gamma-pattern histogram (driver-side,
    O(2^K * iters)). Every parameter is re-quantized to an e9 integer by
    floor division after each M-step, so the whole trajectory is a pure
    function of the histogram — reproducible anywhere, including SQL.

    Returns {"lam_e9", "m_e9": [K], "u_e9": [K], "posterior_e9": {pattern
    int -> e9 posterior under the FINAL params}}.
    """
    lam = lam0_e9
    m = [m0_e9] * n_fields
    u = [u0_e9] * n_fields
    rows = [
        (
            [int(p[f"g{i + 1}"]) for i in range(n_fields)],
            int(p["n_pairs"]),
        )
        for p in patterns
    ]
    total = sum(n for _, n in rows)
    if total == 0:
        return {
            "lam_e9": lam,
            "m_e9": m,
            "u_e9": u,
            "posterior_e9": {},
        }
    for _ in range(iters):
        r = [(bits, n, _resp_e9(lam, m, u, bits)) for bits, n in rows]
        s_match = sum(n * re for _, n, re in r)  # sum of n * r_e9
        s_non = sum(n * (E9 - re) for _, n, re in r)
        lam = s_match // total  # e9 by construction
        new_m, new_u = [], []
        for k in range(n_fields):
            mk_num = sum(n * re for bits, n, re in r if bits[k])
            uk_num = sum(n * (E9 - re) for bits, n, re in r if bits[k])
            # Python ints are arbitrary precision -> exact; SQL uses HUGEINT
            new_m.append(mk_num * E9 // s_match if s_match else m[k])
            new_u.append(uk_num * E9 // s_non if s_non else u[k])
        m, u = new_m, new_u
    return {
        "lam_e9": lam,
        "m_e9": m,
        "u_e9": u,
        "posterior_e9": {
            int(
                "".join(str(b) for b in bits), 2
            ): _resp_e9(lam, m, u, bits)
            for bits, _ in rows
        },
    }


def fs_match_edges(
    a_ds,
    b_ds,
    key_column: str,
    block_column: str,
    eq_columns: list[str],
    tol_columns: list[tuple[str, int]] | None = None,
    accepted_patterns: set[int] | None = None,
    max_block_side: int = 50_000,
    n_parts: int | None = None,
):
    """Classification pass: re-enumerate the blocked pairs and KEEP only
    those whose gamma pattern is in `accepted_patterns` (ints with bit
    n_fields-1-i = field i agreement — the keys of fs_em's posterior map).
    Output: distinct (u, v) match edges, u < v, self-pairs dropped — the
    input to transitive clustering. Same one-exchange shape as the
    histogram pass; the accepted set is O(2^K) and rides in the closure.
    """
    from opentapioca_ray.stages.exchange import (
        coarse_group_apply,
        coarse_groupby_agg,
    )

    tol_columns = tol_columns or []
    n_fields = len(eq_columns) + len(tol_columns)
    acc = np.array(sorted(accepted_patterns or ()), dtype=np.int64)
    slim = [key_column, block_column, *eq_columns, *[c for c, _ in tol_columns]]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(slim)
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int64))
            )

        return fn

    unioned = a_ds.map_batches(tag(0), batch_format="pyarrow").union(
        b_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)}
        )
        if df.empty or "__side" not in df.columns or len(acc) == 0:
            return empty
        eq_codes = [pd.factorize(df[c].to_numpy())[0] for c in eq_columns]
        tol_vals = [
            (df[c].to_numpy(dtype=np.int64), tol) for c, tol in tol_columns
        ]
        keys = df[key_column].to_numpy(dtype=np.int64)
        side = df["__side"].to_numpy(dtype=np.int64)
        blk = pd.factorize(df[block_column].to_numpy())[0]
        order = np.lexsort((side, blk))
        blk_s, side_s = blk[order], side[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], blk_s[1:] != blk_s[:-1], [True]))
        )
        us, vs = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = order[s:e]
            a_idx = seg[side_s[s:e] == 0][:max_block_side]
            b_idx = seg[side_s[s:e] == 1][:max_block_side]
            if len(a_idx) == 0 or len(b_idx) == 0:
                continue
            ii = np.repeat(a_idx, len(b_idx))
            jj = np.tile(b_idx, len(a_idx))
            pattern = np.zeros(len(ii), dtype=np.int64)
            bit = n_fields - 1
            for codes in eq_codes:
                pattern |= (codes[ii] == codes[jj]).astype(np.int64) << bit
                bit -= 1
            for vals, tol in tol_vals:
                pattern |= (np.abs(vals[ii] - vals[jj]) <= tol).astype(
                    np.int64
                ) << bit
                bit -= 1
            keep = np.isin(pattern, acc) & (keys[ii] != keys[jj])
            if keep.any():
                ku, kv = keys[ii[keep]], keys[jj[keep]]
                us.append(np.minimum(ku, kv))
                vs.append(np.maximum(ku, kv))
        if not us:
            return empty
        u = np.concatenate(us)
        v = np.concatenate(vs)
        packed = np.unique((u.astype(np.uint64) << np.uint64(32)) | (
            v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        )) if (u < (1 << 31)).all() and (v < (1 << 31)).all() else None
        if packed is not None:
            u = (packed >> np.uint64(32)).astype(np.int64)
            v = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
            return pd.DataFrame({"u": u, "v": v})
        return pd.DataFrame({"u": u, "v": v}).drop_duplicates()

    edges = coarse_group_apply(unioned, block_column, kernel, n_parts=n_parts)
    # cross-partition distinct (a record normally lives in ONE block, but
    # generic inputs may repeat a pair across blocks)
    return coarse_groupby_agg(
        edges, ["u", "v"], {"__one": ("u", "size")}, n_parts=n_parts
    ).drop_columns(["__one"])


def fellegi_sunter(
    a_ds,
    b_ds,
    key_column: str,
    block_column: str,
    eq_columns: list[str],
    tol_columns: list[tuple[str, int]] | None = None,
    iters: int = 5,
    max_block_side: int = 50_000,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """End-to-end unsupervised linkage fit: blocked histogram (distributed)
    + quantized EM (driver) -> one row per observed gamma pattern with the
    pair count, the ground-truth same-key count, and the final-model match
    posterior (e9 fixed-point). 2^K rows out regardless of input size."""
    n_fields = len(eq_columns) + len(tol_columns or [])
    hist = fs_pattern_histogram(
        a_ds,
        b_ds,
        key_column,
        block_column,
        eq_columns,
        tol_columns,
        max_block_side=max_block_side,
        n_parts=n_parts,
    ).to_pandas()  # <= 2^K rows
    patterns = hist.to_dict("records")
    fit = fs_em(patterns, n_fields, iters=iters)
    key = hist[[f"g{i + 1}" for i in range(n_fields)]].to_numpy(dtype=np.int64)
    pat_int = np.zeros(len(hist), dtype=np.int64)
    for i in range(n_fields):
        pat_int |= key[:, i] << (n_fields - 1 - i)
    hist["posterior_e9"] = np.array(
        [fit["posterior_e9"].get(int(p), 0) for p in pat_int], dtype=np.int64
    )
    return hist.sort_values(
        [f"g{i + 1}" for i in range(n_fields)]
    ).reset_index(drop=True)
