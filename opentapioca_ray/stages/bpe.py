"""Byte-pair-encoding vocabulary learning (Sennrich et al., ACL 2016).

The tokenizer-training step of every LLM data pipeline: starting from
characters, repeatedly merge the most frequent adjacent symbol pair.
The reference engine tokenizes with a fixed separator regex
(languagemodel.py via text.py); BPE learning is the beyond-reference
LLM-pipeline counterpart that *derives* the token inventory.

Scale shape — classic map-reduce BPE: the corpus collapses ONCE into a
(word, count) vocabulary (one exchange; 100 TB of text -> a vocab table
orders of magnitude smaller), and every merge round then runs over the
VOCAB only: one pair-count exchange with combiner partials + an O(blocks)
argmax to the driver, one broadcast merge applied as vectorized literal
replaces. Nothing per-round touches the corpus again.

Determinism (the DuckDB oracle replays every round): a word's state is
the sentinel-spaced symbol string ' h e l l o '; pair counts weight every
adjacent index pair by the word count (Sennrich's get_stats convention);
the best pair is (max count, then lexicographically smallest (a, b)); a
merge applies as SIX successive non-overlapping left-to-right literal
replaces of ' a b ' -> ' ab '. Single-pass replace misses an occurrence
whose leading space was consumed by the previous match; each extra pass
merges at least half of what remains, so six passes reach the fixpoint
for any word up to 64 symbols. Python str.replace, pyarrow
replace_substring and DuckDB replace() are verified to share these
continuation semantics (tests/test_bpe.py), which is what makes the
trajectory bit-reproducible. DOCUMENTED VARIANT: within a run of >= 3
identical symbols the fixpoint pairs occurrences alternately
(' a a a a a a ' -> ' aa a aa a '), where canonical greedy BPE packs
left (' aa aa aa '); everywhere else the result is canonical. Real alpha
vocabularies almost never contain such runs, and both sides of the
oracle implement the same rule, so the check is exact regardless."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_REPLACE_PASSES = 6

_VOCAB_SCHEMA = pa.schema([("repr", pa.string()), ("cnt", pa.int64())])

_PAIR_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("cnt", pa.int64())]
)


def _pair_counts_batch(batch: pa.Table) -> pa.Table:
    """(repr, cnt) rows -> per-batch partial (a, b, cnt) adjacent-pair
    counts. One Arrow split + flat numpy pairing, no per-word loop."""
    if batch.num_rows == 0 or "repr" not in batch.column_names:
        return _PAIR_SCHEMA.empty_table()
    reprs = pc.utf8_trim_whitespace(batch.column("repr").combine_chunks())
    parts = pc.split_pattern(reprs, pattern=" ")
    flat = parts.values.to_numpy(zero_copy_only=False)
    offs = parts.offsets.to_numpy()
    cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    n_sym = offs[1:] - offs[:-1]
    n_pairs = np.maximum(n_sym - 1, 0)
    if n_pairs.sum() == 0:
        return _PAIR_SCHEMA.empty_table()
    # left indices of every adjacent pair: per word, offs[w] .. offs[w]+n-2
    word_of = np.repeat(np.arange(len(n_pairs)), n_pairs)
    starts = np.repeat(offs[:-1], n_pairs)
    pos = np.arange(len(word_of)) - np.repeat(
        np.cumsum(n_pairs) - n_pairs, n_pairs
    )
    li = starts + pos
    w = np.repeat(cnt, n_pairs)
    df = pd.DataFrame({"a": flat[li], "b": flat[li + 1], "cnt": w})
    agg = df.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
    return pa.Table.from_pandas(agg, preserve_index=False).cast(_PAIR_SCHEMA)


def _best_pair(pairs_ds) -> tuple | None:
    """Global argmax by (count desc, a asc, b asc): per-block partial
    argmax, then an O(blocks) reduce on the driver."""
    import ray

    def block_best(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return _PAIR_SCHEMA.empty_table()
        df = batch.to_pandas()
        df = df.sort_values(
            ["cnt", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(1)
        return pa.Table.from_pandas(df, preserve_index=False).cast(_PAIR_SCHEMA)

    cands = pairs_ds.map_batches(block_best, batch_format="pyarrow").take_all()
    if not cands:
        return None
    best = min(cands, key=lambda r: (-r["cnt"], r["a"], r["b"]))
    return best["a"], best["b"], int(best["cnt"])


def _apply_merge(a: str, b: str):
    pat, rep = f" {a} {b} ", f" {a}{b} "

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "repr" not in batch.column_names:
            return _VOCAB_SCHEMA.empty_table()
        col = batch.column("repr").combine_chunks()
        for _ in range(_REPLACE_PASSES):
            col = pc.replace_substring(col, pattern=pat, replacement=rep)
        return pa.table({"repr": col, "cnt": batch.column("cnt")})

    return fn


def bpe_train(
    ds,
    text_column: str = "text",
    n_merges: int = 10,
    return_state: bool = False,
    n_parts: int | None = None,
):
    """Learn `n_merges` BPE merges over the ASCII-alpha token stream of
    `ds[text_column]`. Returns the merge table: one row per round with
    (round, left_sym, right_sym, merged, pair_count); with
    `return_state=True`, also the final vocabulary state Dataset of
    (repr, cnt) — the encode side's token table (the original word is
    the repr with spaces stripped, since merges only concatenate)."""
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    def word_rows(batch: pa.Table) -> pa.Table:
        from opentapioca_ray.functions.text import tokenize_flat

        schema = pa.schema([("word", pa.string())])
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return schema.empty_table()
        flat, _ = tokenize_flat(
            [t or "" for t in batch.column(text_column).to_pylist()]
        )
        if not len(flat):
            return schema.empty_table()
        arr = pa.array(flat.astype(object), type=pa.string())
        return pa.table(
            {"word": arr.filter(pc.match_substring_regex(arr, "^[A-Za-z]+$"))}
        )

    vocab = coarse_groupby_agg(
        ds.map_batches(word_rows, batch_format="pyarrow"),
        ["word"],
        {"cnt": ("word", "size")},
        n_parts=n_parts,
    )

    def to_repr(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return _VOCAB_SCHEMA.empty_table()
        words = batch.column("word").to_numpy(zero_copy_only=False)
        reprs = np.array([" " + " ".join(w) + " " for w in words], object)
        return pa.table(
            {
                "repr": pa.array(reprs, type=pa.string()),
                "cnt": batch.column("cnt").cast(pa.int64()),
            }
        )

    state = vocab.map_batches(to_repr, batch_format="pyarrow").materialize()
    if n_parts is None:
        # 10 chained rounds follow, each one exchange over VOCAB-sized data;
        # size P to the (now known) vocabulary so small corpora don't pay
        # default-P task launches per round (the LPA lesson)
        from opentapioca_ray.stages.exchange import default_n_parts, right_size

        n_vocab = state.count()
        n_parts = max(4, min(default_n_parts(), n_vocab // 8192 + 1))
        state = right_size(state)

    rows = []
    for rnd in range(n_merges):
        pairs = coarse_groupby_agg(
            state.map_batches(_pair_counts_batch, batch_format="pyarrow"),
            ["a", "b"],
            {"cnt": ("cnt", "sum")},
            n_parts=n_parts,
        )
        best = _best_pair(pairs)
        if best is None:
            break
        a, b, cnt = best
        rows.append(
            {
                "round": rnd,
                "left_sym": a,
                "right_sym": b,
                "merged": a + b,
                "pair_count": cnt,
            }
        )
        state = state.map_batches(
            _apply_merge(a, b), batch_format="pyarrow"
        ).materialize()
    table = pd.DataFrame(
        rows,
        columns=["round", "left_sym", "right_sym", "merged", "pair_count"],
    ).astype({"round": np.int64, "pair_count": np.int64})
    if return_state:
        return table, state
    return table
