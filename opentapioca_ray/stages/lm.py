"""Unigram language-model quality scoring (CCNet-style perplexity filter).

Pre-training pipelines score documents by how "natural" their token
distribution is under a language model trained on the corpus itself (or a
trusted reference corpus); low-probability documents are filtered or
down-sampled. This module implements the unigram variant: one distributed
counting pass trains the model, one streaming pass scores every document.

Scale notes:
- training is a per-batch Arrow `value_counts` combiner + ONE coarse hash
  exchange over DISTINCT (word, count) partials — facts never shuffle;
- the model is the vocabulary table, bounded by distinct-word count, not
  corpus size; it is broadcast once via `ray.put` (guarded by
  `driver_limit` — a vocabulary beyond that needs a hashed-feature model,
  not an exact table);
- scoring is a stateless `map_batches` fan-out: flatten tokens, one
  `searchsorted` lookup into the broadcast log-prob table, one segment sum
  per document. No exchange, no Python-per-row.

Exactness: the ONLY float operation is building the per-word integer
log-prob table lp_e6(w) = round(ln(count / total) * 1e6); every per-doc
score is then an exact int64 sum of those integers, so the DuckDB twin
reproduces results bit-for-bit from the same quantized table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from opentapioca_ray.functions.textstats import whitespace_token_lists

_VOCAB_LIMIT = 20_000_000  # distinct words the driver may hold / broadcast


def train_unigram_counts(ds, text_column: str = "text"):
    """Distributed corpus word counts: per-batch combiner + one coarse
    exchange. Returns a dataset of (word: string, count: int64)."""
    from opentapioca_ray.stages.exchange import coarse_groupby_agg

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return pa.schema(
                [pa.field("word", pa.string()), pa.field("count", pa.int64())]
            ).empty_table()
        toks = whitespace_token_lists(batch, text_column)
        vc = toks.flatten().value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "count": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return coarse_groupby_agg(partials, ["word"], {"count": ("count", "sum")})


def unigram_lm_scores(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    counts_ds=None,
    driver_limit: int = _VOCAB_LIMIT,
):
    """Score every document under the corpus unigram model.

    Returns (id, n_tokens: int64, sum_lp_e6: int64) for every document with
    at least one token, where sum_lp_e6 = Σ_tokens round(ln(p(w)) * 1e6).
    Mean log-prob / perplexity are monotone in sum_lp_e6 / n_tokens, so
    downstream filters threshold on the exact integers.

    `counts_ds`: pre-trained (word, count) model (e.g. from a reference
    corpus); defaults to training on `ds` itself. `ds` is consumed twice
    in that case, so pass a materialized dataset for anything expensive."""
    import ray

    if counts_ds is None:
        counts_ds = train_unigram_counts(ds, text_column)

    tables = [ray.get(r) for r in counts_ds.to_arrow_refs()]
    tables = [
        t for t in tables if t.num_rows and "word" in t.column_names
    ]
    if not tables:
        return ds.map_batches(
            lambda b: pa.schema(
                [
                    pa.field(id_column, pa.int64()),
                    pa.field("n_tokens", pa.int64()),
                    pa.field("sum_lp_e6", pa.int64()),
                ]
            ).empty_table(),
            batch_format="pyarrow",
        )
    vocab = pa.concat_tables(tables)
    if vocab.num_rows > driver_limit:
        raise ValueError(
            f"vocabulary {vocab.num_rows} exceeds driver_limit {driver_limit}; "
            "use a hashed-feature LM for open vocabularies"
        )
    words = vocab.column("word").to_numpy(zero_copy_only=False)
    counts = vocab.column("count").to_numpy(zero_copy_only=False).astype(np.float64)
    total = counts.sum()
    order = np.argsort(words)
    lp_e6 = np.round(
        np.log(counts[order] / total) * 1_000_000.0
    ).astype(np.int64)
    model_ref = ray.put((words[order], lp_e6))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                pa.field(id_column, pa.int64()),
                pa.field("n_tokens", pa.int64()),
                pa.field("sum_lp_e6", pa.int64()),
            ]
        ).empty_table()
        if batch.num_rows == 0 or text_column not in batch.column_names:
            return empty
        w_sorted, lp = ray.get(model_ref)
        toks = whitespace_token_lists(batch, text_column)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        n_tok = np.diff(offsets)
        if flat.size == 0:
            return empty
        idx = np.clip(np.searchsorted(w_sorted, flat), 0, len(lp) - 1)
        tok_lp = lp[idx]
        # out-of-vocabulary tokens (scoring under a foreign model) get the
        # rarest-word probability; self-trained models never hit this
        oov = w_sorted[idx] != flat
        if oov.any():
            tok_lp = np.where(oov, lp.min(), tok_lp)
        doc_rep = np.repeat(np.arange(batch.num_rows), n_tok)
        sums = np.bincount(doc_rep, weights=tok_lp, minlength=batch.num_rows)
        keep = n_tok > 0
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(ids[keep].astype(np.int64)),
                "n_tokens": pa.array(n_tok[keep].astype(np.int64)),
                "sum_lp_e6": pa.array(np.round(sums[keep]).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
