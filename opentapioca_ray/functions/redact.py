"""PII-style pattern redaction over string columns.

A training-data pipeline scrubs emails / phone numbers / numeric ids before
the corpus leaves the ingest stage. The transform is one RE2 pass per
pattern per batch (`pyarrow.compute.replace_substring_regex`) — vectorized,
stateless, stream-safe at any scale. DuckDB's `regexp_replace(..., 'g')` is
also RE2, so the driver oracle reproduces the redaction byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# pattern -> replacement token; ORDER MATTERS (applied sequentially). RE2
# syntax only (no backrefs/lookarounds) so the SQL twin matches exactly.
DEFAULT_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"[0-9]+", "[NUM]"),
]


def redact_batch(
    batch: pa.Table,
    text_column: str,
    rules: list[tuple[str, str]] | None = None,
    out_column: str = "redacted",
    count_column: str = "n_redactions",
) -> pa.Table:
    """Apply `rules` to `text_column`; append the redacted string and the
    total number of matches replaced (summed over rules, counted BEFORE each
    rule rewrites the string — the same order the SQL twin uses)."""
    rules = DEFAULT_RULES if rules is None else rules
    col = batch.column(text_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    total = None
    cur = col
    for pat, rep in rules:
        n = pc.count_substring_regex(cur, pat)
        total = n if total is None else pc.add(total, n)
        cur = pc.replace_substring_regex(cur, pat, rep)
    out = batch.append_column(out_column, cur)
    return out.append_column(count_column, pc.cast(total, pa.int64()))


def redact(ds, text_column: str, rules: list[tuple[str, str]] | None = None):
    """Dataset-level redaction: pure `map_batches`, zero-copy Arrow in/out."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_column, rules), batch_format="pyarrow"
    )
