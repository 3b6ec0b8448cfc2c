"""PII detection and redaction over a text column — the standard
pre-training privacy pass (C4/RefinedWeb-style email/phone/IP scrub).

Shape: stateless vectorized ``map_batches`` — patterns compile once at
module import, counting and redaction are pandas ``.str`` C-regex
kernels over the whole batch, no shuffle, no per-row Python. The
patterns are RE2-compatible (no lookaround) so the same expressions
run verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# Order matters: redaction applies top-to-bottom, and the oracle
# chains regexp_replace in the same order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append per-kind match counts (``n_<kind>`` int64) and a
    ``redacted`` column; counts are taken on the original text, then
    replacements apply in PII_PATTERNS order."""
    texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
    cols = {name: batch[name] for name in batch.column_names}
    red = texts
    for kind, pat, token in PII_PATTERNS:
        cols[f"n_{kind}"] = pa.array(
            texts.str.count(pat).to_numpy(), pa.int64()
        )
        red = red.str.replace(pat, token, regex=True)
    cols["redacted"] = pa.array(red.to_numpy(), pa.string())
    return pa.table(cols)


def pii_redact(ds, text_col: str = "text"):
    """Dataset → Dataset with n_email/n_phone/n_ipv4 + redacted text."""
    return ds.map_batches(
        lambda t, c=text_col: pii_redact_batch(t, c), batch_format="pyarrow"
    )
