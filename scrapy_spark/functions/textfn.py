"""Text kernels for the training-data pipeline ops.

Pure-Python references (used by tests) + Arrow-vectorized UDF wrappers for
the non-SQL-expressible pieces. SQL-expressible text ops (token counts,
stopword ratios, langid, shingles, simhash, minhash) live as column
expressions in entry_queries.py — this module only holds what genuinely
needs Python (sequential recurrences).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MOD = (1 << 61) - 1  # Mersenne prime 2^61-1
BASE = 257


def py_fingerprint(text: str | None) -> int | None:
    """Rolling polynomial hash over UTF-8 bytes, mod 2^61-1 (document
    fingerprinting for near-dup candidate blocking)."""
    if text is None:
        return None
    h = 0
    for b in text.encode("utf-8"):
        h = (h * BASE + b) % MOD
    return h


def _fingerprint_series(s: pd.Series) -> pd.Series:
    """Vectorized-over-batch rolling hash (numpy per string; Arrow batches)."""
    out = np.empty(len(s), dtype=object)
    for i, v in enumerate(s):
        out[i] = py_fingerprint(v)
    return pd.Series(out)


fingerprint_udf = F.pandas_udf(_fingerprint_series, T.LongType())


# ---------------------------------------------------------------------------
# PII patterns — the pre-training scrub pass (emails / phone-ish runs /
# IPv4). Same discipline as functions/mining.py: patterns stay in the
# Java/Python/RE2 common subset (no backrefs, no lookaround) so the SAME
# string runs in Spark's regexp_extract_all, DuckDB's RE2 twin, and
# python's re — engine portability is part of what the oracle hash proves.
# Deliberately simple, high-precision shapes: a production scrub would add
# locale-specific phone grammars and checksum validation (e.g. Luhn) on
# top; counting/redaction plumbing is identical.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — tld >= 2 alpha
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish digit run: optional +cc, separators allowed between
    # digits, >= 9 digits REQUIRED (so year ranges like "2020 - 2021",
    # 8 digits, do not match; a bare 7-digit local number doesn't either —
    # shape targets numbers written with a country/area code)
    "phone": r"\+?[0-9](?:[() -]*[0-9]){8,}",
    # dotted quad (word-bounded; no 0-255 range check — shape only)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def py_pii_counts(text: str | None) -> dict[str, int]:
    """Python twin of the per-kind match counts (unit-test reference)."""
    import re

    if text is None:
        return {k: 0 for k in PII_PATTERNS}
    return {k: len(re.findall(p, text)) for k, p in PII_PATTERNS.items()}
