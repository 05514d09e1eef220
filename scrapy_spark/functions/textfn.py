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
