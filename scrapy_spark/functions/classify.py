"""Content classification — the reference's stage-2→3 admission filter
(content_classification.py:126-415) as pure column logic.

The reference classifies every fetched row into a content CATEGORY (from the
normalized mime type), a QUALITY tier (category- and size-dependent), and an
IS_ENRICHABLE gate that decides which rows proceed to stage-3 enrichment.
All of it is deterministic rule logic — no ML — so the Spark form is a
`when`-chain over (status_code, content_type, content_length) that stays
inside whole-stage codegen, and the DuckDB oracle twin is a CASE chain
GENERATED FROM THE SAME TABLES below (single source of truth; the twins
cannot drift). A sequential Python twin (:func:`py_classify`) backs the
crawl-parity tests.

Confidence is emitted as an integer percent (95/70/30/100) — the repo-wide
exactness rule: never compare floats across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# mime -> category (content_classification.py:74-126; verbatim semantics)
MIME_TO_CATEGORY: dict[str, str] = {
    "text/html": "html_page",
    "application/xhtml+xml": "html_page",
    "application/json": "api_endpoint",
    "application/xml": "api_endpoint",
    "text/xml": "api_endpoint",
    "application/ld+json": "api_endpoint",
    "application/pdf": "document",
    "application/msword": "document",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "document",
    "application/vnd.ms-excel": "document",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "document",
    "image/jpeg": "image",
    "image/png": "image",
    "image/gif": "image",
    "image/webp": "image",
    "image/svg+xml": "image",
    "video/mp4": "video",
    "video/webm": "video",
    "video/ogg": "video",
    "video/avi": "video",
    "audio/mpeg": "audio",
    "audio/mp3": "audio",
    "audio/wav": "audio",
    "audio/ogg": "audio",
    "application/zip": "archive",
    "application/x-gzip": "archive",
    "application/x-tar": "archive",
    "text/javascript": "code",
    "application/javascript": "code",
    "text/css": "code",
    "text/x-python": "code",
    "text/csv": "data",
}

# size_class thresholds (content_classification.py:360-371)
SIZE_CLASSES: list[tuple[int, str]] = [
    (1024, "tiny"),
    (10 * 1024, "small"),
    (100 * 1024, "medium"),
    (1024 * 1024, "large"),
]


def _normalized(content_type: Column) -> Column:
    """Content-Type header -> normalized mime: text before ';', trimmed,
    lowered (content_classification.py:149)."""
    return F.lower(F.trim(F.split_part(content_type, F.lit(";"), F.lit(1))))


def category_col(status_code: Column, content_type: Column) -> Column:
    """Content category (redirect/error override the mime map).

    Built as ONE flat CaseWhen (chained .when on the same builder), not a
    fold of nested .otherwise()s: the nested form produces a depth-33
    expression tree whose analysis+codegen costs seconds per plan compile
    (measured 5.7s cold on the crawl's per-generation write)."""
    n = _normalized(content_type)
    c = F.when((status_code >= 300) & (status_code < 400), "redirect").when(
        status_code >= 400, "error"
    )
    for mime, cat in MIME_TO_CATEGORY.items():
        c = c.when(n == mime, cat)
    return c.otherwise("unknown")


def mime_family_col(status_code: Column, content_type: Column) -> Column:
    n = _normalized(content_type)
    family = F.when(
        n.contains("/"), F.split_part(n, F.lit("/"), F.lit(1))
    ).otherwise("unknown")
    return (
        F.when((status_code >= 300) & (status_code < 400), "redirect")
        .when(status_code >= 400, "error")
        .otherwise(family)
    )


def quality_col(
    status_code: Column,
    content_type: Column,
    content_length: Column,
    category: Column | None = None,
) -> Column:
    """Quality tier (content_classification.py:240-277): html by length
    (<500 low, >10000 high), documents by length (>1000 high else low),
    everything else medium; errors are 'error'. Redirects fall through to
    the default 'medium' (reference: _classify_redirect -> MEDIUM).

    Pass ``category`` (an already-computed category COLUMN REFERENCE) on
    hot paths — otherwise the category chain is re-expanded inline."""
    cat = (
        category
        if category is not None
        else category_col(status_code, content_type)
    )
    return (
        F.when(status_code >= 400, "error")
        .when(
            cat == "html_page",
            F.when(content_length < 500, "low")
            .when(content_length > 10000, "high")
            .otherwise("medium"),
        )
        .when(
            cat == "document",
            F.when(content_length > 1000, "high").otherwise("low"),
        )
        .otherwise("medium")
    )


def is_enrichable_col(
    status_code: Column,
    content_type: Column,
    content_length: Column,
    category: Column | None = None,
    quality: Column | None = None,
) -> Column:
    """Stage-3 admission gate (content_classification.py:280-318). Pass
    precomputed ``category``/``quality`` column references on hot paths."""
    cat = (
        category
        if category is not None
        else category_col(status_code, content_type)
    )
    q = (
        quality
        if quality is not None
        else quality_col(status_code, content_type, content_length, cat)
    )
    return (
        F.when(q == "error", F.lit(False))
        .when((q == "low") & (content_length < 100), F.lit(False))
        .when(cat.isin("html_page", "document", "api_endpoint"), F.lit(True))
        .when(cat.isin("image", "video", "audio", "archive", "code"), F.lit(False))
        .otherwise(q.isin("medium", "high"))
    )


def confidence_pct_col(status_code: Column, content_type: Column) -> Column:
    """Classification confidence as integer percent (95 known mime, 30
    unknown, 70 otherwise, 100 redirect/error) — float-free across engines."""
    n = _normalized(content_type)
    known = n.isin(*MIME_TO_CATEGORY)
    cat = category_col(status_code, content_type)
    return (
        F.when((status_code >= 300) & (status_code < 400), 100)
        .when(status_code >= 400, 100)
        .when(known, 95)
        .when(cat == "unknown", 30)
        .otherwise(70)
    ).cast("int")


def size_class_col(content_length: Column) -> Column:
    c = None
    for limit, name in SIZE_CLASSES:
        c = (F.when if c is None else c.when)(content_length < limit, name)
    return c.otherwise("very_large")


# --- DuckDB oracle twins (generated from the same tables) ------------------

_NORM_SQL = "lower(trim(string_split({ct}, ';')[1]))"


def sql_category(status: str, ct: str) -> str:
    n = _NORM_SQL.format(ct=ct)
    whens = "\n".join(
        f"WHEN '{m}' THEN '{c}'" for m, c in MIME_TO_CATEGORY.items()
    )
    return f"""CASE
      WHEN {status} >= 300 AND {status} < 400 THEN 'redirect'
      WHEN {status} >= 400 THEN 'error'
      ELSE (CASE {n} {whens} ELSE 'unknown' END) END"""


def sql_mime_family(status: str, ct: str) -> str:
    n = _NORM_SQL.format(ct=ct)
    return f"""CASE
      WHEN {status} >= 300 AND {status} < 400 THEN 'redirect'
      WHEN {status} >= 400 THEN 'error'
      WHEN contains({n}, '/') THEN string_split({n}, '/')[1]
      ELSE 'unknown' END"""


def sql_quality(status: str, ct: str, clen: str) -> str:
    cat = sql_category(status, ct)
    return f"""CASE
      WHEN {status} >= 400 THEN 'error'
      WHEN ({cat}) = 'html_page' THEN
        (CASE WHEN {clen} < 500 THEN 'low'
              WHEN {clen} > 10000 THEN 'high' ELSE 'medium' END)
      WHEN ({cat}) = 'document' THEN
        (CASE WHEN {clen} > 1000 THEN 'high' ELSE 'low' END)
      ELSE 'medium' END"""


def sql_is_enrichable(status: str, ct: str, clen: str) -> str:
    cat, q = sql_category(status, ct), sql_quality(status, ct, clen)
    return f"""CASE
      WHEN ({q}) = 'error' THEN FALSE
      WHEN ({q}) = 'low' AND {clen} < 100 THEN FALSE
      WHEN ({cat}) IN ('html_page', 'document', 'api_endpoint') THEN TRUE
      WHEN ({cat}) IN ('image', 'video', 'audio', 'archive', 'code') THEN FALSE
      ELSE ({q}) IN ('medium', 'high') END"""


def sql_confidence_pct(status: str, ct: str) -> str:
    n = _NORM_SQL.format(ct=ct)
    mimes = ", ".join(f"'{m}'" for m in MIME_TO_CATEGORY)
    cat = sql_category(status, ct)
    return f"""CAST(CASE
      WHEN {status} >= 300 THEN 100
      WHEN {n} IN ({mimes}) THEN 95
      WHEN ({cat}) = 'unknown' THEN 30
      ELSE 70 END AS INTEGER)"""


def sql_size_class(clen: str) -> str:
    whens = "\n".join(
        f"WHEN {clen} < {limit} THEN '{name}'" for limit, name in SIZE_CLASSES
    )
    return f"CASE {whens} ELSE 'very_large' END"


# --- sequential Python twin (oracle parity for the crawl gate) -------------


def py_classify(
    status_code: int, content_type: str, content_length: int
) -> tuple[str, str, bool]:
    """(category, quality, is_enrichable) — exact twin of the columns."""
    n = content_type.split(";")[0].strip(" ").lower()
    if 300 <= status_code < 400:
        cat = "redirect"
    elif status_code >= 400:
        cat = "error"
    else:
        cat = MIME_TO_CATEGORY.get(n, "unknown")
    if status_code >= 400:
        q = "error"
    elif cat == "html_page":
        q = "low" if content_length < 500 else (
            "high" if content_length > 10000 else "medium"
        )
    elif cat == "document":
        q = "high" if content_length > 1000 else "low"
    else:
        q = "medium"
    if q == "error":
        e = False
    elif q == "low" and content_length < 100:
        e = False
    elif cat in ("html_page", "document", "api_endpoint"):
        e = True
    elif cat in ("image", "video", "audio", "archive", "code"):
        e = False
    else:
        e = q in ("medium", "high")
    return cat, q, e
