"""Classification twins (functions/classify.py): Spark column chains, the
generated DuckDB CASE chains, and the sequential python twin must agree on
edge inputs — header parameters, casing, unknown mimes, status boundaries,
length thresholds — not just the synthetic corpus mix."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from scrapy_spark.functions import classify

FIXTURES = [
    # (status, content_type, content_length)
    (200, "text/html", 499),            # low boundary
    (200, "text/html", 500),            # medium boundary
    (200, "text/html", 10000),          # medium (not >)
    (200, "text/html", 10001),          # high boundary
    (200, "TEXT/HTML; Charset=UTF-8", 2000),  # casing + params normalize
    (200, " text/html ", 50),           # spaces trimmed; low & tiny
    (200, "application/pdf", 1000),     # document low boundary
    (200, "application/pdf", 1001),     # document high
    (200, "application/json", 10),      # api always medium, enrichable
    (200, "image/png", 5000),           # media: not enrichable
    (200, "text/css", 5000),            # code: not enrichable
    (200, "application/zip", 5000),     # archive
    (200, "text/csv", 5000),            # data -> quality medium -> enrichable
    (200, "application/x-unknown", 64), # unknown mime
    (200, "noslash", 2048),             # no family separator
    (200, "", 0),                       # empty content type
    (299, "text/html", 2000),           # still success band
    (300, "text/html", 2000),           # redirect boundary
    (399, "", 0),                       # redirect upper edge
    (400, "text/html", 99999),          # error boundary
    (404, "", 0),
    (599, None, 0),                     # transient + NULL content type
]


def test_classify_three_twins_agree(spark):
    rows = [(i, s, ct, n) for i, (s, ct, n) in enumerate(FIXTURES)]
    df = spark.createDataFrame(
        rows, "rid long, st int, ct string, clen long"
    )
    s, c0, n = F.col("st"), F.coalesce(F.col("ct"), F.lit("")), F.col("clen")
    out = (
        df.withColumn("category", classify.category_col(s, c0))
        .withColumn(
            "quality", classify.quality_col(s, c0, n, category=F.col("category"))
        )
        .withColumn(
            "is_enrichable",
            classify.is_enrichable_col(
                s, c0, n, category=F.col("category"), quality=F.col("quality")
            ),
        )
        .withColumn("mime_family", classify.mime_family_col(s, c0))
        .withColumn("confidence_pct", classify.confidence_pct_col(s, c0))
        .withColumn("size_class", classify.size_class_col(n))
    )
    got = {r["rid"]: r.asDict() for r in out.collect()}

    con = duckdb.connect()
    con.register(
        "rows",
        pd.DataFrame(rows, columns=["rid", "st", "ct", "clen"]),
    )
    ct = "coalesce(ct, '')"
    res = con.execute(f"""
        SELECT rid,
               {classify.sql_category('st', ct)} AS category,
               {classify.sql_quality('st', ct, 'clen')} AS quality,
               {classify.sql_is_enrichable('st', ct, 'clen')} AS is_enrichable,
               {classify.sql_mime_family('st', ct)} AS mime_family,
               {classify.sql_confidence_pct('st', ct)} AS confidence_pct,
               {classify.sql_size_class('clen')} AS size_class
        FROM rows""")
    cols = [d[0] for d in res.description]
    want = {r[0]: dict(zip(cols, r)) for r in res.fetchall()}

    for rid, (st, ctv, clen) in enumerate(FIXTURES):
        g, w = got[rid], want[rid]
        for k in ("category", "quality", "is_enrichable", "mime_family",
                  "confidence_pct", "size_class"):
            assert g[k] == w[k], (rid, k, FIXTURES[rid], g, w)
        # python twin (the crawl-oracle path)
        pcat, pq, pe = classify.py_classify(st, ctv or "", clen)
        assert (g["category"], g["quality"], g["is_enrichable"]) == (
            pcat, pq, pe
        ), (rid, FIXTURES[rid])

    # spot-pin the semantics, not just twin agreement
    assert got[0]["quality"] == "low" and got[3]["quality"] == "high"
    assert got[4]["category"] == "html_page"           # normalization worked
    assert got[5]["is_enrichable"] is False            # low AND < 100 bytes
    assert got[6]["quality"] == "low" and got[6]["is_enrichable"] is True
    assert got[9]["is_enrichable"] is False            # media skipped
    assert got[13]["category"] == "unknown"
    assert got[13]["confidence_pct"] == 30
    assert got[17]["category"] == "redirect"
    assert got[19]["quality"] == "error"
