"""Content-analysis twins (functions/analysis.py): the Spark column
expressions and the generated DuckDB SQL must agree row-for-row — including
on adversarial inputs the synthetic corpus never produces (calendar-invalid
dates, boosted/tied indicator scores, out-of-range years)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from scrapy_spark.functions import analysis

FIXTURES = [
    # (text, url)
    ("Updated 2024-06-15 and also January 5, 2024.", "https://x.edu/news/1"),
    ("Invalid 2024-13-45 and February 30, 2024 stay out.", "https://x.edu/a"),
    ("Old 1912-01-01 and far 2077-12-31 are out of range.", "https://x.edu/b"),
    ("Spring 2024 semester, Fall 2023, Winter 2022.", "https://x.edu/course/c"),
    ("No dates at all here.", "https://x.edu/d"),
    ("Course syllabus with credits, prerequisite, CS 1501.",
     "https://x.edu/course/x"),
    ("Research grant funding, journal publication, abstract.",
     "https://x.edu/research/y"),
    ("policy guidelines compliance procedure", "https://x.edu/policy/z"),
    ("faculty professor department office hours", "https://x.edu/people/w"),
    # tie: research terms + policy terms equally weighted, no URL boost
    ("research journal policy guidelines", "https://x.edu/misc"),
    ("", "https://x.edu/empty"),
]


def _ddb(sql: str):
    con = duckdb.connect()
    con.register(
        "rows",
        pd.DataFrame(
            {"rid": range(len(FIXTURES)),
             "t": [t for t, _ in FIXTURES],
             "url": [u for _, u in FIXTURES]}
        ),
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


def _spark_rows(spark, cols):
    df = spark.createDataFrame(
        [(i, t, u) for i, (t, u) in enumerate(FIXTURES)],
        "rid long, t string, url string",
    )
    return [r.asDict() for r in df.select("rid", *cols.values()).collect()]


def test_recency_twins_agree(spark):
    got = {
        r["rid"]: r
        for r in _spark_rows(spark, analysis.recency_cols(F.col("t")))
    }
    want = {
        r["rid"]: r
        for r in _ddb(
            f"SELECT rid, {analysis.sql_recency_select('t')} FROM rows"
        )
    }
    assert set(got) == set(want)
    for rid in got:
        g, w = got[rid], want[rid]
        for k in ("date_count", "most_recent_date", "days_since_update",
                  "has_recent_content", "has_very_recent_content"):
            assert g[k] == w[k], (rid, k, g, w)
    # the adversarial rows really exercise the edge: invalid + out-of-range
    # dates mine NOTHING in either engine
    assert got[1]["date_count"] == 0
    assert got[2]["date_count"] == 0
    assert got[3]["date_count"] == 3  # all three semesters anchor-dated


def test_academic_twins_agree(spark):
    got = {
        r["rid"]: r
        for r in _spark_rows(
            spark, analysis.academic_cols(F.col("t"), F.col("url"))
        )
    }
    want = {
        r["rid"]: r
        for r in _ddb(
            f"SELECT rid, {analysis.sql_academic_select('t', 'url')} FROM rows"
        )
    }
    for rid in got:
        g, w = got[rid], want[rid]
        for k in ("course_score2", "research_score2", "policy_score2",
                  "faculty_score2", "content_type", "confidence_milli",
                  "semester"):
            assert g[k] == w[k], (rid, k, g, w)
    # URL-path boost applied (doubled units * 3 // 2)
    assert got[5]["content_type"] == "course"
    assert got[6]["content_type"] == "research"
    # tie without URL boost resolves by the reference's first-max order
    tie = got[9]
    assert tie["research_score2"] == tie["policy_score2"]
    assert tie["content_type"] == "research"
    assert got[10]["content_type"] == "general"


def test_recency_as_of_parameter(spark):
    """as_of is a real parameter on both twins (default stays pinned):
    shifting the anchor by 100 days shifts days_since_update by exactly
    100 and can flip the recent flags — in BOTH engines identically."""
    shifted = "2024-10-09"  # AS_OF 2024-07-01 + 100 days
    got = {
        r["rid"]: r
        for r in _spark_rows(
            spark, analysis.recency_cols(F.col("t"), as_of=shifted)
        )
    }
    want = {
        r["rid"]: r
        for r in _ddb(
            f"SELECT rid, {analysis.sql_recency_select('t', as_of=shifted)} FROM rows"
        )
    }
    base = {
        r["rid"]: r
        for r in _spark_rows(spark, analysis.recency_cols(F.col("t")))
    }
    for rid in got:
        for k in ("date_count", "most_recent_date", "days_since_update",
                  "has_recent_content", "has_very_recent_content"):
            assert got[rid][k] == want[rid][k], (rid, k)
        if base[rid]["days_since_update"] is not None:
            assert got[rid]["days_since_update"] == base[rid]["days_since_update"] + 100
