"""Refresh-priority operator (operators/refresh.py) vs a pure-Python twin of
the reference formula (data_refresh.py:131-167)."""

from __future__ import annotations

import pandas as pd

from scrapy_spark.operators.refresh import refresh_candidates, refresh_priority

PRIO = ["uconn.edu"]
INTERVAL = 24


def _py_priority(row) -> int:
    p = 0
    if any(d in row["host"] for d in PRIO):
        p += 100
    if (not row["is_valid"]) or row["error_type"] is not None:
        p += 50
    if row["age_hours"] is None:
        p += 10  # unknown age: reference's except-branch "maybe refresh"
    elif row["age_hours"] > INTERVAL:
        p += max(0, min(25, int(row["age_hours"] // 24)))
    if row["is_valid"] and row["status_code"] == 200:
        p -= 10
    return p


def _rows():
    data = [
        # healthy fresh priority-domain page: 100 - 10 = 90
        dict(url="https://a.uconn.edu/1", host="a.uconn.edu", is_valid=True,
             error_type=None, status_code=200, age_hours=1.0),
        # failed page off-domain: 50
        dict(url="https://other.org/2", host="other.org", is_valid=False,
             error_type="not_found", status_code=404, age_hours=1.0),
        # stale healthy off-domain: age 10 days -> 10 - 10 = 0 (excluded)
        dict(url="https://other.org/3", host="other.org", is_valid=True,
             error_type=None, status_code=200, age_hours=240.0),
        # very stale healthy off-domain: capped 25 - 10 = 15
        dict(url="https://other.org/4", host="other.org", is_valid=True,
             error_type=None, status_code=200, age_hours=24.0 * 400),
        # fresh healthy off-domain: -10 (excluded)
        dict(url="https://other.org/5", host="other.org", is_valid=True,
             error_type=None, status_code=200, age_hours=2.0),
        # failed AND priority AND stale: 100 + 50 + points
        dict(url="https://b.uconn.edu/6", host="b.uconn.edu", is_valid=False,
             error_type="server_error", status_code=503, age_hours=72.0),
    ]
    return data


def test_priority_matches_reference_formula(spark):
    # explicit schema (not pd.DataFrame) so the None age reaches Spark as
    # NULL, not NaN — the +10 unknown-age branch tests isNull
    data = _rows() + [
        dict(url="https://other.org/null_age", host="other.org", is_valid=True,
             error_type=None, status_code=200, age_hours=None),
    ]
    df = spark.createDataFrame(
        [(r["url"], r["host"], r["is_valid"], r["error_type"],
          r["status_code"], r["age_hours"]) for r in data],
        "url string, host string, is_valid boolean, error_type string, "
        "status_code int, age_hours double",
    ).withColumn("priority", refresh_priority(PRIO, INTERVAL))
    got = {r["url"]: r["priority"] for r in df.collect()}
    for row in data:
        assert got[row["url"]] == _py_priority(row), row["url"]


def test_priority_null_age_maybe_refresh(spark):
    """Unknown age = reference's except-branch (+10 'maybe refresh',
    data_refresh.py:156), not 0."""
    df = spark.createDataFrame(
        [
            ("https://other.org/n", "other.org", True, None, 200, None),
            ("https://other.org/f", "other.org", True, None, 200, 1.0),
        ],
        "url string, host string, is_valid boolean, error_type string, "
        "status_code int, age_hours double",
    ).withColumn("priority", refresh_priority(PRIO, INTERVAL))
    got = {r["url"]: r["priority"] for r in df.collect()}
    assert got["https://other.org/n"] == 10 - 10  # +10 unknown age, -10 healthy
    assert got["https://other.org/f"] == -10


def test_refresh_candidates_global_order(spark):
    """Unbudgeted path promises a global total order across partitions."""
    data = _rows()
    df = spark.createDataFrame(pd.DataFrame(data)).repartition(4)
    out = refresh_candidates(df, PRIO, INTERVAL).collect()
    pris = [(r["priority"], r["url"]) for r in out]
    assert pris == sorted(pris, key=lambda t: (-t[0], t[1]))


def test_refresh_candidates_selection_and_order(spark):
    data = _rows()
    df = spark.createDataFrame(pd.DataFrame(data))
    out = [r["url"] for r in refresh_candidates(df, PRIO, INTERVAL).collect()]
    # excluded: /3 (priority 0, healthy) and /5 (negative, healthy)
    want_set = {"https://a.uconn.edu/1", "https://other.org/2",
                "https://other.org/4", "https://b.uconn.edu/6"}
    assert set(out) == want_set
    # budgeted: top-2 by (priority desc, url asc) -> /6 (153) then /1 (90)
    top2 = [r["url"] for r in refresh_candidates(df, PRIO, INTERVAL, limit=2).collect()]
    assert set(top2) == {"https://b.uconn.edu/6", "https://a.uconn.edu/1"}
