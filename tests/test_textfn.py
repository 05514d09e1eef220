"""Rolling-hash fingerprint: Spark UDF vs pure-Python reference."""

from __future__ import annotations

from scrapy_spark.functions.textfn import BASE, MOD, fingerprint_udf, py_fingerprint


def test_py_fingerprint_basics():
    assert py_fingerprint(None) is None
    assert py_fingerprint("") == 0
    assert py_fingerprint("a") == ord("a")
    assert py_fingerprint("ab") == (ord("a") * BASE + ord("b")) % MOD
    assert py_fingerprint("abc") != py_fingerprint("acb")  # order-sensitive


def test_udf_matches_python(spark):
    texts = ["hello world", "", "the quick brown fox", "hello world", "ünïcode ✓"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {r["i"]: r["fp"] for r in df.select("i", fingerprint_udf("t").alias("fp")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_fingerprint(t)
    assert got[0] == got[3]


def test_text_repetition_duplicated_5gram_path(spark):
    """The natural corpus never duplicates a 5-gram (dup_5gram_char_frac
    is 0.0 everywhere at every SF), so the nonzero branch is pinned here
    against hand-computed values on constructed repetitive documents —
    exactly what a Gopher-style filter exists to catch."""
    import pandas as pd
    from pyspark.sql import functions as F

    from scrapy_spark.entry_queries import QUERIES

    # doc 0: 'x y z w v' repeated 3x -> every 5-gram window that realigns
    # duplicates; doc 1: no repetition at all
    rep = " ".join(["x y z w v"] * 3)          # 15 words
    clean = "a b c d e f g h i j"              # 10 distinct words
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [rep, clean, "lonely"]}
    )
    df = spark.createDataFrame(pdf)

    fn = QUERIES["text_repetition"][0]
    import scrapy_spark.entry_queries as eq

    orig_load = eq.load
    try:
        eq.load = lambda sp, sf, name: df if name == "documents" else orig_load(sp, sf, name)
        out = {r["doc_id"]: r for r in fn(spark, "unused").collect()}
    finally:
        eq.load = orig_load

    r0, r1 = out[0], out[1]
    # doc 0: 15 words, 5 distinct; 11 5-gram windows, the 5 rotations of
    # (x y z w v) each appear >= 2 times -> all 11 windows are duplicated
    # occurrences of some repeated gram: dchars = 11 * 5 = 55; nc = 15
    assert r0["n_words"] == 15 and r0["n_distinct_words"] == 5
    assert r0["word_rep_ratio"] == round(1 - 5 / 15, 6)
    assert r0["dup_5gram_char_frac"] == round(55 / 15, 6)  # overlap > 1 by design
    # x y / y z / z w / w v all occur 3 times; tie broken by gram asc
    assert r0["top_bigram"] == "w v"
    assert r0["top_bigram_char_frac"] == round(3 * 2 / 15, 6)
    # doc 1: zero repetition on every signal
    assert r1["word_rep_ratio"] == 0.0
    assert r1["dup_5gram_char_frac"] == 0.0
    # doc 2 (single word): the row SURVIVES (left join) with null bigram
    # and 0.0 fractions — the per-doc combo grain never shrinks
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["top_bigram"] is None
    assert r2["top_bigram_char_frac"] == 0.0
    assert r2["dup_5gram_char_frac"] == 0.0


def test_text_pii_nonzero_branches_both_engines(spark):
    """The natural corpus has no PII (counts all 0 at every SF — the driver
    hash proves only vacuous agreement), so the match/redact branches are
    pinned here on constructed docs: Spark vs the python twin vs a LIVE
    DuckDB run of the registered oracle SQL on the same rows."""
    import duckdb
    import pandas as pd

    from scrapy_spark.entry_queries import QUERIES
    from scrapy_spark.functions.textfn import py_pii_counts

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "contact bob.smith+x@dept.example.edu or root@a.io now",
                "call +1 (860) 555-0199 from 192.168.0.1 said 10.0.0.255",
                "no pii here just words and the number 42",
                "revenue grew in 2020 - 2021 (see table 7)",
            ],
        }
    )
    df = spark.createDataFrame(docs)
    import scrapy_spark.entry_queries as eq

    fn, sql = QUERIES["text_pii"]
    orig_load = eq.load
    try:
        eq.load = lambda sp, sf, name: df if name == "documents" else orig_load(sp, sf, name)
        got = {r["doc_id"]: r for r in fn(spark, "unused").collect()}
    finally:
        eq.load = orig_load

    # python-twin counts agree per kind
    for i, text in zip(docs["doc_id"], docs["text"]):
        want = py_pii_counts(text)
        assert got[i]["n_emails"] == want["email"], (i, want)
        assert got[i]["n_phones"] == want["phone"], (i, want)
        assert got[i]["n_ipv4"] == want["ipv4"], (i, want)
    assert got[0]["n_emails"] == 2 and got[0]["n_pii"] == 2
    assert got[1]["n_phones"] == 1 and got[1]["n_ipv4"] == 2
    assert got[2]["n_pii"] == 0
    assert got[2]["redacted_len"] == len(docs["text"][2])  # untouched
    assert got[0]["redacted_len"] < len(docs["text"][0])  # really redacted
    # year ranges are NOT phones (8 digits < the 9-digit shape minimum)
    assert got[3]["n_pii"] == 0
    assert got[3]["redacted_len"] == len(docs["text"][3])

    # the SAME oracle SQL string, run live in DuckDB on the same rows
    con = duckdb.connect()
    con.register("documents", docs)
    want_rows = {r[0]: r for r in con.execute(sql).fetchall()}
    for i in docs["doc_id"]:
        g = got[i]
        assert (
            g["n_emails"], g["n_phones"], g["n_ipv4"], g["n_pii"],
            g["redacted_len"],
        ) == tuple(want_rows[i][1:]), (i, want_rows[i])
