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
