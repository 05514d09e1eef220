"""Parameterized ANN (operators/ann.py) and posting-list-capped near-dup
(operators/neardup.py): recall vs the brute-force baseline, bucket
parameterization, and bounded pair counts under a hot shingle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from scrapy_spark.operators.ann import brute_force_topk, lsh_recall, lsh_topk
from scrapy_spark.operators.neardup import ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.001"


def _vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("q"),
    )


def test_lsh_recall_tradeoff(spark):
    """More bits -> smaller buckets -> recall monotonically non-increasing;
    1 bit halves the space and must keep most of the exact top-k."""
    v = _vecs(spark).cache()
    pred = F.col("vec_id") < 20
    recalls = {
        nb: lsh_recall(v, pred, 3, nb).collect()[0]["recall"] for nb in (1, 2, 4)
    }
    v.unpersist()
    assert recalls[1] >= 0.5, recalls
    assert recalls[1] >= recalls[2] >= recalls[4], recalls
    assert recalls[4] > 0.0, recalls


def test_lsh_subset_of_bucketmates(spark):
    """Every LSH neighbor must share the query's bucket — i.e. lsh_topk
    results are a subset of brute-force results restricted to the bucket."""
    v = _vecs(spark)
    pred = F.col("vec_id") < 10
    approx = lsh_topk(v, pred, 3, n_bits=2)
    exact = brute_force_topk(v, pred, 3)
    # approx pairs carry the same exact cosine values as brute force computes
    j = approx.alias("x").join(
        exact.alias("e"),
        (F.col("x.query_id") == F.col("e.query_id"))
        & (F.col("x.neighbor_id") == F.col("e.neighbor_id")),
    )
    for r in j.select("x.cosine", "e.cosine").collect():
        assert r[0] == r[1]


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.split(F.col("text"), " "), i),
                    F.element_at(F.split(F.col("text"), " "), i + 1),
                    F.element_at(F.split(F.col("text"), " "), i + 2),
                ),
            )
        ).alias("shingle"),
    ).distinct()


def test_ngram_cap_bounds_hot_shingle_pairs(spark):
    """A boilerplate shingle in all 40 docs creates 40*39/2 = 780 candidate
    pairs uncapped; with max_doc_freq=10 it contributes none."""
    boiler = "copyright uconn edu"
    texts = [f"{boiler} unique{i} token{i} word{i}" for i in range(40)]
    sh = _docs(spark, texts)
    uncapped = ngram_jaccard_pairs(sh, threshold=0.01)
    capped = ngram_jaccard_pairs(sh, threshold=0.01, max_doc_freq=10)
    assert uncapped.count() == 780  # every pair shares only the hot shingle
    assert capped.count() == 0  # hot shingle dropped -> no candidates at all


def test_ngram_cap_noop_on_cold_corpus(spark):
    """With no shingle above the cap, capped == uncapped exactly."""
    texts = [f"alpha{i} beta{i} gamma{i} delta{i} shared common tail" for i in range(8)]
    sh = _docs(spark, texts)
    a = sorted(map(tuple, ngram_jaccard_pairs(sh, 0.01).collect()))
    b = sorted(map(tuple, ngram_jaccard_pairs(sh, 0.01, max_doc_freq=100).collect()))
    assert a == b and len(a) > 0


def test_ivf_clusters_partition_and_recall(spark):
    """IVF: every vector lands in exactly one list; search is cluster-local
    (all reported neighbors share the query's list); recall vs brute force
    is nonzero."""
    from pyspark.sql import functions as F2

    from scrapy_spark.operators.ann import (
        brute_force_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    v = _vecs(spark).cache()
    cent = v.filter(F2.col("vec_id") < 8).select(
        F2.col("vec_id").cast("int").alias("cid"), F2.col("q").alias("s")
    )
    for _ in range(2):
        cent = ivf_centroids(ivf_assign(v, cent))
    assigned = ivf_assign(v, cent)
    n = v.count()
    assert assigned.count() == n  # total partition, one list per vector
    assert assigned.select("vec_id").distinct().count() == n
    cl = {r["vec_id"]: r["cid"] for r in assigned.select("vec_id", "cid").collect()}
    pred = F2.col("vec_id") < 20
    approx = ivf_topk(v, pred, 3, n_clusters=8, iters=2).collect()
    for r in approx:
        assert cl[r["query_id"]] == cl[r["neighbor_id"]]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(v, pred, 3).collect()}
    hits = sum((r["query_id"], r["neighbor_id"]) in exact for r in approx)
    assert hits > 0
    v.unpersist()


def test_ivf_nprobe_improves_recall(spark):
    """The IVF recall knob: probing more lists can only add candidates, so
    recall is monotone in n_probe (and hits the brute-force set eventually
    as n_probe -> n_clusters)."""
    from pyspark.sql import functions as F2

    from scrapy_spark.operators.ann import brute_force_topk, ivf_topk

    v = _vecs(spark).cache()
    pred = F2.col("vec_id") < 20
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(v, pred, 3).collect()}
    recalls = {}
    for p in (1, 2, 8):
        approx = ivf_topk(v, pred, 3, n_clusters=8, iters=2, n_probe=p).collect()
        recalls[p] = sum((r["query_id"], r["neighbor_id"]) in exact for r in approx)
    v.unpersist()
    assert recalls[1] <= recalls[2] <= recalls[8], recalls
    assert recalls[8] == len(exact)  # probing every list == brute force
