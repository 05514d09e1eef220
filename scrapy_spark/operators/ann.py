"""Approximate nearest neighbor over an embedding column (array<long>,
pre-quantized to exact ints).

- ``brute_force_topk``: the exactness baseline — all (query, candidate)
  pairs, exact integer dot products, cosine rounded 6dp, total-order top-k.
- ``lsh_sign_buckets`` + ``lsh_topk``: the 100 TB path — sign-bit LSH over
  the first ``n_bits`` dimensions (a fixed axis-aligned instance of
  random-hyperplane LSH), 2^n_bits buckets; the candidate join is
  bucket-equi instead of all-pairs, so the shuffle key is the bucket id.
  ``n_bits`` is a PARAMETER: bucket count must scale with the corpus (at
  10^9 vectors, 8 buckets is all-pairs/8; ~2^20 buckets keeps candidate
  lists bounded). Recall vs the brute-force baseline is asserted in
  tests/test_ann.py and surfaced as the ann_lsh_recall driver query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(left: str, right: str) -> Column:
    """Exact integer dot product of two array<long> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(F.col(left), F.col(right), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _cosine() -> Column:
    return F.round(
        F.col("dot")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        6,
    )


def lsh_sign_buckets(vecs: DataFrame, n_bits: int, vec_col: str = "q") -> DataFrame:
    """Assign each vector to one of 2^n_bits sign buckets (dims 1..n_bits)."""
    b: Column = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(
            F.element_at(vec_col, i + 1) > 0, F.lit(1 << (n_bits - 1 - i))
        ).otherwise(F.lit(0))
    return vecs.withColumn("bucket", b)


def _pairs_topk(pairs: DataFrame, k: int) -> DataFrame:
    cos = _cosine()
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def brute_force_topk(vecs: DataFrame, query_pred: Column, k: int) -> DataFrame:
    """Exact cosine top-k: queries x all candidates (the baseline)."""
    a = vecs.filter(query_pred).alias("a")
    c = vecs.alias("c")
    pairs = a.join(c, F.col("a.vec_id") != F.col("c.vec_id")).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _dot("a.q", "c.q").alias("dot"),
        _dot("a.q", "a.q").alias("na"),
        _dot("c.q", "c.q").alias("nb"),
    )
    return _pairs_topk(pairs, k)


def lsh_topk(vecs: DataFrame, query_pred: Column, k: int, n_bits: int) -> DataFrame:
    """Approximate cosine top-k searched only inside the query's LSH bucket."""
    b = lsh_sign_buckets(vecs, n_bits)
    a = b.filter(query_pred).alias("a")
    c = b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _dot("a.q", "c.q").alias("dot"),
        _dot("a.q", "a.q").alias("na"),
        _dot("c.q", "c.q").alias("nb"),
    )
    return _pairs_topk(pairs, k)


def _recall_vs_exact(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """One-row DataFrame: fraction of brute-force top-k pairs the approx
    variant recovers (order-insensitive set recall over all queries)."""
    exact = exact.select("query_id", "neighbor_id")
    approx = approx.select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return exact.agg(F.count("*").alias("n_exact")).crossJoin(
        hits.agg(F.count("*").alias("n_hit"))
    ).select(
        F.round(F.col("n_hit") / F.col("n_exact").cast("double"), 6).alias("recall")
    )


def lsh_recall(
    vecs: DataFrame, query_pred: Column, k: int, n_bits: int
) -> DataFrame:
    return _recall_vs_exact(
        brute_force_topk(vecs, query_pred, k), lsh_topk(vecs, query_pred, k, n_bits)
    )


def ivf_assign(
    vecs: DataFrame, centroids: DataFrame, n_probe: int = 1
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by
    6dp-rounded cosine (tie-break: centroid id). Centroids are INTEGER SUM
    vectors — the cluster mean's direction with the 1/n scale cancelled, so
    every dot product stays exact and the assignment is
    engine/order-independent. Building uses n_probe=1 (each vector lives in
    ONE posting list); searching may probe several lists (the standard IVF
    recall knob)."""
    pairs = vecs.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "q",
        "cid",
        _dot("q", "s").alias("dot"),
        _dot("q", "q").alias("na"),
        _dot("s", "s").alias("nb"),
    )
    cos = _cosine()
    w = Window.partitionBy("vec_id").orderBy(cos.desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_probe)
        .select("vec_id", "q", "cid")
    )


def ivf_centroids(assigned: DataFrame) -> DataFrame:
    """Lloyd update with exact arithmetic: elementwise bigint sums of the
    assigned vectors (posexplode -> groupBy(cid, dim) -> rebuild ordered)."""
    sums = (
        assigned.select("cid", F.posexplode("q").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.sum("val").alias("sv"))
    )
    return sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sv"))), lambda x: x["sv"]
        ).alias("s")
    )


def ivf_topk(
    vecs: DataFrame,
    query_pred: Column,
    k: int,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 1,
) -> DataFrame:
    """IVF ANN (the second scale path next to sign-LSH): fixed-iteration
    integer-Lloyd clustering, then neighbors searched only inside the
    query's cluster (nprobe=1). Deterministic end-to-end: seeds are the
    lowest vec_ids, assignments use rounded cosine with id tie-breaks,
    centroid updates are exact integer sums — hash-identical to the
    unrolled DuckDB CTE oracle."""
    cent = vecs.filter(F.col("vec_id") < n_clusters).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("q").alias("s")
    )
    for _ in range(iters):
        cent = ivf_centroids(ivf_assign(vecs, cent))
    assigned = ivf_assign(vecs, cent)
    # queries probe their n_probe nearest lists; candidates stay in their
    # single home list, so each (query, neighbor) pair matches at most once
    a = ivf_assign(vecs.filter(query_pred), cent, n_probe=n_probe).alias("a")
    c = assigned.alias("c")
    pairs = a.join(
        c,
        (F.col("a.cid") == F.col("c.cid")) & (F.col("a.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _dot("a.q", "c.q").alias("dot"),
        _dot("a.q", "a.q").alias("na"),
        _dot("c.q", "c.q").alias("nb"),
    )
    return _pairs_topk(pairs, k)


def ivf_recall(
    vecs: DataFrame,
    query_pred: Column,
    k: int,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 1,
) -> DataFrame:
    """Recall of the IVF variant vs the brute-force baseline — evidences the
    n_probe knob's recall/cost trade (more probed lists -> monotonically
    non-decreasing recall; asserted in tests/test_ann.py)."""
    return _recall_vs_exact(
        brute_force_topk(vecs, query_pred, k),
        ivf_topk(vecs, query_pred, k, n_clusters, iters, n_probe),
    )
