"""Near-duplicate candidate generation over shingle inverted indexes.

The shingle self-join (doc pairs sharing a shingle) is the classic
inverted-index join; its 100 TB failure mode is a hot posting list — a
boilerplate shingle appearing in K documents contributes K^2 candidate
pairs. ``cap_posting_lists`` drops shingles with document frequency >
``max_doc_freq`` BEFORE the self-join, bounding any single shingle's pair
contribution to max_doc_freq^2 and making total pair count linear in corpus
size for a fixed cap.

Jaccard is computed over the doc-frequency-filtered shingle universe: set
sizes and intersections both use the capped sets, so the score is a true
Jaccard of those sets (standard near-dup practice — ubiquitous shingles
carry no dedup signal anyway).

Reference parity: the reference dedups exact URL/content hashes only
(url_deduplication.py); n-gram near-dup is part of the training-data
pipeline surface this engine adds (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize as _cut


def cap_posting_lists(
    shingles: DataFrame, max_doc_freq: int, keys: list[str] | None = None
) -> DataFrame:
    """Drop bucket keys whose posting list exceeds ``max_doc_freq`` rows.

    ``keys`` names the bucket key columns (default the classic
    ``["shingle"]``; imageops passes ``["band_idx", "band_val"]`` for hot
    phash bands). The hot-key list is tiny (only violators), so the
    anti-join broadcasts; the frequency count is one linear groupBy."""
    keys = keys or ["shingle"]
    hot = (
        shingles.groupBy(*keys)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select(*keys)
    )
    return shingles.join(F.broadcast(hot), keys, "left_anti")


def minhash_components(
    bands: DataFrame, iterations: int = 4, materialize: bool = True
) -> DataFrame:
    """Connected components over the doc↔band-bucket graph by iterated
    min-label propagation — the FIXPOINT extension of the single-pass cluster
    assignment (dedup_minhash_clusters): chains A~B (band 1), B~C (band 2)
    collapse to one component even though no single bucket holds all three.

    ``bands``: (doc_id, bv) rows, one per (doc, band value). Each iteration
    is two linear aggregations (bucket min over member labels, then doc min
    over bucket minima) — never a pair enumeration or self-join; label values
    only decrease, so a fixed iteration count is deterministic and each
    iteration propagates labels one bucket-hop further (diameter-bounded
    convergence; the synthetic corpus' components have small diameter,
    asserted in tests). Labels ride lineage cuts (plans/materialize)
    between iterations exactly like the PageRank loop; ``materialize``
    cuts the bands table itself — it is consumed twice per iteration, and when it
    arrives as a live plan (shingle explode + minhash aggs) re-deriving it
    2*iterations times dominates the cost. On a cluster, set the
    materializer staging dir (plans/materialize) to make the cuts durable
    parquet instead of executor-local blocks."""
    if materialize:
        bands = _cut(bands, name="lsh-bands")
    labels = bands.groupBy("doc_id").agg(F.min("doc_id").alias("label"))
    for _ in range(iterations):
        labels = _cut(labels, name="lsh-labels")
        bucket_min = (
            bands.join(labels, "doc_id")
            .groupBy("bv")
            .agg(F.min("label").alias("bmin"))
        )
        labels = (
            bands.join(bucket_min, "bv")
            .groupBy("doc_id")
            .agg(F.min("bmin").alias("label"))
        )
    return labels.select("doc_id", F.col("label").alias("component_id"))


def embedding_neardup_pairs(
    vecs: DataFrame, threshold: float = 0.98, sub_bits: int = 8
) -> DataFrame:
    """Embedding-cosine near-dup pairs over (vec_id, label, q:array<long>)
    rows, blocked by (label, sign-LSH sub-bucket).

    The coarse label alone is NOT a safe block: pair enumeration is quadratic
    *within* a block, so one hot label at 100 TB contributes K^2 pairs
    (round-3 verdict finding #4). Composing ``sub_bits`` sign bits of the
    vector inside the label (operators/ann.lsh_sign_buckets) splits every
    label into up to 2^sub_bits sub-blocks, and the join key becomes
    (label, bucket) — still one hash shuffle, with per-block size divided
    by the bucket fan-out. Near-identical vectors (cosine >= 0.98) agree on
    almost all coordinate signs, so the recall cost is the standard sign-LSH
    trade; the DuckDB oracle applies the identical bucket expression, so the
    contract is exact in both engines. ``sub_bits`` scales with the corpus
    like ann.py's n_bits."""
    from .ann import _dot, lsh_sign_buckets

    b = lsh_sign_buckets(vecs, sub_bits)
    a, c = b.alias("a"), b.alias("b")
    cos = F.round(
        _dot("a.q", "b.q")
        / (
            F.sqrt(_dot("a.q", "a.q").cast("double"))
            * F.sqrt(_dot("b.q", "b.q").cast("double"))
        ),
        6,
    )
    return (
        a.join(
            c,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ngram_jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """(doc_id, shingle)-distinct rows -> near-dup pairs with Jaccard score.

    Candidate pairs share at least one (capped) shingle — an implicit LSH on
    exact shingles; the join key is the shingle, so the shuffle is the
    inverted index itself.

    ``materialize=True`` (the default — a live shingle plan has FOUR
    downstream consumers here: hot-list agg, both self-join branches,
    per-doc sizes, and without a cut each one re-derives the shingle
    explode+distinct from the raw text, the dominant cost) cuts the
    (capped) shingle table before fan-out. Pass ``materialize=False`` only
    when the input is already materialized (a table read / checkpointed
    plan). On a cluster, the materializer staging dir makes cuts durable."""
    if max_doc_freq is not None:
        if materialize:
            shingles = _cut(shingles, name="shingles-raw")
        shingles = cap_posting_lists(shingles, max_doc_freq)
    if materialize:
        shingles = _cut(shingles, name="shingles")
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("common") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("common")
    ).cast("double")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    shingles: DataFrame,
    threshold: float = 0.9,
    max_doc_freq: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Asymmetric containment near-dup: C(A in B) = |A∩B| / |A| — the
    direction Jaccard misses (a short doc quoted wholesale inside a long
    one scores high containment but low Jaccard; training pipelines drop
    the contained copy). Same inverted-index candidate join and capping
    discipline as ngram_jaccard_pairs; one extra column each way. A pair
    is emitted when EITHER direction clears ``threshold``; which side is
    contained is read off the two columns."""
    if max_doc_freq is not None:
        if materialize:
            shingles = _cut(shingles, name="cont-shingles-raw")
        shingles = cap_posting_lists(shingles, max_doc_freq)
    if materialize:
        shingles = _cut(shingles, name="cont-shingles")
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    c_ab = F.col("common") / F.col("sa.sz").cast("double")
    c_ba = F.col("common") / F.col("sb.sz").cast("double")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter((c_ab >= threshold) | (c_ba >= threshold))
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 6).alias("containment_ab"),
            F.round(c_ba, 6).alias("containment_ba"),
        )
    )


def duplicate_spans(grams: DataFrame, k: int) -> DataFrame:
    """Span-level EXACT substring dedup — the distributed recast of the
    suffix-array dedup in "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2021): find every maximal token span whose
    k-grams all recur in OTHER documents, so the pipeline can cut the span
    instead of dropping the whole doc (the doc-grain ops ngram_jaccard /
    containment decide doc fate; this one localizes the overlap).

    ``grams`` = (doc_id, pos, g): one row per k-gram occurrence, pos
    1-based. A k-gram is *duplicated* when it appears in >= 2 distinct
    docs; runs of duplicated positions closer than k tokens merge into one
    maximal span (gaps-and-islands with a lag window).

    100 TB shape — LINEAR, no pair join anywhere: the doc-frequency
    aggregate is one hash groupBy on the gram (at scale, group on
    xxhash64(g) instead of the text to shrink the shuffle key — same
    result, collision odds ~n^2/2^64); marking positions is one equi
    semi-join; the lag/sum windows partition BY DOC, so no partition
    outgrows a document. A boilerplate gram in 10^6 docs contributes 10^6
    linear rows here, versus 10^12 pairs in a naive pair join.

    Output grain: one row per (doc_id, maximal span):
    (doc_id, span_start, span_end, span_tokens, n_dup_grams)."""
    from pyspark.sql import Window

    grams = _cut(grams, name="dup-span-grams")  # feeds freq + position mark
    freq2 = (
        grams.select("doc_id", "g").distinct()
        .groupBy("g").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    dup = grams.join(freq2, "g", "left_semi").select("doc_id", "pos")
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    w_cum = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w_lag) <= k, F.lit(0))
        .otherwise(F.lit(1)),
    )
    islands = flagged.withColumn("island", F.sum("brk").over(w_cum))
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
        (F.max("pos") - F.min("pos") + k).cast("long").alias("span_tokens"),
        F.count("*").cast("long").alias("n_dup_grams"),
    ).drop("island")
