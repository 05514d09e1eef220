"""Two-phase deterministic global top-k (W7 and every top-k query site).

A bare ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
FULL input through one task — milliseconds at sf0.1, but at 100x the
vocabulary/user/frontier cardinality lands on a single executor. The same
result is computed scalably in two phases:

1. **local**: sort each partition by the total order and keep only its first
   k rows. This stays JVM-side with no shuffle:
   ``monotonically_increasing_id()`` encodes the within-partition row
   position in its low 33 bits, and because the expression is
   non-deterministic Catalyst never reorders it below the sort, so after
   ``sortWithinPartitions`` the masked id IS the per-partition rank.
2. **global**: one final single-partition sort of the <= k x P survivors
   assigns the rank.

Output is identical to the naive global window for any *total* order: every
row of the global top-k is necessarily within the top-k of its own
partition. (Limit: < 2^33 rows per partition — the id's row-counter width.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_POS_MASK = (1 << 33) - 1

# Correctness of phase 1 rests on an optimizer contract: Catalyst must keep
# the partition-local Sort (EliminateSorts must not drop it) and must not
# reorder the non-deterministic monotonically_increasing_id projection below
# it. Spark honors both today (non-deterministic expressions pin ordering);
# a Spark upgrade could silently break it, so we probe the optimized plan of
# a canonical tiny query ONCE per SparkSession (analysis only — no job) and
# fail loudly if the local Sort was eliminated. Pinned equality/plan tests
# live in tests/test_topk.py.
_GUARDED_SESSIONS: set[int] = set()


def _optimizer_guard(spark) -> None:
    key = id(spark)
    if key in _GUARDED_SESSIONS:
        return
    probe = (
        spark.range(0, 2)
        .repartition(2)
        .sortWithinPartitions("id")
        .withColumn(
            "_pos", F.monotonically_increasing_id().bitwiseAND(F.lit(_POS_MASK))
        )
        .filter(F.col("_pos") < 1)
    )
    plan = probe._jdf.queryExecution().optimizedPlan().toString()
    if "Sort [" not in plan:
        raise RuntimeError(
            "topk_total_order optimizer contract violated: this Spark "
            "version's optimizer eliminates the partition-local Sort beneath "
            "the monotonically_increasing_id projection, so two-phase top-k "
            "phase-1 ranks would be garbage. Pin Spark or rewrite phase 1 "
            "(e.g. mapInPandas local heap)."
        )
    _GUARDED_SESSIONS.add(key)


def grouped_total_rank(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    rank_col: str,
    size_col: str | None = None,
) -> DataFrame:
    """Exact 1-based rank of EVERY row within its group under a total order,
    without ever sorting a whole group in one task.

    The naive shape — ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    — funnels each group through one task, so parallelism is bounded by the
    group count and per-task width by the largest group (the
    embed_diversity_sample scale defect from the round-6 verdict). This
    computes identical ranks with bounded per-task width for ANY group-size
    distribution:

    1. **range-partition** on ``(group asc..., order...)`` — each partition
       holds a contiguous slice of the lexicographic total order, so one
       group spans a RUN of partitions and a giant group simply spans more
       of them (a (pid, group) cell count of at most P + G - 1).
    2. **local positions**: ``sortWithinPartitions`` + the
       ``monotonically_increasing_id`` contract from :func:`topk_total_order`
       — the id's low 33 bits are the within-partition position and its high
       bits the partition id. The frame is lineage-cut here
       (plans/materialize) because range partitioning samples for boundaries
       and the id is non-deterministic: both downstream consumers must see
       ONE materialization.
    3. **tiny offset table**: ``groupBy(pid, group)`` → (first position,
       count); per-group running-count offsets via a window over THIS
       ≤ P + G - 1 row table (never the data), broadcast-joined back.
       ``rank = pos - first + offset + 1``.

    ``order_by`` must be a TOTAL order within each group (unique tie-break)
    — equal keys could straddle a range boundary and make ranks ambiguous.
    ``size_col``, if given, emits the group size from the same offset table
    (saves the caller a second count-over-group window).
    """
    _optimizer_guard(df.sparkSession)
    from ..plans.materialize import materialize as _cut

    sort_cols = [F.col(g).asc() for g in group_cols] + list(order_by)
    positioned = _cut(
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_gid", F.monotonically_increasing_id())
        .withColumn("_pos", F.col("_gid").bitwiseAND(F.lit(_POS_MASK)))
        .withColumn("_pid", F.shiftright("_gid", 33))
        .drop("_gid"),
        name="grouped-rank",
    )
    cells = positioned.groupBy("_pid", *group_cols).agg(
        F.min("_pos").alias("_first"), F.count("*").alias("_cnt")
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = cells.select(
        "_pid",
        *group_cols,
        "_first",
        F.coalesce(F.sum("_cnt").over(w_run), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy(*group_cols)).alias("_gsz"),
    )
    out = positioned.join(F.broadcast(offsets), ["_pid", *group_cols]).withColumn(
        rank_col, (F.col("_pos") - F.col("_first") + F.col("_off") + 1).cast("int")
    )
    if size_col is not None:
        out = out.withColumn(size_col, F.col("_gsz"))
    return out.drop("_pid", "_pos", "_first", "_off", "_gsz")


def topk_total_order(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Global top-k of ``df`` under the total order ``order_by``.

    ``order_by`` must be a TOTAL order (include a unique tie-break column) or
    the selection is ambiguous. If ``rank_col`` is given, the 1-based global
    rank is emitted under that name; otherwise only the surviving rows.
    """
    _optimizer_guard(df.sparkSession)
    cols = list(order_by)
    local = (
        df.sortWithinPartitions(*cols)
        .withColumn(
            "_pos", F.monotonically_increasing_id().bitwiseAND(F.lit(_POS_MASK))
        )
        .filter(F.col("_pos") < k)
        .drop("_pos")
    )
    name = rank_col or "_rk"
    ranked = (
        local.withColumn(name, F.row_number().over(Window.orderBy(*cols)))
        .filter(F.col(name) <= k)
    )
    return ranked if rank_col else ranked.drop("_rk")
