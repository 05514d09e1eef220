"""Adaptive per-domain request configuration — the C4 → fetch feedback loop.

Rebuilds the reference's ``AdaptiveRequestConfig`` / ``SmartRequestHandler``
(``Scraping_project/src/common/request_infrastructure.py:73-197``): each
domain learns a timeout from its recent SUCCESSFUL response times
(``learn_from_attempt`` :173-180 — 3× the average of the last 10, floored),
escalates timeout and sheds a retry when timeouts dominate its recent errors
(:186-190), and raises its inter-request delay when throttling dominates
(:193-196); ``get_optimal_config`` (:138-155) serves base values until a
domain has learned otherwise.

Generation-batch recast — the same shape as rate_control / learned_filters:

- after each generation, a tiny per-host ROLLUP delta is staged into the
  ``adaptive_stats`` catalog table: the last ≤ WINDOW success latencies and
  the last ≤ WINDOW error types, in schedule (rank_in_host DESC) order.
  Downstream derivation reads ONLY these deltas, never the raw fetch
  history (the learned-filter discipline): each generation contributes at
  most 2·WINDOW values per host, so the table grows as gens × hosts, not
  as fetches.
- before the next generation, deltas combine per host — most recent
  generation first, flatten, take WINDOW — and map to the effective config
  (timeout_ms, max_attempts, delay_ms) with the reference's thresholds.
- the config joins into the frontier before the fetch (per-row timeout into
  the resolver) and into the retry re-enqueue predicate after it (a
  timeout-dominated host sheds a retry); the learned DELAY acts at
  selection time — a throttle-escalated host's per-generation budget is
  scaled by base/learned delay (:func:`paced_budgets`, the batch recast of
  inter-request sleeping) — and additionally raises the execution-time
  politeness sleep when politeness pacing is enabled.

Everything is integer arithmetic (truncating ``div``), so the Spark
derivation and the sequential-oracle python twins below are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference base/limit values (request_infrastructure.py:78-82,173-196),
# times in ms. WINDOW is the "last 10 attempts" pattern-analysis slice.
WINDOW = 10
BASE_TIMEOUT_MS = 10_000
MIN_TIMEOUT_MS = 5_000
MAX_TIMEOUT_MS = 30_000
TIMEOUT_ESCALATE = 5  # > 5 timeouts among the last WINDOW errors
THROTTLE_ESCALATE = 3  # > 3 throttled among the last WINDOW errors
BASE_DELAY_MS = 1_000
MAX_DELAY_MS = 10_000
MIN_RETRIES = 2


def stats_delta(staged_read: DataFrame) -> DataFrame:
    """One generation's fetch rows → per-host rollup delta.

    succ_lats: latencies of the last ≤ WINDOW error-free fetches (error_type
    IS NULL — the taxonomy's success class, redirects included, matching the
    reference's RequestOutcome.SUCCESS bucket), newest (highest rank) first.
    err_types: the error classes of the last ≤ WINDOW failed fetches, newest
    first. Ordering is deterministic: rank_in_host is unique per (gen, host)
    and array_sort on the (rank, value) struct totals it."""
    succ = F.when(
        F.col("error_type").isNull(),
        F.struct(F.col("rank_in_host").alias("r"), F.col("latency_ms").alias("v")),
    )
    err = F.when(
        F.col("error_type").isNotNull(),
        F.struct(F.col("rank_in_host").alias("r"), F.col("error_type").alias("v")),
    )

    def last_n(col):
        return F.transform(
            F.slice(F.reverse(F.array_sort(F.collect_list(col))), 1, WINDOW),
            lambda x: x["v"],
        )

    return staged_read.groupBy("host").agg(
        last_n(succ).alias("succ_lats"), last_n(err).alias("err_types")
    )


def _recent(col_name: str):
    """Newest-first flatten of a per-generation delta column, truncated to
    WINDOW values — THE merge rule for adaptive history (shared by the
    per-generation derivation and the retention compaction, so a truncation
    tweak can never desynchronize them): order deltas by generation
    descending, concatenate their (already newest-first) value arrays, keep
    the first WINDOW."""
    return F.slice(
        F.flatten(
            F.transform(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("generation").alias("g"),
                                F.col(col_name).alias("v"),
                            )
                        )
                    )
                ),
                lambda x: x["v"],
            )
        ),
        1,
        WINDOW,
    )


def compact_stats(spark, catalog) -> dict | None:
    """Retention rewrite for the ``adaptive_stats`` history (round-6 verdict
    #2): the table grows one delta row per (host, generation), so the
    per-generation :func:`adaptive_config` read grows O(G) and total crawl
    work O(G²) at the thousands-of-generations design point. This rewrites
    it to ONE merged row per host — succ_lats/err_types collapsed with the
    SAME newest-first/truncate-to-WINDOW rule the derivation applies
    (:func:`_recent`), generation = the host's newest delta generation.

    EXACT by construction: the derivation only ever consumes the first
    WINDOW values of the newest-first flatten, and the merged row IS that
    prefix in order — any later deltas sort strictly newer (their
    generations are larger), so prepending them to the merged row yields the
    same sequence the un-compacted table would. A generation predicate alone
    would NOT be exact (an idle host's newest deltas can be arbitrarily
    old); this keeps every host's live window regardless of idleness.

    Files are staged under the newest generation prefix and published with
    one atomic overwrite commit (``commit_rewrite`` — snapshot isolation,
    replaced files become vacuum orphans). Like url_seen ``--collapse``,
    this forfeits per-generation time travel FOR THIS TABLE — documented
    trade for a hosts×1-row bound; the op snapshot entry records it.
    Returns the op stats dict, or None when the table has fewer than two
    files (nothing to bound)."""
    m = catalog._load()
    files = m["tables"].get("adaptive_stats", [])
    if len(files) < 2:
        return None
    stats = catalog.read(spark, "adaptive_stats")
    merged = stats.groupBy("host").agg(
        _recent("succ_lats").alias("succ_lats"),
        _recent("err_types").alias("err_types"),
        F.max("generation").alias("generation"),
    )
    latest = max(int(f.split("/")[-1][1:6]) for f in files)
    staged = catalog.stage(merged, "adaptive_stats", latest, coalesce=1)
    op = {
        "op": "adaptive_retention_compact",
        "table": "adaptive_stats",
        "before_files": len(files),
        "after_files": len(staged),
        # rollback anchor: the merged file lives under the g{as_of}- prefix;
        # catalog.rollback to any N >= as_of keeps it (plus later deltas)
        # and stays adaptive-parity-exact, N < as_of refuses
        "as_of": latest,
    }
    catalog.commit_rewrite({"adaptive_stats": staged}, stats=op)
    return op


def adaptive_config(
    stats: DataFrame | None, max_attempts: int
) -> DataFrame | None:
    """Combine staged per-generation deltas → effective per-host config.

    Returns (host, timeout_ms, max_attempts, delay_ms), or None when no
    history exists yet (callers fall back to the base config — the
    get_optimal_config default path). Per host: order deltas newest
    generation first, flatten, keep WINDOW values; then

    - timeout: error-escalation wins when timeouts dominate recent errors
      (min(30s, 2×base) — :186-188), else 3× the average success latency
      floored at 5s (:178-180), else base;
    - max_attempts: sheds one (floored at MIN_RETRIES) under timeout
      escalation (:189-190);
    - delay: 3× base capped at 10s when throttling dominates (:193-196).
    """
    if stats is None:
        return None

    g = stats.groupBy("host").agg(
        _recent("succ_lats").alias("sl"), _recent("err_types").alias("et")
    )
    n_s = F.size("sl")
    avg = F.expr("aggregate(sl, 0L, (a, x) -> a + x) div size(sl)")
    n_to = F.size(F.filter("et", lambda t: t == "timeout"))
    n_th = F.size(F.filter("et", lambda t: t == "throttled"))
    timeout = (
        F.when(
            n_to > TIMEOUT_ESCALATE,
            F.lit(min(MAX_TIMEOUT_MS, 2 * BASE_TIMEOUT_MS)),
        )
        .when(n_s > 0, F.greatest(F.lit(MIN_TIMEOUT_MS), avg * 3))
        .otherwise(F.lit(BASE_TIMEOUT_MS))
    )
    max_att = F.when(
        n_to > TIMEOUT_ESCALATE, F.lit(max(MIN_RETRIES, max_attempts - 1))
    ).otherwise(F.lit(max_attempts))
    delay = F.when(
        n_th > THROTTLE_ESCALATE, F.lit(min(MAX_DELAY_MS, 3 * BASE_DELAY_MS))
    ).otherwise(F.lit(BASE_DELAY_MS))
    return g.select(
        "host",
        timeout.cast("long").alias("timeout_ms"),
        max_att.cast("int").alias("max_attempts"),
        delay.cast("long").alias("delay_ms"),
    )


# ---------------------------------------------------------------------------
# Python twins — the sequential oracle (plans/oracle.py) runs these exact
# functions, so the learned config can never drift between engines.


def py_stats_delta(rows: list[dict]) -> dict[str, tuple[list[int], list[str]]]:
    """Twin of :func:`stats_delta` over one generation's row dicts."""
    by_host: dict[str, list[dict]] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    out: dict[str, tuple[list[int], list[str]]] = {}
    for host, hr in by_host.items():
        hr.sort(key=lambda r: -r["rank_in_host"])
        sl = [r["latency_ms"] for r in hr if r["error_type"] is None][:WINDOW]
        et = [r["error_type"] for r in hr if r["error_type"] is not None][:WINDOW]
        out[host] = (sl, et)
    return out


def py_config(
    hist: dict[str, list[tuple[int, list[int], list[str]]]], max_attempts: int
) -> dict[str, tuple[int, int, int]]:
    """Twin of :func:`adaptive_config` over
    host -> [(generation, succ_lats, err_types), ...] history.
    Returns host -> (timeout_ms, max_attempts, delay_ms)."""
    out: dict[str, tuple[int, int, int]] = {}
    for host, entries in hist.items():
        ordered = sorted(entries, key=lambda e: -e[0])
        sl: list[int] = []
        et: list[str] = []
        for _g, s, e in ordered:
            sl.extend(s)
            et.extend(e)
        sl, et = sl[:WINDOW], et[:WINDOW]
        n_to = sum(1 for t in et if t == "timeout")
        n_th = sum(1 for t in et if t == "throttled")
        if n_to > TIMEOUT_ESCALATE:
            timeout = min(MAX_TIMEOUT_MS, 2 * BASE_TIMEOUT_MS)
        elif sl:
            timeout = max(MIN_TIMEOUT_MS, (sum(sl) // len(sl)) * 3)
        else:
            timeout = BASE_TIMEOUT_MS
        max_att = (
            max(MIN_RETRIES, max_attempts - 1)
            if n_to > TIMEOUT_ESCALATE
            else max_attempts
        )
        delay = (
            min(MAX_DELAY_MS, 3 * BASE_DELAY_MS)
            if n_th > THROTTLE_ESCALATE
            else BASE_DELAY_MS
        )
        out[host] = (timeout, max_att, delay)
    return out


def base_config(max_attempts: int) -> tuple[int, int, int]:
    """The un-learned default (get_optimal_config's base path)."""
    return (BASE_TIMEOUT_MS, max_attempts, BASE_DELAY_MS)


# ---------------------------------------------------------------------------
# The delay arm. The reference sleeps learned_delay between same-domain
# requests (request_infrastructure.py:193-196 feeding the handler's pacing);
# in the generation-batch recast the same slowdown is applied at SELECTION
# time — a host paced to BASE/learned of its request rate fetches
# BASE/learned of its per-generation budget (floored at one probe), and the
# deferred URLs stay in the frontier for later generations. Deterministic,
# integer-exact, and it composes with the rate-control budgets; breaker
# cooldown/probe budgets (<= 1) are never touched. Execution-time pacing
# additionally raises the politeness sleep to the learned delay when
# politeness pacing is enabled (operators/fetch.py).


def py_paced_budget(budget: int, delay_ms: int) -> int:
    """Twin of the Spark expression in :func:`paced_budgets`."""
    if delay_ms <= BASE_DELAY_MS or budget <= 1:
        return budget
    return max(1, budget * BASE_DELAY_MS // delay_ms)


def paced_budgets(
    budgets: DataFrame | None,
    config: DataFrame | None,
    per_host_budget: int,
) -> DataFrame | None:
    """Fold the learned per-host delay into the effective budget table.

    ``budgets`` is the rate-control table (host, budget) or None; ``config``
    is :func:`adaptive_config`'s output or None. Returns a (host, budget)
    table for :func:`~..operators.frontier.select_frontier` (hosts absent
    from it use ``per_host_budget``), or None when nothing constrains. Both
    inputs are host-keyed dims — the outer join is dim-sized, never
    frontier-sized."""
    if config is None:
        return budgets
    slowed = config.filter(F.col("delay_ms") > BASE_DELAY_MS).select(
        "host", "delay_ms"
    )
    if budgets is None:
        # only slowed hosts need rows — absent hosts take the default
        joined = slowed.withColumn(
            "budget", F.lit(per_host_budget).cast("int")
        )
    else:
        # full outer: rc-only hosts keep their budget (delay NULL), slowed-
        # only hosts start from the default (budget NULL)
        joined = budgets.join(slowed, "host", "full")
    return joined.select(
        "host",
        F.expr(
            f"CASE WHEN delay_ms IS NOT NULL"
            f"          AND coalesce(budget, {per_host_budget}) > 1 "
            f"     THEN greatest(1, (coalesce(budget, {per_host_budget})"
            f"          * {BASE_DELAY_MS}) div delay_ms) "
            f"     ELSE coalesce(budget, {per_host_budget}) END"
        )
        .cast("int")
        .alias("budget"),
    )
