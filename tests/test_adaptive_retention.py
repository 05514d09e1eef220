"""adaptive_stats retention compaction (operators/adaptive.compact_stats,
round-6 verdict #2): the history table must stay bounded at ~hosts rows on
long crawls, the merge must be EXACTLY config-preserving (including idle
hosts whose newest deltas are arbitrarily old — the case a generation
predicate would get wrong), parity with the sequential oracle must hold
across a mid-crawl compaction, and resume must be deterministic across the
compaction cadence."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from scrapy_spark.operators import adaptive as adaptive_mod
from scrapy_spark.plans.crawl import CrawlJob
from scrapy_spark.plans.oracle import CrawlParams, run_oracle
from scrapy_spark.sources.catalog import SnapshotCatalog
from scrapy_spark.sources.synth import SynthConfig

_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("succ_lats", T.ArrayType(T.LongType())),
        T.StructField("err_types", T.ArrayType(T.StringType())),
        T.StructField("generation", T.IntegerType()),
    ]
)


def _delta(host, lats, errs, gen):
    return (host, [int(x) for x in lats], list(errs), gen)


def _mk_history(spark, root, gens):
    """Commit one adaptive_stats delta batch per generation into a fresh
    catalog; returns the catalog."""
    cat = SnapshotCatalog(root)
    for gen, rows in gens:
        df = spark.createDataFrame(rows, _SCHEMA)
        staged = cat.stage(df, "adaptive_stats", gen, coalesce=1)
        cat.commit(gen, {"adaptive_stats": staged})
    return cat


def _config_map(spark, cat, max_attempts=3):
    cfg = adaptive_mod.adaptive_config(cat.read(spark, "adaptive_stats"), max_attempts)
    return {
        r["host"]: (r["timeout_ms"], r["max_attempts"], r["delay_ms"])
        for r in cfg.collect()
    }


def test_compact_stats_is_config_exact(spark, tmp_path):
    """adaptive_config(compacted) == adaptive_config(full history), before
    AND after further deltas arrive — including the idle host whose only
    deltas are old (kept live by the per-host merge; a newest-generations
    filter would drop it and flip its config to base)."""
    # gens 0..5: "busy" gets a delta every gen (so its live window spans
    # only the newest gens), "idle" only at gen 0, "timeouty" accumulates
    # timeout errors across gens 1-3 then goes quiet
    gens = []
    for g in range(6):
        rows = [_delta("busy", [100 * (g + 1)] * 4, ["server_error"] * 2, g)]
        if g == 0:
            rows.append(_delta("idle", [7000, 8000], ["throttled"] * 4, 0))
        if 1 <= g <= 3:
            rows.append(_delta("timeouty", [], ["timeout"] * 3, g))
        gens.append((g, rows))

    full = _mk_history(spark, str(tmp_path / "full"), gens)
    compacted = _mk_history(spark, str(tmp_path / "compacted"), gens)
    before = _config_map(spark, full)
    op = adaptive_mod.compact_stats(spark, compacted)
    assert op is not None and op["op"] == "adaptive_retention_compact"
    # bounded: exactly one merged row per host, arrays capped at WINDOW
    merged = compacted.read(spark, "adaptive_stats").collect()
    assert len(merged) == 3
    for r in merged:
        assert len(r["succ_lats"]) <= adaptive_mod.WINDOW
        assert len(r["err_types"]) <= adaptive_mod.WINDOW
    assert _config_map(spark, compacted) == before

    # new deltas AFTER the compaction merge identically on both sides
    late = [
        _delta("busy", [50, 60], ["timeout"] * 6, 6),
        _delta("idle", [], ["throttled"], 6),
    ]
    for cat in (full, compacted):
        df = spark.createDataFrame(late, _SCHEMA)
        cat.commit(6, {"adaptive_stats": cat.stage(df, "adaptive_stats", 6, coalesce=1)})
    assert _config_map(spark, compacted) == _config_map(spark, full)
    # the op is recorded in the snapshot log (maintenance-op discipline)
    assert any(
        s["stats"].get("op") == "adaptive_retention_compact"
        for s in compacted.snapshots()
    )


def test_compact_stats_noop_when_single_file(spark, tmp_path):
    cat = _mk_history(
        spark, str(tmp_path / "one"), [(0, [_delta("h", [100], [], 0)])]
    )
    assert adaptive_mod.compact_stats(spark, cat) is None


def test_adaptive_parity_across_midcrawl_compaction(spark, tmp_path_factory):
    """The adaptive-fetch oracle parity of test_adaptive_fetch_parity must
    survive retention compactions firing MID-crawl (every 2 generations
    here): schedule, seen-set and per-row latency/finality stay exact, the
    history table ends bounded at one row per host, and the snapshot log
    records the ops."""
    params = CrawlParams(
        max_generations=5,
        per_host_budget=10,
        adaptive_fetch=True,
        adaptive_retention_every=2,
    )
    cfg = SynthConfig(
        seed=42, n_hosts=12, n_pages=300, n_images=120, throttle_hosts=(2,)
    )
    oracle = run_oracle(cfg, params)
    wd = str(tmp_path_factory.mktemp("crawl_af_ret"))
    job = CrawlJob(spark, cfg, params, wd, salt_buckets=4)
    job.run()
    results = job.catalog.read(spark, "fetch_results").collect()
    ours = {
        (r["generation"], r["host"], r["rank_in_host"]): r["url"] for r in results
    }
    theirs = {
        (r["generation"], r["host"], r["rank_in_host"]): r["url"]
        for r in oracle.scheduled
    }
    assert ours == theirs
    seen_ours = {
        (r["url"], r["generation"])
        for r in job.catalog.read(spark, "url_seen").collect()
    }
    assert seen_ours == {(u, g) for u, g in oracle.seen.items()}
    rows = {
        (r["url"], r["attempt"], r["generation"]): (r["latency_ms"], r["is_final"])
        for r in results
    }
    for o in oracle.scheduled:
        assert rows[(o["url"], o["attempt"], o["generation"])] == (
            o["latency_ms"], o["is_final"]
        ), o["url"]
    # last trigger fired at gen 4 (the final generation): the table is the
    # merged one-row-per-host form — the bounded-read guarantee
    stats_rows = job.catalog.read(spark, "adaptive_stats").collect()
    hosts = {r["host"] for r in stats_rows}
    assert len(stats_rows) == len(hosts)
    assert (
        sum(
            1
            for s in job.catalog.snapshots()
            if s["stats"].get("op") == "adaptive_retention_compact"
        )
        == 2  # gens 2 and 4
    )


def test_adaptive_resume_across_compaction_cadence(spark, tmp_path_factory):
    """Resume determinism across the retention cadence: a crawl stopped
    after generation 2 (compaction fired) and resumed to 5 produces the
    SAME fetch_results rows as an uninterrupted 5-generation run — the
    cadence keys on generation number, so both paths compact at the same
    points and derive identical configs."""
    cfg = SynthConfig(
        seed=42, n_hosts=12, n_pages=300, n_images=120, throttle_hosts=(2,)
    )

    def run_crawl(wd, stop_at=None):
        if stop_at is not None:
            p = CrawlParams(
                max_generations=stop_at,
                per_host_budget=10,
                adaptive_fetch=True,
                adaptive_retention_every=2,
            )
            CrawlJob(spark, cfg, p, wd, salt_buckets=4).run()
        p = CrawlParams(
            max_generations=5,
            per_host_budget=10,
            adaptive_fetch=True,
            adaptive_retention_every=2,
        )
        job = CrawlJob(spark, cfg, p, wd, salt_buckets=4)
        job.run(resume=stop_at is not None)
        return job

    straight = run_crawl(str(tmp_path_factory.mktemp("af_ret_straight")))
    resumed = run_crawl(str(tmp_path_factory.mktemp("af_ret_resumed")), stop_at=3)

    def rowset(job):
        return sorted(
            (r["generation"], r["host"], r["rank_in_host"], r["url"],
             r["attempt"], r["latency_ms"], r["is_final"])
            for r in job.catalog.read(spark, "fetch_results").collect()
        )

    assert rowset(straight) == rowset(resumed)


def test_rollback_composes_with_retention_compaction(spark, tmp_path_factory):
    """catalog.rollback and the automatic retention cadence must not be
    mutually exclusive (review finding r7): rolling back to N >= the last
    compaction's as_of keeps the merged file (g{as_of}- prefix) plus later
    deltas — exactly the state a crawl STOPPED at N holds, since the
    cadence keys on generation number — and resume from there matches an
    uninterrupted run. N < as_of still refuses: the pre-compaction deltas
    are no longer manifest-reachable."""
    import pytest

    cfg = SynthConfig(
        seed=42, n_hosts=12, n_pages=300, n_images=120, throttle_hosts=(2,)
    )

    def params(gens):
        return CrawlParams(
            max_generations=gens, per_host_budget=10,
            adaptive_fetch=True, adaptive_retention_every=2,
        )

    wd = str(tmp_path_factory.mktemp("af_rb"))            # 6 gens, roll to 4
    wd_stop = str(tmp_path_factory.mktemp("af_rb_stop"))  # stopped at gen 4
    wd_full = str(tmp_path_factory.mktemp("af_rb_full"))  # straight 6 gens
    CrawlJob(spark, cfg, params(6), wd, salt_buckets=4).run()
    CrawlJob(spark, cfg, params(5), wd_stop, salt_buckets=4).run()
    CrawlJob(spark, cfg, params(6), wd_full, salt_buckets=4).run()

    cat = SnapshotCatalog(wd)
    ops = [s["stats"] for s in cat.snapshots()
           if s["stats"].get("op") == "adaptive_retention_compact"]
    assert [o["as_of"] for o in ops] == [2, 4]

    # below the last compaction's as_of: refused, loudly and specifically
    with pytest.raises(ValueError, match="adaptive_retention_compact"):
        cat.rollback(3)

    # at/above as_of: composes — and equals the stopped-at-4 crawl exactly
    out = cat.rollback(4)
    assert out["op"] == "rollback" and out["to"] == 4

    def rows(root, table):
        c = SnapshotCatalog(root)
        df = c.read(spark, table)
        return sorted(
            (tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                   for v in r) for r in df.collect()),
            key=repr,
        )

    for table in ("fetch_results", "url_seen", "adaptive_stats"):
        assert rows(wd, table) == rows(wd_stop, table), table

    # resume re-runs gen 5 with the SAME derived adaptive config
    CrawlJob(spark, cfg, params(6), wd, salt_buckets=4).run(resume=True)
    for table in ("fetch_results", "url_seen", "adaptive_stats"):
        assert rows(wd, table) == rows(wd_full, table), table
