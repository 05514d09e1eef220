"""Streaming: continuous crawl loop parity + windowed metrics aggregation."""

from __future__ import annotations

from scrapy_spark.plans.crawl import CrawlJob
from scrapy_spark.plans.oracle import CrawlParams, run_oracle
from scrapy_spark.sources.synth import SynthConfig
from scrapy_spark.streaming.continuous import (
    FETCH_EVENT_SCHEMA,
    continuous_crawl,
    windowed_fetch_metrics,
)

CFG = SynthConfig(seed=42, n_hosts=8, n_pages=150, n_images=60)
PARAMS = CrawlParams(max_generations=3, per_host_budget=8)


def test_continuous_crawl_matches_oracle(spark, tmp_path):
    job = CrawlJob(spark, CFG, PARAMS, str(tmp_path / "wd"), salt_buckets=4)
    stats = continuous_crawl(job, timeout_s=90)
    oracle = run_oracle(CFG, PARAMS)
    seen = {
        (r["url"], r["generation"])
        for r in job.catalog.read(spark, "url_seen").collect()
    }
    assert seen == {(u, g) for u, g in oracle.seen.items()}
    assert [s.scheduled for s in stats] == [
        c["scheduled"] for c in oracle.gen_counts if c["scheduled"] > 0
    ]


def test_windowed_fetch_metrics(spark, tmp_path):
    import pandas as pd

    rows = []
    for i in range(100):
        rows.append(
            {
                "url": f"https://h{i%3}.uconn.edu/p{i}",
                "host": f"h{i%3}.uconn.edu",
                "ts": pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(seconds=i),
                "is_valid": i % 10 != 0,
                "n_bytes": 100 + i,
            }
        )
    src = tmp_path / "stream_src"
    src.mkdir()
    # microsecond timestamps — Spark can't read pandas' default ns INT64
    pd.DataFrame(rows).to_parquet(
        src / "part0.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )

    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(str(src))
    agg = windowed_fetch_metrics(stream, window="10 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fetch_metrics")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM fetch_metrics").collect()
    finally:
        q.stop()
    # 100 seconds of events -> 10 windows x 3 hosts
    assert len(out) == 30
    total = sum(r["n_fetched"] for r in out)
    assert total == 100
    invalid = sum(r["n_fetched"] - r["n_valid"] for r in out)
    assert invalid == 10


def test_aimd_stateful_rate_control(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): AIMD concurrency
    per host across two micro-batches, with circuit-breaker on consecutive
    failures (async_enrichment.py:76-176 / retry_strategies.py:256-390)."""
    import pandas as pd

    from scrapy_spark.streaming.aimd import AIMD_START, AIMD_STEP, aimd_budgets

    src = tmp_path / "aimd_src"
    src.mkdir()

    def write_batch(name, rows):
        pd.DataFrame(rows).to_parquet(src / name, coerce_timestamps="us",
                                      allow_truncated_timestamps=True)

    # batch 1: goodhost all ok; badhost 6 consecutive failures
    write_batch(
        "b1.parquet",
        [{"host": "good.uconn.edu", "is_valid": True} for _ in range(20)]
        + [{"host": "bad.uconn.edu", "is_valid": False} for _ in range(6)],
    )
    stream = spark.readStream.schema("host string, is_valid boolean").parquet(str(src))
    q = (
        aimd_budgets(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("aimd_out")
        .start()
    )
    try:
        q.processAllAvailable()
        out1 = {r["host"]: r for r in spark.sql("SELECT * FROM aimd_out").collect()}
        assert out1["good.uconn.edu"]["concurrency"] == AIMD_START + AIMD_STEP
        assert out1["bad.uconn.edu"]["circuit_open"]
        assert out1["bad.uconn.edu"]["concurrency"] == 0

        # batch 2: goodhost keeps succeeding (+2); badhost recovers (closes)
        write_batch(
            "b2.parquet",
            [{"host": "good.uconn.edu", "is_valid": True} for _ in range(10)]
            + [{"host": "bad.uconn.edu", "is_valid": True} for _ in range(10)],
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM aimd_out WHERE n_events = 10 OR host = 'good.uconn.edu'"
        ).collect()
        byhost = {}
        for r in spark.sql("SELECT * FROM aimd_out").collect():
            byhost.setdefault(r["host"], []).append(r)
        g2 = [r for r in byhost["good.uconn.edu"] if r["n_events"] == 10][0]
        b2 = [r for r in byhost["bad.uconn.edu"] if r["n_events"] == 10][0]
        assert g2["concurrency"] == AIMD_START + 2 * AIMD_STEP
        assert not b2["circuit_open"] and b2["concurrency"] > 0
    finally:
        q.stop()


def test_session_window_fetch_activity(spark, tmp_path):
    """Gap-based session windows per host: a >30 s quiet period closes the
    session (streaming twin of the batch sessionize_events query)."""
    import pandas as pd

    from scrapy_spark.streaming.continuous import session_fetch_activity

    rows = []
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    # host A: burst of 5 (one per second), 120 s gap, burst of 3
    for i in range(5):
        rows.append({"url": f"u{i}", "host": "a.uconn.edu",
                     "ts": t0 + pd.Timedelta(seconds=i), "is_valid": True,
                     "n_bytes": 1})
    for i in range(3):
        rows.append({"url": f"v{i}", "host": "a.uconn.edu",
                     "ts": t0 + pd.Timedelta(seconds=125 + i), "is_valid": i > 0,
                     "n_bytes": 1})
    # host B: one continuous session spanning the same range (gap < 30 s)
    for i in range(0, 140, 20):
        rows.append({"url": f"w{i}", "host": "b.uconn.edu",
                     "ts": t0 + pd.Timedelta(seconds=i), "is_valid": True,
                     "n_bytes": 1})
    src = tmp_path / "sess_src"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(
        src / "part0.parquet", coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(str(src))
    q = (
        session_fetch_activity(stream, gap="30 seconds")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM sessions ORDER BY host, session_start").collect()
    finally:
        q.stop()
    a = [r for r in out if r["host"] == "a.uconn.edu"]
    b = [r for r in out if r["host"] == "b.uconn.edu"]
    assert len(a) == 2 and len(b) == 1  # the 120 s gap split host A only
    assert (a[0]["n_fetched"], a[1]["n_fetched"]) == (5, 3)
    assert a[1]["n_valid"] == 2
    assert b[0]["n_fetched"] == 7


def test_aimd_tws_parity_with_apply_in_pandas(spark, tmp_path):
    """The transformWithStateInPandas twin (Spark-4 successor API,
    RocksDB-backed) produces EXACTLY the budgets of the
    applyInPandasWithState operator — same shared _aimd_step core.

    ENV-GATED: the new API's state-server protocol needs google.protobuf,
    which is not installed in this container (verified: the driver worker
    crashes in StateMessage_pb2 import). The shared-core parity below it
    (test_aimd_step_core_is_the_single_source) still pins that both
    operators are the same controller."""
    import pandas as pd
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf "
        "(absent in this container; operator code is the migration path)",
    )

    from scrapy_spark.streaming.aimd import aimd_budgets, aimd_budgets_tws

    src = tmp_path / "aimd_tws_src"
    src.mkdir()
    rows = (
        [{"host": "good.uconn.edu", "is_valid": True, "seq": i} for i in range(20)]
        + [{"host": "bad.uconn.edu", "is_valid": False, "seq": i} for i in range(6)]
        + [{"host": "flap.uconn.edu", "is_valid": i % 3 != 0, "seq": i} for i in range(9)]
    )
    pd.DataFrame(rows).to_parquet(src / "b1.parquet")

    def run(op, qname, extra_conf=None):
        prev = {}
        for k, v in (extra_conf or {}).items():
            try:
                prev[k] = spark.conf.get(k)
            except Exception:
                prev[k] = None
            spark.conf.set(k, v)
        stream = spark.readStream.schema(
            "host string, is_valid boolean, seq long"
        ).parquet(str(src))
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
            .start()
        )
        try:
            q.processAllAvailable()
            return sorted(
                tuple(r) for r in spark.sql(f"SELECT * FROM {qname}").collect()
            )
        finally:
            q.stop()
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    a = run(aimd_budgets, "aimd_apply")
    b = run(
        aimd_budgets_tws,
        "aimd_tws",
        {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
        },
    )
    assert a == b
    assert len(a) == 3  # one budget row per host


def test_aimd_step_core_is_the_single_source():
    """Both stateful-API operators route through the pure _aimd_step core
    (inspected), and the core's transitions match the reference AIMD rules
    directly — so the env-gated transformWithStateInPandas twin cannot
    drift from the applyInPandasWithState operator."""
    import inspect

    import pandas as pd

    from scrapy_spark.streaming import aimd

    src_update = inspect.getsource(aimd._update)
    src_tws = inspect.getsource(aimd.aimd_budgets_tws)
    assert "_aimd_step" in src_update and "_aimd_step" in src_tws

    # fresh host, all ok -> additive increase
    state, out = aimd._aimd_step(
        "h", None, [pd.DataFrame({"is_valid": [True] * 10})]
    )
    assert state[0] == aimd.AIMD_START + aimd.AIMD_STEP
    assert out["concurrency"].iloc[0] == aimd.AIMD_START + aimd.AIMD_STEP
    # below-threshold batch -> multiplicative decrease
    state2, out2 = aimd._aimd_step(
        "h", state, [pd.DataFrame({"is_valid": [True, False, False, True]})]
    )
    assert state2[0] == max(1, state[0] // 2)
    # breaker: >= 5 consecutive failures -> budget 0
    state3, out3 = aimd._aimd_step(
        "h", state2, [pd.DataFrame({"is_valid": [False] * 6})]
    )
    assert out3["circuit_open"].iloc[0] and out3["concurrency"].iloc[0] == 0
    # recovery closes the breaker
    _, out4 = aimd._aimd_step(
        "h", state3, [pd.DataFrame({"is_valid": [True] * 4})]
    )
    assert not out4["circuit_open"].iloc[0] and out4["concurrency"].iloc[0] > 0
    # empty input -> no output
    assert aimd._aimd_step("h", None, []) is None


def test_streaming_url_seen_dedup(spark, tmp_path):
    """Streaming first-occurrence dedup (dropDuplicatesWithinWatermark):
    repeats inside AND across micro-batches are suppressed while the key is
    within the watermark horizon; state is keyed by url_hash only."""
    import pandas as pd

    from scrapy_spark.streaming.dedup import streaming_url_seen

    src = tmp_path / "dedup_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(name, rows):
        pd.DataFrame(rows).to_parquet(src / name, coerce_timestamps="us",
                                      allow_truncated_timestamps=True)

    # batch 1: keys 0..9, each repeated 3x within the batch
    write_batch(
        "b1.parquet",
        [
            {"url_hash": k, "url": f"https://h.uconn.edu/p{k}",
             "ts": t0 + pd.Timedelta(seconds=k * 3 + r)}
            for k in range(10)
            for r in range(3)
        ],
    )
    stream = spark.readStream.schema(
        "url_hash long, url string, ts timestamp"
    ).parquet(str(src))
    out = streaming_url_seen(stream, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("seen_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("SELECT url_hash FROM seen_out").collect()
        assert sorted(r["url_hash"] for r in got1) == list(range(10))

        # batch 2: keys 5..14 — 5..9 are repeats within the horizon
        write_batch(
            "b2.parquet",
            [
                {"url_hash": k, "url": f"https://h.uconn.edu/p{k}",
                 "ts": t0 + pd.Timedelta(seconds=60 + k)}
                for k in range(5, 15)
            ],
        )
        q.processAllAvailable()
        got2 = spark.sql("SELECT url_hash FROM seen_out").collect()
        assert sorted(r["url_hash"] for r in got2) == list(range(15))
    finally:
        q.stop()


def test_streaming_url_seen_state_expiry(spark, tmp_path):
    """The watermark actually BOUNDS state: a key re-arriving after its
    horizon passed was evicted, so it is re-emitted (the batch Bloom/catalog
    path owns cross-horizon dedup — this operator only guards the window)."""
    import pandas as pd

    from scrapy_spark.streaming.dedup import streaming_url_seen

    src = tmp_path / "expiry_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(name, rows):
        pd.DataFrame(rows).to_parquet(src / name, coerce_timestamps="us",
                                      allow_truncated_timestamps=True)

    write_batch("b1.parquet", [{"url_hash": 1, "url": "u1", "ts": t0}])
    stream = spark.readStream.schema(
        "url_hash long, url string, ts timestamp"
    ).parquet(str(src))
    q = (
        streaming_url_seen(stream, watermark="10 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("expiry_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past t0+10s (wm = max event time seen)
        write_batch(
            "b2.parquet",
            [{"url_hash": 99, "url": "u99", "ts": t0 + pd.Timedelta(hours=1)}],
        )
        q.processAllAvailable()
        # key 1 re-arrives after its state aged out -> re-emitted
        write_batch(
            "b3.parquet",
            [{"url_hash": 1, "url": "u1b",
              "ts": t0 + pd.Timedelta(hours=1, seconds=1)}],
        )
        q.processAllAvailable()
        got = sorted(
            r["url_hash"] for r in spark.sql("SELECT * FROM expiry_out").collect()
        )
        assert got == [1, 1, 99]  # two emissions of key 1 across horizons
    finally:
        q.stop()
