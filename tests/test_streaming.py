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


def test_streaming_image_admission_gate(spark, tmp_path):
    """Ingest-gate funnel: stateless reasons drop row-locally; the phash
    dedup admits the FIRST arrival in-horizon and drops repeats across
    micro-batches; a null phash never forms a dup group."""
    import pandas as pd

    from scrapy_spark.streaming.funnel import streaming_image_admission

    src = tmp_path / "adm_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def rows(batch):
        return pd.DataFrame(batch)

    b1 = [
        {"image_id": "ok1", "w": 300, "h": 300, "caption": "a fine caption",
         "phash": 111, "ts": t0},
        {"image_id": "tiny", "w": 8, "h": 300, "caption": "another caption",
         "phash": 222, "ts": t0 + pd.Timedelta(seconds=1)},
        {"image_id": "banner", "w": 1300, "h": 100, "caption": "wide thing",
         "phash": 333, "ts": t0 + pd.Timedelta(seconds=2)},
        {"image_id": "shortcap", "w": 300, "h": 300, "caption": "x",
         "phash": 444, "ts": t0 + pd.Timedelta(seconds=3)},
        # in-batch exact repeat of ok1's phash
        {"image_id": "dup-in-batch", "w": 310, "h": 310,
         "caption": "same image reupload", "phash": 111,
         "ts": t0 + pd.Timedelta(seconds=4)},
        # two null-phash rows: both admitted (unknown content, singletons)
        {"image_id": "null-a", "w": 300, "h": 300,
         "caption": "decode failed once", "phash": None,
         "ts": t0 + pd.Timedelta(seconds=5)},
        {"image_id": "null-b", "w": 300, "h": 300,
         "caption": "decode failed twice", "phash": None,
         "ts": t0 + pd.Timedelta(seconds=6)},
    ]
    rows(b1).astype({"phash": "Int64"}).to_parquet(
        src / "b1.parquet", coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = spark.readStream.schema(
        "image_id string, w long, h long, caption string, phash long, "
        "ts timestamp"
    ).parquet(str(src))
    out = streaming_image_admission(stream, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("adm_out").start()
    )
    try:
        q.processAllAvailable()
        got1 = {r["image_id"]
                for r in spark.sql("SELECT image_id FROM adm_out").collect()}
        assert got1 == {"ok1", "null-a", "null-b"}

        # batch 2: cross-batch repeat of phash 111 dropped; new phash admitted
        b2 = [
            {"image_id": "dup-later", "w": 305, "h": 305,
             "caption": "late reupload of ok1", "phash": 111,
             "ts": t0 + pd.Timedelta(seconds=60)},
            {"image_id": "fresh", "w": 305, "h": 305,
             "caption": "genuinely new image", "phash": 999,
             "ts": t0 + pd.Timedelta(seconds=61)},
        ]
        rows(b2).astype({"phash": "Int64"}).to_parquet(
            src / "b2.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        q.processAllAvailable()
        got2 = {r["image_id"]
                for r in spark.sql("SELECT image_id FROM adm_out").collect()}
        assert got2 == {"ok1", "null-a", "null-b", "fresh"}
    finally:
        q.stop()


def test_streaming_admission_stats_windows(spark, tmp_path):
    """Windowed drop-reason rollup: closed windows emit exactly once with
    counts equal to a per-window python tally."""
    import pandas as pd

    from scrapy_spark.streaming.funnel import streaming_admission_stats

    src = tmp_path / "admstat_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    batch = [
        # window [00:00, 10:00): 1 clean, 1 tiny, 1 short caption
        {"image_id": "a", "w": 300, "h": 300, "caption": "fine one",
         "phash": 1, "ts": t0 + pd.Timedelta(minutes=1)},
        {"image_id": "b", "w": 8, "h": 300, "caption": "fine two",
         "phash": 2, "ts": t0 + pd.Timedelta(minutes=2)},
        {"image_id": "c", "w": 300, "h": 300, "caption": "x",
         "phash": 3, "ts": t0 + pd.Timedelta(minutes=3)},
        # window [10:00, 20:00): 1 banner
        {"image_id": "d", "w": 1300, "h": 100, "caption": "wide banner here",
         "phash": 4, "ts": t0 + pd.Timedelta(minutes=11)},
    ]
    pd.DataFrame(batch).to_parquet(src / "b1.parquet",
                                   coerce_timestamps="us",
                                   allow_truncated_timestamps=True)
    stream = spark.readStream.schema(
        "image_id string, w long, h long, caption string, phash long, "
        "ts timestamp"
    ).parquet(str(src))
    out = streaming_admission_stats(stream, watermark="1 minute",
                                    window="10 minutes")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("admstat_out").start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far enough to close both windows
        pd.DataFrame([
            {"image_id": "z", "w": 300, "h": 300, "caption": "mover row",
             "phash": 9, "ts": t0 + pd.Timedelta(hours=2)},
        ]).to_parquet(src / "b2.parquet", coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        q.processAllAvailable()
        got = {
            str(r["window_start"]): r.asDict()
            for r in spark.sql("SELECT * FROM admstat_out").collect()
        }
        w1 = got["2024-01-01 00:00:00"]
        assert (w1["n_arrived"], w1["n_too_small"], w1["n_caption_short"]) \
            == (3, 1, 1)
        # reasons are independent flags: the 8x300 row is too_small AND
        # (300 > 4*8) bad_aspect, exactly like the batch funnel
        assert w1["n_bad_aspect"] == 1 and w1["n_caption_long"] == 0
        w2 = got["2024-01-01 00:10:00"]
        assert (w2["n_arrived"], w2["n_bad_aspect"]) == (1, 1)
    finally:
        q.stop()
