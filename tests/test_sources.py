"""Sources/sinks: synth generator determinism, catalog snapshots/time-travel,
CSV/JSON export round-trips (S5-S7)."""

from __future__ import annotations

import json
import os

from scrapy_spark.sources import synth
from scrapy_spark.sources.catalog import SnapshotCatalog
from scrapy_spark.sources.synth import SynthConfig


def test_generate_deterministic(tmp_path):
    cfg = SynthConfig(seed=11, n_hosts=6, n_pages=80, n_images=30)
    p1 = synth.generate(cfg, str(tmp_path / "a"))
    p2 = synth.generate(cfg, str(tmp_path / "b"))
    for k in p1:
        b1 = open(p1[k], "rb").read()
        b2 = open(p2[k], "rb").read()
        assert b1 == b2, k  # byte-identical parquet for the same seed


def test_resolver_matches_tables(tmp_path):
    cfg = SynthConfig(seed=11, n_hosts=6, n_pages=80, n_images=30)
    counts = synth.zipf_page_counts(cfg)
    hg = synth.build_host_graph(cfg)
    for _, row in hg.head(30).iterrows():
        r = synth.resolve(cfg, counts, row["url"])
        assert r["status_code"] == row["status_code"]
        if r["status_code"] == 200:
            assert r["body_links"] == row["body_links"]
    im = synth.build_images(cfg)
    row = im.iloc[0]
    r = synth.resolve(cfg, counts, synth.image_url(cfg, row["image_id"]))
    assert r["bytes"] == row["bytes"]
    assert synth.resolve(cfg, counts, "https://nope.uconn.edu/x/p0")["status_code"] == 404


def test_catalog_snapshot_isolation_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    df0 = spark.range(5).withColumnRenamed("id", "v")
    f0 = cat.stage(df0, "t", 0)
    assert cat.read(spark, "t") is None  # staged files invisible pre-commit
    cat.commit(0, {"t": f0})
    assert cat.read(spark, "t").count() == 5
    f1 = cat.stage(spark.range(3).withColumnRenamed("id", "v"), "t", 1)
    cat.commit(1, {"t": f1})
    assert cat.read(spark, "t").count() == 8
    assert cat.read_upto(spark, "t", 0).count() == 5  # time travel
    assert cat.committed_generation() == 1
    # non-monotonic commit refused
    try:
        cat.commit(3, {})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_csv_json_export_roundtrip(spark, tmp_path, sf_dir):
    """S7 exporters (exporters.py:12-199): flatten -> csv/json -> re-read."""
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
    )
    csv_dir = str(tmp_path / "csv")
    df.write.option("header", True).csv(csv_dir)
    back = spark.read.option("header", True).option("inferSchema", True).csv(csv_dir)
    assert back.count() == df.count()
    assert {r["doc_id"] for r in back.collect()} == {r["doc_id"] for r in df.collect()}

    json_dir = str(tmp_path / "json")
    df.write.json(json_dir)
    rows = []
    for name in os.listdir(json_dir):
        if name.endswith(".json"):
            with open(os.path.join(json_dir, name)) as f:
                rows += [json.loads(line) for line in f if line.strip()]
    assert len(rows) == df.count()


def test_jsonl_permissive_scan(spark, tmp_path):
    """S2: JSONL stage-to-stage scan skips bad JSON lines (PERMISSIVE mode +
    _corrupt_record drop — pipeline.py:182-245 semantics)."""
    p = tmp_path / "stage.jsonl"
    p.write_text(
        '{"url": "https://uconn.edu/a", "depth": 1}\n'
        "NOT JSON AT ALL\n"
        '{"url": "https://uconn.edu/b", "depth": 2}\n'
        '{"url": "https://uconn.edu/c"\n'  # truncated
    )
    df = (
        spark.read.schema("url string, depth int, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    good = df.filter("_corrupt_record IS NULL").drop("_corrupt_record")
    rows = {r["url"]: r["depth"] for r in good.collect()}
    assert rows == {"https://uconn.edu/a": 1, "https://uconn.edu/b": 2}


def test_vacuum_removes_orphans_only(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    f0 = cat.stage(spark.range(4).withColumnRenamed("id", "v"), "t", 0)
    cat.commit(0, {"t": f0})
    # orphan: staged but never committed (simulated crash mid-generation)
    cat.stage(spark.range(9).withColumnRenamed("id", "v"), "t", 1)
    removed = cat.vacuum()
    assert removed  # the orphan files went away
    assert cat.read(spark, "t").count() == 4  # committed data intact
    assert cat.vacuum() == []  # idempotent


def test_flatten_for_export_and_csv_roundtrip(spark, tmp_path):
    """Exporter flattening (exporters.py _flatten_data twin): structs ->
    dotted columns, arrays -> JSON strings, binary -> base64; CSV roundtrip
    preserves values."""
    import json

    from pyspark.sql import functions as F

    from scrapy_spark.sources.exporters import export_csv, flatten_for_export

    df = spark.range(3).select(
        F.col("id"),
        F.struct(
            F.col("id").cast("string").alias("name"),
            F.struct((F.col("id") * 2).alias("deep")).alias("inner"),
        ).alias("meta"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("blob"),
    )
    flat = flatten_for_export(df)
    assert flat.columns == ["id", "meta.name", "meta.inner.deep", "arr", "blob"]
    row = {r["id"]: r for r in flat.collect()}
    assert row[1]["meta.name"] == "1" and row[1]["meta.inner.deep"] == 2
    assert json.loads(row[2]["arr"]) == [2, 3]
    out = str(tmp_path / "csv_out")
    export_csv(df, out, compression="none")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert sorted(back.columns) == sorted(flat.columns)


def test_warehouse_star_export_versioning(spark):
    """fact_pages: one is_current row per url_hash, versions ordered by
    (generation, attempt); dim_host counts distinct pages vs fetches
    (warehouse.py insert_page SCD-2 semantics)."""
    from scrapy_spark.sources.warehouse import star_export

    rows = [
        # url A fetched in gen 0 and revalidated in gen 2 -> 2 versions
        (11, "https://a.uconn.edu/x", "a.uconn.edu", 0, 1, 200, "text/html",
         "html_page", "medium", True, True, "t0"),
        (11, "https://a.uconn.edu/x", "a.uconn.edu", 2, 1, 200, "text/html",
         "html_page", "medium", True, True, "t1"),
        # url B transient 599 then success in same gen ordering by attempt
        (22, "https://a.uconn.edu/y", "a.uconn.edu", 1, 1, 599, None,
         "error", "error", False, False, None),
        (22, "https://a.uconn.edu/y", "a.uconn.edu", 1, 2, 200, "text/html",
         "html_page", "high", True, True, "t2"),
        # url C once
        (33, "https://b.uconn.edu/z", "b.uconn.edu", 0, 1, 200, "image/png",
         "image", "medium", False, True, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url_hash long, url string, host string, generation int, attempt int, "
        "status_code int, content_type string, content_category string, "
        "content_quality string, is_enrichable boolean, is_valid boolean, "
        "title string",
    )
    out = star_export(df)
    fact = {(r["url_hash"], r["crawl_version"]): r for r in out["fact_pages"].collect()}
    assert len(fact) == 5
    assert fact[(11, 1)]["title"] == "t0" and not fact[(11, 1)]["is_current"]
    assert fact[(11, 2)]["title"] == "t1" and fact[(11, 2)]["is_current"]
    assert fact[(22, 1)]["status_code"] == 599 and not fact[(22, 1)]["is_current"]
    assert fact[(22, 2)]["is_current"]
    # exactly one current row per page
    cur = [k for k, r in fact.items() if r["is_current"]]
    assert sorted(u for u, _ in cur) == [11, 22, 33]
    dims = {r["host"]: r for r in out["dim_host"].collect()}
    assert dims["a.uconn.edu"]["n_pages"] == 2
    assert dims["a.uconn.edu"]["n_fetches"] == 4
    assert dims["b.uconn.edu"]["n_pages"] == 1
    assert dims["a.uconn.edu"]["first_generation"] == 0
    assert dims["a.uconn.edu"]["last_generation"] == 2


def test_prometheus_exposition(spark, tmp_path):
    """Prometheus text-format export renders the catalog's metrics/lineage
    facts (metrics_emitter.py / performance_metrics.py surface) with
    spec-shaped HELP/TYPE headers and correct sums."""
    import re

    import pandas as pd

    from scrapy_spark.sources.catalog import SnapshotCatalog
    from scrapy_spark.sources.metrics_export import prometheus_exposition

    cat = SnapshotCatalog(str(tmp_path / "wd"))
    for gen, (sched, fet, fail, img) in enumerate([(10, 9, 1, 3), (20, 18, 2, 5)]):
        lin = pd.DataFrame(
            [{"host": "h.uconn.edu", "scheduled": sched, "fetched": fet,
              "failed": fail, "images": img, "schema_valid": fet,
              "generation": gen}]
        )
        met = pd.DataFrame(
            [{"generation": gen, "stage": "crawl_generation",
              "items_processed": sched, "items_per_second": float(sched) / 2.0,
              "elapsed_seconds": 2.0}]
        )
        cat.commit(gen, {
            "lineage": cat.stage_pandas(lin, "lineage", gen),
            "metrics": cat.stage_pandas(met, "metrics", gen),
        })
    text = prometheus_exposition(spark, cat)
    lines = text.strip().splitlines()
    # every non-comment line parses as the exposition line format
    pat = re.compile(r'^[a-z_]+(\{[a-z_]+="[^"]*"(,[a-z_]+="[^"]*")*\})? \S+$')
    for ln in lines:
        if not ln.startswith("#"):
            assert pat.match(ln), ln
    assert "crawl_generations_total 2" in text
    assert "crawl_urls_scheduled_total 30" in text
    assert "crawl_urls_fetched_total 27" in text
    assert "crawl_urls_failed_total 3" in text
    assert 'crawl_stage_items_per_second{generation="1",stage="crawl_generation"} 10' in text
    assert "crawl_elapsed_seconds_total 4" in text
    # HELP/TYPE precede each metric family
    assert text.index("# TYPE crawl_urls_scheduled_total counter") < text.index(
        "crawl_urls_scheduled_total 30"
    )


def test_vendor_ingest_versioning(spark, tmp_path):
    """Vendor file ingestion (vendor_integration.py:42-180 FileVendorSource
    + warehouse.py:316-340 insert_vendor_data): csv read -> normalized
    vendor_data records with raw_data JSON and a page_id link; re-ingest
    appends a batch and the SCD-2 election marks exactly one is_current row
    per (vendor, record_key)."""
    from scrapy_spark.functions.hashing import spark_xxhash64_str
    from scrapy_spark.functions.urls import canonicalize
    from scrapy_spark.sources.vendor import ingest, vendor_data

    src = tmp_path / "vendor.csv"
    src.write_text(
        "id,name,url\n"
        "1,Alpha,https://www.uconn.edu/a\n"
        "2,Beta,https://www.uconn.edu/b\n"
    )
    out = str(tmp_path / "vendor_data")
    r1 = ingest(spark, str(src), "csv", out, "acme", key_col="id", url_col="url")
    assert r1 == {"vendor": "acme", "batch": 0, "rows": 2}
    # re-ingest: key 1 changed (new version), key 3 new, key 2 absent
    src.write_text(
        "id,name,url\n"
        "1,Alpha2,https://www.uconn.edu/a\n"
        "3,Gamma,https://www.uconn.edu/c\n"
    )
    r2 = ingest(spark, str(src), "csv", out, "acme", key_col="id", url_col="url")
    assert r2["batch"] == 1 and r2["rows"] == 2
    rows = vendor_data(spark, out).collect()
    assert len(rows) == 4
    cur = {r["record_key"]: r for r in rows if r["is_current"]}
    assert set(cur) == {"1", "2", "3"}
    assert json.loads(cur["1"]["raw_data"])["name"] == "Alpha2"
    k1 = sorted(
        (r for r in rows if r["record_key"] == "1"),
        key=lambda r: r["crawl_version"],
    )
    assert [r["is_current"] for r in k1] == [False, True]
    assert json.loads(k1[0]["raw_data"])["name"] == "Alpha"
    # page_id is the engine's page key: xxhash64 of the canonical URL
    assert cur["1"]["page_id"] == spark_xxhash64_str(
        canonicalize("https://www.uconn.edu/a")
    )
    # jsonl source, content-hash key (no key_col), same table
    jl = tmp_path / "vendor.jsonl"
    jl.write_text('{"id": 9, "name": "Judy"}\n')
    r3 = ingest(spark, str(jl), "jsonl", out, "books")
    assert r3["batch"] == 2 and r3["rows"] == 1
    rows = vendor_data(spark, out).collect()
    b = [r for r in rows if r["vendor_name"] == "books"]
    assert len(b) == 1 and b[0]["is_current"] and b[0]["data_type"] == "jsonl"
    assert b[0]["page_id"] is None


def test_catalog_format_version_gate(spark, tmp_path):
    """A workdir committed by a pre-is_final build (manifest format v1, or
    no format key at all) must be REFUSED at open — resuming it under this
    build would silently drop every old row from the three-valued finality
    filters. A newer-format manifest is refused too, with its own message."""
    import json as _json

    import pytest
    from pyspark.sql import functions as F

    root = str(tmp_path / "cat")
    cat = SnapshotCatalog(root)
    df = spark.range(3).select(F.col("id").alias("url_hash"))
    staged = {"fetch_results": cat.stage(df, "fetch_results", 0)}
    cat.commit(0, staged)
    mpath = cat._manifest_path
    m = _json.loads(open(mpath).read())
    assert m["format"] == 2  # current build stamps its version

    m_old = dict(m)
    del m_old["format"]  # pre-versioning manifest == v1
    open(mpath, "w").write(_json.dumps(m_old))
    with pytest.raises(ValueError, match="format v1.*is_final"):
        SnapshotCatalog(root).read(spark, "fetch_results")

    m_new = dict(m, format=99)
    open(mpath, "w").write(_json.dumps(m_new))
    with pytest.raises(ValueError, match="NEWER build"):
        SnapshotCatalog(root).committed_generation()


def _stage_n(cat, spark, table, gen, chunks):
    """Stage `chunks` (list of (start, n)) as one file each; return files."""
    files = []
    for start, n in chunks:
        df = spark.range(start, start + n).withColumnRenamed("id", "v")
        files += cat.stage(df, table, gen, coalesce=1)
    return files


def test_catalog_compact_per_generation(spark, tmp_path):
    """Default compact rewrites each multi-file generation group under the
    SAME g-prefix: rows identical, time travel + resume numbering intact,
    replaced files become vacuumable orphans."""
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    f0 = _stage_n(cat, spark, "t", 0, [(0, 5), (10, 5), (20, 5)])
    cat.commit(0, {"t": f0})
    f1 = _stage_n(cat, spark, "t", 1, [(100, 4), (110, 4)])
    cat.commit(1, {"t": f1})
    before = {r.v for r in cat.read(spark, "t").collect()}
    upto0 = {r.v for r in cat.read_upto(spark, "t", 0).collect()}
    n_snaps = len(cat.snapshots())

    s = cat.compact(spark, "t")
    assert s["before_files"] == 5 and s["after_files"] == 2
    assert {r.v for r in cat.read(spark, "t").collect()} == before
    assert {r.v for r in cat.read_upto(spark, "t", 0).collect()} == upto0
    assert cat.committed_generation() == 1  # numbering untouched
    assert len(cat.snapshots()) == n_snaps + 1  # one overwrite snapshot
    assert set(cat.orphan_files()) == set(f0) | set(f1)
    cat.vacuum()
    assert {r.v for r in cat.read(spark, "t").collect()} == before


def test_catalog_compact_collapse_and_noop(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    f0 = _stage_n(cat, spark, "seen", 0, [(0, 3), (10, 3)])
    cat.commit(0, {"seen": f0})
    f1 = _stage_n(cat, spark, "seen", 1, [(20, 3)])
    cat.commit(1, {"seen": f1})
    before = {r.v for r in cat.read(spark, "seen").collect()}

    s = cat.compact(spark, "seen", collapse=True)
    assert s["after_files"] == 1
    m_files = cat._load()["tables"]["seen"]
    assert len(m_files) == 1 and "g00001-" in m_files[0]  # latest prefix
    assert {r.v for r in cat.read(spark, "seen").collect()} == before

    # already compact -> no-op: no rewrite, no extra snapshot
    n_snaps = len(cat.snapshots())
    s2 = cat.compact(spark, "seen", collapse=True)
    assert s2["before_files"] == s2["after_files"] == 1
    assert len(cat.snapshots()) == n_snaps


def test_compact_cli_over_crawl_workdir(spark, tmp_path, capsys):
    """Lock the CLI surface: compact a real (tiny) crawl workdir, then the
    compacted catalog still reads and reports."""
    import json as _json

    from main import main as cli_main

    from scrapy_spark.plans.crawl import CrawlJob, CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    wd = str(tmp_path / "crawl")
    cfg = SynthConfig(seed=7, n_hosts=4, n_pages=40, n_images=10)
    job = CrawlJob(spark, cfg, CrawlParams(max_generations=2, per_host_budget=4), wd)
    job.run()
    cat = SnapshotCatalog(wd)
    before = {
        r.url_hash for r in cat.read(spark, "url_seen").select("url_hash").collect()
    }

    rc = cli_main(["compact", "--workdir", wd, "--table", "url_seen",
                   "--collapse", "--vacuum"])
    assert rc == 0
    lines = [
        _json.loads(x)
        for x in capsys.readouterr().out.splitlines()
        if x.startswith("{")
    ]
    assert lines[0]["table"] == "url_seen"
    assert lines[0]["after_files"] <= lines[0]["before_files"]
    after = {
        r.url_hash for r in cat.read(spark, "url_seen").select("url_hash").collect()
    }
    assert after == before


def test_expire_snapshots_keeps_op_entries(spark, tmp_path):
    """Snapshot-log expiry drops old plain commits but NEVER maintenance-op
    entries (crawl resume consults them for purge catch-up)."""
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    for g in range(6):
        f = _stage_n(cat, spark, "t", g, [(g * 10, 2)])
        cat.commit(g, {"t": f})
    # a maintenance overwrite early in the log
    cat.commit_rewrite({"t": cat._load()["tables"]["t"]},
                       stats={"op": "purge_host", "host": "x.uconn.edu"})
    for g in range(6, 9):
        f = _stage_n(cat, spark, "t", g, [(g * 10, 2)])
        cat.commit(g, {"t": f})
    total = len(cat.snapshots())  # 10 entries: 9 commits + 1 op (mid-log)
    assert total == 10
    expired = cat.expire_snapshots(keep_last=3)
    snaps = cat.snapshots()
    assert expired == total - len(snaps)
    assert len(snaps) == 4  # last 3 + the always-kept op entry
    assert any((s["stats"] or {}).get("op") == "purge_host" for s in snaps)
    assert cat.committed_generation() == 8  # untouched
    assert cat.read(spark, "t").count() == 18  # data untouched
    assert cat.expire_snapshots(keep_last=3) in (0, 1)  # idempotent-ish tail


def test_diff_cli_time_travel(spark, tmp_path, capsys):
    """diff CLI: newly-seen URLs between two generations == the url_seen
    rows committed at generations in (from, to] (snapshot append-only)."""
    import json as _json

    from main import main as cli_main

    from scrapy_spark.plans.crawl import CrawlJob, CrawlParams
    from scrapy_spark.sources.synth import SynthConfig

    wd = str(tmp_path / "crawl")
    cfg = SynthConfig(seed=5, n_hosts=4, n_pages=40, n_images=10)
    CrawlJob(spark, cfg, CrawlParams(max_generations=3, per_host_budget=5), wd).run()
    cat = SnapshotCatalog(wd)
    seen = cat.read(spark, "url_seen")
    want = seen.filter("generation > 0 AND generation <= 2").count()

    rc = cli_main(["diff", "--workdir", wd, "--from", "0", "--to", "2"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    d = _json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert d["new_urls"] == want
    assert sum(d["by_host"].values()) == want
    assert len(d["sample"]) == min(10, want)
    # out-of-range guards: to beyond committed, and from > to
    assert cli_main(["diff", "--workdir", wd, "--from", "0", "--to", "9"]) == 2
    assert cli_main(["diff", "--workdir", wd, "--from", "2", "--to", "1"]) == 2


def test_compact_sort_by_gives_sorted_files(spark, tmp_path):
    """compact(sort_by=...) rewrites each file fully sorted (row-group
    stats become selective) without changing table contents."""
    import pyarrow.parquet as _pq
    import os as _os

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    # interleaved values across files so the pre-compact layout is unsorted
    f0 = _stage_n(cat, spark, "seen", 0, [(100, 5), (0, 5), (50, 5)])
    cat.commit(0, {"seen": f0})
    before = {r.v for r in cat.read(spark, "seen").collect()}

    s = cat.compact(spark, "seen", sort_by="v")
    assert s["after_files"] == 1
    assert {r.v for r in cat.read(spark, "seen").collect()} == before
    f = cat._load()["tables"]["seen"][0]
    vals = _pq.read_table(_os.path.join(str(tmp_path / "cat"), f)).column("v").to_pylist()
    assert vals == sorted(vals)

    # an explicit sort request rewrites even the (already-collapsed)
    # single-file group — no silent no-op
    f1 = _stage_n(cat, spark, "one", 0, [(30, 3), (0, 3)])
    cat.commit(1, {"one": f1})
    cat.compact(spark, "one", collapse=True)          # -> 1 unsorted file
    s2 = cat.compact(spark, "one", collapse=True, sort_by="v")
    assert s2["after_files"] == 1
    f = cat._load()["tables"]["one"][0]
    vals = _pq.read_table(_os.path.join(str(tmp_path / "cat"), f)).column("v").to_pylist()
    assert vals == sorted(vals)

    # unknown sort column fails fast, before any rewrite
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sort_by column"):
        cat.compact(spark, "one", sort_by="nope")
