"""Seed-list maintenance (sources/seeds.py + main.py seeds CLI — the
tools/update_seeds.py graft): the merged seed CSV is canonical, deduped,
sorted and free of already-crawled URLs, and a crawl launched FROM it
schedules exactly what the sequential oracle schedules for the same seed
list (the round-trip)."""

from __future__ import annotations

import csv
import json

from scrapy_spark.functions.urls import canonicalize
from scrapy_spark.plans.crawl import CrawlJob
from scrapy_spark.plans.oracle import CrawlParams, run_oracle
from scrapy_spark.sources.catalog import SnapshotCatalog
from scrapy_spark.sources.synth import SynthConfig

CFG = SynthConfig(seed=7, n_hosts=4, n_pages=40, n_images=10)


def _read_seed_csv(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return [r["url"] for r in rows]


def test_seeds_cli_roundtrip(spark, tmp_path, capsys):
    from main import main as cli_main

    wd1 = str(tmp_path / "crawl1")
    CrawlJob(spark, CFG, CrawlParams(max_generations=2, per_host_budget=4), wd1).run()
    cat = SnapshotCatalog(wd1)
    seen_urls = {r["url"] for r in cat.read(spark, "url_seen").collect()}

    out = str(tmp_path / "seeds.csv")
    rc = cli_main(["seeds", "--workdir", wd1, "--out", out])
    assert rc in (0, None)
    line = [
        json.loads(x)
        for x in capsys.readouterr().out.splitlines()
        if x.startswith("{")
    ][-1]
    urls = _read_seed_csv(out)
    assert line["seeds"] == len(urls) > 0
    # tool guarantees: canonical, deduped, sorted, nothing already crawled
    assert urls == sorted(set(urls))
    assert all(canonicalize(u) == u for u in urls)
    assert not (set(urls) & seen_urls)

    # round-trip: a crawl launched from the merged CSV schedules EXACTLY
    # what the sequential oracle schedules for the same seed list
    wd2 = str(tmp_path / "crawl2")
    params = CrawlParams(max_generations=1, per_host_budget=4)
    job = CrawlJob(spark, CFG, params, wd2, seed_file=out)
    job.run()
    results = job.catalog.read(spark, "fetch_results").collect()
    oracle = run_oracle(CFG, params, seed_urls=urls)
    ours = {
        (r["generation"], r["host"], r["rank_in_host"]): r["url"] for r in results
    }
    theirs = {
        (r["generation"], r["host"], r["rank_in_host"]): r["url"]
        for r in oracle.scheduled
    }
    assert ours == theirs and ours
    # the seed-sourced schedule is genuinely new work vs the first crawl
    seed_rows = [r for r in results if r["source_type"] == "seed"]
    assert seed_rows
    assert not ({r["url"] for r in seed_rows} & seen_urls)


def test_seeds_fetch_results_source_applies_quality_gate(spark, tmp_path, capsys):
    """--merge-from fetch_results reproduces the reference's gate: only
    200 text/html pages, counted against --min-validations (each URL is
    fetched once here, so min 2 empties the list)."""
    from main import main as cli_main

    wd = str(tmp_path / "crawl")
    CrawlJob(spark, CFG, CrawlParams(max_generations=2, per_host_budget=4), wd).run()
    cat = SnapshotCatalog(wd)
    ok = {
        canonicalize(r["url"])
        for r in cat.read(spark, "fetch_results").collect()
        if r["status_code"] == 200
        and r["content_type"] == "text/html"
        and r["error_type"] is None
    }

    out = str(tmp_path / "hq.csv")
    rc = cli_main(["seeds", "--workdir", wd, "--merge-from", "fetch_results",
                   "--include-seen", "--out", out])
    assert rc in (0, None)
    assert set(_read_seed_csv(out)) == ok

    out2 = str(tmp_path / "hq2.csv")
    rc = cli_main(["seeds", "--workdir", wd, "--merge-from", "fetch_results",
                   "--include-seen", "--min-validations", "2", "--out", out2])
    assert rc in (0, None)
    assert _read_seed_csv(out2) == []
    capsys.readouterr()

    # merging an existing seed file unions and dedups against it
    extra = str(tmp_path / "extra.csv")
    some = sorted(ok)[0]
    with open(extra, "w") as f:
        f.write("url\nhttps://new.uconn.edu/only-here\n" + some + "\n")
    out3 = str(tmp_path / "merged.csv")
    rc = cli_main(["seeds", "--workdir", wd, "--merge-from", "fetch_results",
                   "--include-seen", "--seed-file", extra, "--out", out3])
    assert rc in (0, None)
    merged = _read_seed_csv(out3)
    assert set(merged) == ok | {"https://new.uconn.edu/only-here"}
    assert len(merged) == len(set(merged))

    # unknown table refuses with a clean exit code
    assert cli_main(["seeds", "--workdir", wd, "--merge-from", "nope",
                     "--out", str(tmp_path / "x.csv")]) == 2
