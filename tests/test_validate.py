"""Launch-time health check (plans/validate.py — config_validator.py:25-399
semantics): every check fires on the bad input it guards, stays quiet on a
healthy config, and the CLI gate exits non-zero on errors."""

from __future__ import annotations

import json
import os

import pytest

from scrapy_spark.plans.oracle import CrawlParams
from scrapy_spark.plans.validate import health_check, print_report
from scrapy_spark.sources.synth import SynthConfig


def _msgs(report, severity=None):
    return [
        i.message
        for i in report.issues
        if severity is None or i.severity == severity
    ]


def test_healthy_config_passes(tmp_path):
    r = health_check(SynthConfig(), CrawlParams(), str(tmp_path / "wd"))
    assert r.ok, _msgs(r)
    assert not _msgs(r, "error") and not _msgs(r, "warning")


def test_workdir_not_creatable(tmp_path):
    # a plain FILE occupies the workdir path (chmod tricks don't bind as
    # root): makedirs must fail and surface as a filesystem error
    blocker = tmp_path / "blocked"
    blocker.write_text("i am a file")
    r = health_check(SynthConfig(), CrawlParams(), str(blocker))
    assert not r.ok
    assert any("not creatable/writable" in m for m in _msgs(r, "error"))


def test_gen_cap_vs_seeds_and_budget():
    r = health_check(
        SynthConfig(n_seeds=100),
        CrawlParams(gen_cap=50, per_host_budget=0, max_generations=0),
    )
    errs = " ".join(_msgs(r, "error"))
    assert "gen_cap=50 < n_seeds=100" in errs
    assert "per_host_budget" in errs and "max_generations" in errs


def test_performance_warnings():
    r = health_check(
        SynthConfig(), CrawlParams(per_host_budget=500, gen_cap=1_000_000)
    )
    assert r.ok  # warnings, not errors (config_validator.py:252-273)
    warns = " ".join(_msgs(r, "warning"))
    assert "per_host_budget" in warns and "gen_cap" in warns


def test_purge_after_checks():
    r = health_check(SynthConfig(), CrawlParams(purge_after=(-1, "")))
    errs = " ".join(_msgs(r, "error"))
    assert "purge_after host is empty" in errs
    assert "must be >= 0" in errs
    r2 = health_check(
        SynthConfig(), CrawlParams(max_generations=4, purge_after=(3, "x.uconn.edu"))
    )
    assert r2.ok
    assert any("no later generation" in m for m in _msgs(r2, "warning"))
    r3 = health_check(
        SynthConfig(), CrawlParams(max_generations=4, purge_after=(1, "x.uconn.edu"))
    )
    assert r3.ok and not _msgs(r3, "warning")


def test_synth_invariants():
    r = health_check(
        SynthConfig(n_hosts=8, n_pages=4, n_seeds=6, bad_hosts=(99,)),
        CrawlParams(),
    )
    assert not r.ok
    assert any("out of range" in m for m in _msgs(r, "error"))
    warns = " ".join(_msgs(r, "warning"))
    assert "n_pages=4 < n_hosts=8" in warns
    assert "n_seeds=6 > n_pages=4" in warns


def test_feature_flag_invariants():
    r = health_check(
        SynthConfig(),
        CrawlParams(
            revalidate=True,
            revalidate_after_gens=0,
            rate_control=True,
            breaker_limit=0,
            aimd_threshold=1.5,
            pagination_guess=True,
            pagination_lookahead=0,
            validation_threshold=2.0,
        ),
    )
    errs = " ".join(_msgs(r, "error"))
    for frag in (
        "revalidate_after_gens",
        "breaker_limit",
        "aimd_threshold",
        "pagination_lookahead",
        "validation_threshold",
    ):
        assert frag in errs, frag


def test_revalidate_never_due_warning():
    r = health_check(
        SynthConfig(),
        CrawlParams(revalidate=True, max_generations=2, revalidate_after_gens=3),
    )
    assert r.ok
    assert any("never" in m or "no page" in m for m in _msgs(r, "warning"))


def test_as_of_env_checks(monkeypatch):
    # import the registry FIRST (with the default anchor) — importing it
    # under a patched env would bake the test value into AS_OF_AT_IMPORT
    # for the rest of the session
    import scrapy_spark.entry_queries as eq

    monkeypatch.setenv("SPARK_GRAFT_AS_OF", "not-a-date")
    r = health_check(SynthConfig(), CrawlParams())
    assert any("ISO date" in m for m in _msgs(r, "error"))
    # a mid-process change after the registry import is the desync trap
    monkeypatch.setenv("SPARK_GRAFT_AS_OF", "1999-01-01")
    assert eq.AS_OF_AT_IMPORT != "1999-01-01"
    r = health_check(SynthConfig(), CrawlParams())
    assert any("desynchronize" in m for m in _msgs(r, "error"))


def test_staging_dir_check(monkeypatch, tmp_path):
    monkeypatch.setenv(
        "SPARK_GRAFT_MATERIALIZE_DIR", "s3a://bucket/staging"
    )
    r = health_check(SynthConfig(), CrawlParams())
    assert r.ok  # remote URI: shape-checked only, info not error
    assert any("remote URI" in m for m in _msgs(r, "info"))
    local = tmp_path / "stage"
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", str(local))
    r = health_check(SynthConfig(), CrawlParams())
    assert r.ok and local.is_dir()  # probed and created


def test_catalog_state_surfaced(spark, tmp_path):
    from scrapy_spark.plans.crawl import CrawlJob

    wd = str(tmp_path / "wd")
    cfg = SynthConfig(n_hosts=4, n_pages=40, n_images=10, n_seeds=4)
    params = CrawlParams(max_generations=1, per_host_budget=5)
    CrawlJob(spark, cfg, params, wd, salt_buckets=2).run()
    r = health_check(cfg, params, wd)
    assert r.ok
    assert any("committed generation 0" in m for m in _msgs(r, "info"))
    # plant an orphan: vacuum-eligible staged file -> warning
    with open(os.path.join(wd, "_stage-dead.parquet"), "wb") as fh:
        fh.write(b"x")
    r = health_check(cfg, params, wd)
    assert any("orphan" in m for m in _msgs(r, "warning"))


def test_cli_validate_exit_codes(tmp_path, capsys):
    from main import main as cli_main

    rc = cli_main(["validate", "--workdir", str(tmp_path / "ok")])
    assert rc == 0
    assert "PASSED" in capsys.readouterr().out
    rc = cli_main(
        ["validate", "--workdir", str(tmp_path / "bad"), "--per-host-budget", "0"]
    )
    assert rc == 1
    assert "FAILED" in capsys.readouterr().out


def test_cli_crawl_gated_on_health(tmp_path, capsys):
    """A bad combination fails AT LAUNCH, before any Spark session."""
    from main import main as cli_main

    rc = cli_main(
        [
            "crawl",
            "--workdir",
            str(tmp_path / "wd"),
            "--gen-cap",
            "2",  # < default n_seeds=10 -> error
        ]
    )
    assert rc == 1
    assert "gen_cap" in capsys.readouterr().out


def test_print_report_groups(capsys):
    r = health_check(
        SynthConfig(), CrawlParams(per_host_budget=500, max_generations=0)
    )
    print_report(r)
    out = capsys.readouterr().out
    assert "ERROR" in out and "WARNING" in out and "FAILED" in out
