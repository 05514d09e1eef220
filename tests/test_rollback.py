"""Snapshot rollback (catalog.rollback + main.py rollback CLI) — the reset
half of the reference checkpoint manager (SP/tools/checkpoint_manager_cli.py):
rolling a workdir back to generation N must be indistinguishable, table for
table, from a crawl that STOPPED at N — and resuming from the rolled-back
state must land exactly where an uninterrupted run does. Maintenance ops
committed after N sever the rollback and must refuse."""

from __future__ import annotations

import json

from scrapy_spark.plans.crawl import CrawlJob
from scrapy_spark.plans.oracle import CrawlParams
from scrapy_spark.sources.catalog import SnapshotCatalog
from scrapy_spark.sources.synth import SynthConfig

CFG = SynthConfig(seed=7, n_hosts=4, n_pages=40, n_images=10)

# metrics carries wall-clock timings (the documented nondeterministic
# column family); everything else in the catalog is bit-deterministic
_NONDET_TABLES = {"metrics"}


def _crawl(spark, wd, gens, resume=False):
    job = CrawlJob(
        spark, CFG, CrawlParams(max_generations=gens, per_host_budget=4), wd
    )
    job.run(resume=resume)
    return job


def _table_rows(spark, wd):
    cat = SnapshotCatalog(wd)
    out = {}
    for t in sorted(cat._load()["tables"]):
        if t in _NONDET_TABLES:
            continue
        out[t] = sorted(
            (
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in row
                )
                for row in cat.read(spark, t).collect()
            ),
            key=repr,  # rows mix None/str/list — repr totals the order
        )
    return out


def test_rollback_matches_stopped_crawl_and_resume_catches_up(
    spark, tmp_path, capsys
):
    from main import main as cli_main

    wd_full = str(tmp_path / "full")  # uninterrupted 4-gen reference
    wd_stop = str(tmp_path / "stop")  # stopped at generation 1
    wd_rb = str(tmp_path / "rb")      # 4 gens, rolled back to 1, resumed
    _crawl(spark, wd_full, 4)
    _crawl(spark, wd_stop, 2)
    _crawl(spark, wd_rb, 4)

    rc = cli_main(["rollback", "--workdir", wd_rb, "--to-generation", "1",
                   "--vacuum"])
    assert rc in (0, None)
    out = [
        json.loads(x)
        for x in capsys.readouterr().out.splitlines()
        if x.startswith("{")
    ][-1]
    assert out["op"] == "rollback" and out["to"] == 1
    assert out["dropped_files"] > 0 and out["removed_files"] >= out["dropped_files"]

    cat = SnapshotCatalog(wd_rb)
    assert cat.committed_generation() == 1
    assert cat.orphan_files() == []  # --vacuum reclaimed the post-N files
    # table-for-table identical to the crawl that stopped at N
    assert _table_rows(spark, wd_rb) == _table_rows(spark, wd_stop)
    # the rollback is in the snapshot log as a maintenance op
    assert any(
        (s["stats"] or {}).get("op") == "rollback" for s in cat.snapshots()
    )

    # resume re-runs generations 2..3 and lands exactly on the
    # uninterrupted run (deterministic synth + snapshot resume)
    _crawl(spark, wd_rb, 4, resume=True)
    assert _table_rows(spark, wd_rb) == _table_rows(spark, wd_full)


def test_rollback_refusals(spark, tmp_path, capsys):
    from main import main as cli_main

    wd = str(tmp_path / "c")
    _crawl(spark, wd, 3)
    cat = SnapshotCatalog(wd)

    # out-of-range targets
    assert cli_main(["rollback", "--workdir", wd, "--to-generation", "9"]) == 2
    assert cli_main(["rollback", "--workdir", wd, "--to-generation", "-1"]) == 2
    capsys.readouterr()

    # rollback to the current head is a no-op (no files dropped, no new op)
    n_snaps = len(cat.snapshots())
    out = cat.rollback(2)
    assert out["dropped_files"] == 0 and len(cat.snapshots()) == n_snaps

    # a maintenance op after N severs the rollback: refuse loudly
    cat.compact(spark, "url_seen", collapse=True)
    rc = cli_main(["rollback", "--workdir", wd, "--to-generation", "1"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "refused" in err and "compact" in err
    assert cat.committed_generation() == 2  # untouched

    # but rolling back to a generation AT/after the op's commit point is
    # impossible too only for earlier gens — the op anchored at gen 2 (the
    # current head) still blocks gen-1 rollback while head stays resumable
    _crawl(spark, wd, 4, resume=True)


def test_rollback_composes_with_earlier_rollback(spark, tmp_path):
    """A rollback op entry never severs a later, deeper rollback: the
    earlier rollback only dropped refs ABOVE its target, so the state at
    any lower generation is intact (review finding r7: the first cut
    refused here and locked the feature out of the workdir)."""
    wd = str(tmp_path / "rr")
    wd_stop = str(tmp_path / "rr_stop")
    _crawl(spark, wd, 4)
    _crawl(spark, wd_stop, 2)
    cat = SnapshotCatalog(wd)
    cat.rollback(2)
    _crawl(spark, wd, 4, resume=True)      # re-run 3.. past the rollback
    out = cat.rollback(1)                   # deeper rollback must compose
    assert out["op"] == "rollback" and out["to"] == 1
    assert cat.committed_generation() == 1
    # and the rolled-back state is still bit-identical to a stopped crawl
    assert _table_rows(spark, wd) == _table_rows(spark, wd_stop)
