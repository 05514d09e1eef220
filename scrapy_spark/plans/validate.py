"""Pre-run configuration health check — the launch-time gate.

Rebuilds the reference's ``ConfigHealthCheck`` / ``validate_config_health``
(``Scraping_project/src/common/config_validator.py:25-399``, invoked before
every pipeline run at ``orchestrator/main.py:302-309``): filesystem
writability, logic limits and performance-footgun warnings, each with an
actionable suggestion, severity-tiered (error aborts the launch, warning and
info do not). The rebuild checks the analogous knobs of this engine —
CrawlParams / SynthConfig invariants, workdir + materializer-staging
writability, catalog state (orphans → vacuum), and the SPARK_GRAFT_AS_OF
recency anchor — instead of scrapy/browser settings the graft replaces.

A bad combination (e.g. ``gen_cap < n_seeds``) previously failed mid-run;
``main.py validate`` surfaces it before any Spark session exists.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..sources.synth import SynthConfig
from .oracle import CrawlParams

SEVERITIES = ("error", "warning", "info")


@dataclass
class Issue:
    severity: str  # error | warning | info
    category: str  # filesystem | logic | catalog | env
    message: str
    suggestion: str = ""


@dataclass
class HealthReport:
    issues: list[Issue] = field(default_factory=list)

    def add(self, severity: str, category: str, message: str, suggestion: str = ""):
        assert severity in SEVERITIES, severity
        self.issues.append(Issue(severity, category, message, suggestion))

    @property
    def ok(self) -> bool:
        """False iff any error-level issue exists (config_validator.py:63-65)."""
        return not any(i.severity == "error" for i in self.issues)

    def by_severity(self, severity: str) -> list[Issue]:
        return [i for i in self.issues if i.severity == severity]


def _probe_writable(path: str) -> OSError | None:
    """Create ``path`` and round-trip a probe file; returns the failure (or
    None). The probe name is pid-unique so concurrent validates can't
    collide."""
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, f".write_probe-{os.getpid()}")
        with open(probe, "w") as fh:
            fh.write("ok")
        os.remove(probe)
    except OSError as e:
        return e
    return None


def _check_filesystem(report: HealthReport, workdir: str) -> None:
    """Workdir must be creatable and writable (config_validator.py:67-138)."""
    e = _probe_writable(workdir)
    if e is not None:
        report.add(
            "error", "filesystem",
            f"workdir {workdir} is not creatable/writable: {e}",
            "check permissions or choose another --workdir",
        )


def _check_staging(report: HealthReport) -> None:
    """Materializer staging dir (plans/materialize): local paths are probed;
    remote URIs need a live session's Hadoop FS, so only their shape is
    checked here."""
    staging = os.environ.get("SPARK_GRAFT_MATERIALIZE_DIR")
    if not staging:
        return
    if "://" in staging:
        report.add(
            "info", "filesystem",
            f"staging dir {staging} is a remote URI — writability is "
            "verified at session start, not here",
        )
        return
    e = _probe_writable(staging)
    if e is not None:
        report.add(
            "error", "filesystem",
            f"materializer staging dir {staging} is not writable: {e}",
            "fix SPARK_GRAFT_MATERIALIZE_DIR or unset it (local runs "
            "fall back to localCheckpoint)",
        )


def _check_synth(report: HealthReport, cfg: SynthConfig) -> None:
    if cfg.n_hosts < 1:
        report.add("error", "logic", f"n_hosts={cfg.n_hosts} must be >= 1")
    if cfg.n_pages < 1:
        report.add("error", "logic", f"n_pages={cfg.n_pages} must be >= 1")
    if cfg.n_hosts >= 1 and cfg.n_pages < cfg.n_hosts:
        report.add(
            "warning", "logic",
            f"n_pages={cfg.n_pages} < n_hosts={cfg.n_hosts}: the zipf layout "
            "floors every host at one page, so the corpus exceeds n_pages",
            "raise n_pages or lower n_hosts",
        )
    if cfg.n_seeds < 1:
        report.add("error", "logic", f"n_seeds={cfg.n_seeds} must be >= 1")
    if cfg.n_seeds > cfg.n_pages:
        report.add(
            "warning", "logic",
            f"n_seeds={cfg.n_seeds} > n_pages={cfg.n_pages}: generation 0 "
            "re-seeds duplicate pages",
            "lower n_seeds",
        )
    for name in ("bad_hosts", "throttle_hosts"):
        for h in getattr(cfg, name):
            if not (0 <= h < cfg.n_hosts):
                report.add(
                    "error", "logic",
                    f"{name} index {h} out of range [0, {cfg.n_hosts})",
                )
    if cfg.img_w < 1 or cfg.img_h < 1:
        report.add("error", "logic", "image dimensions must be >= 1")


def _check_params(
    report: HealthReport, params: CrawlParams, cfg: SynthConfig
) -> None:
    p = params
    if p.max_generations < 1:
        report.add("error", "logic", f"max_generations={p.max_generations} must be >= 1")
    if p.per_host_budget < 1:
        report.add("error", "logic", f"per_host_budget={p.per_host_budget} must be >= 1")
    elif p.per_host_budget > 100:
        # resource-limit analog (config_validator.py:252-258 concurrency cap)
        report.add(
            "warning", "logic",
            f"very high per_host_budget: {p.per_host_budget}",
            "consider lowering to avoid overwhelming origins",
        )
    if p.gen_cap is not None:
        if p.gen_cap < 1:
            report.add("error", "logic", f"gen_cap={p.gen_cap} must be >= 1 or None")
        else:
            if p.gen_cap < cfg.n_seeds:
                report.add(
                    "error", "logic",
                    f"gen_cap={p.gen_cap} < n_seeds={cfg.n_seeds}: generation 0 "
                    "silently drops seeds",
                    "raise gen_cap or lower n_seeds",
                )
            if p.gen_cap > 100_000:
                # queue-size analog (config_validator.py:266-273)
                report.add(
                    "warning", "logic",
                    f"very large gen_cap: {p.gen_cap}",
                    "large generations hold large frontiers in the shuffle",
                )
    if not p.domain:
        report.add(
            "error", "logic", "domain allow-list suffix is empty",
            "pass --domain (every candidate would be rejected)",
        )
    if not (0.0 < p.adaptive_rate <= 1.0):
        report.add("error", "logic", f"adaptive_rate={p.adaptive_rate} must be in (0, 1]")
    if p.adaptive_base_depth < 0 or p.adaptive_bonus_depth < 0:
        report.add("error", "logic", "adaptive depths must be >= 0")
    if p.adaptive_min_samples < 1:
        report.add("error", "logic", "adaptive_min_samples must be >= 1")
    if not (0.0 < p.feedback_rate <= 1.0):
        report.add("error", "logic", f"feedback_rate={p.feedback_rate} must be in (0, 1]")
    if p.feedback_min_samples < 1:
        report.add("error", "logic", "feedback_min_samples must be >= 1")
    if p.revalidate:
        if p.revalidate_after_gens < 1:
            report.add("error", "logic", "revalidate_after_gens must be >= 1")
        if p.freshness_max_age_days < 0:
            report.add("error", "logic", "freshness_max_age_days must be >= 0")
        if p.max_generations <= p.revalidate_after_gens:
            report.add(
                "warning", "logic",
                f"revalidate enabled but max_generations={p.max_generations} "
                f"<= revalidate_after_gens={p.revalidate_after_gens}: no page "
                "can ever become due",
                "raise max_generations or lower revalidate_after_gens",
            )
    if p.rate_control:
        if p.breaker_limit < 1:
            report.add("error", "logic", "breaker_limit must be >= 1")
        if not (0.0 < p.aimd_threshold <= 1.0):
            report.add("error", "logic", f"aimd_threshold={p.aimd_threshold} must be in (0, 1]")
        if p.aimd_step < 1:
            report.add("error", "logic", "aimd_step must be >= 1")
    if p.pagination_guess:
        for name in ("pagination_ttl_gens", "pagination_lookahead", "pagination_max_pages"):
            if getattr(p, name) < 1:
                report.add("error", "logic", f"{name} must be >= 1")
    if p.purge_after is not None:
        pg, ph = p.purge_after
        if not ph:
            report.add("error", "logic", "purge_after host is empty")
        if pg < 0:
            report.add("error", "logic", f"purge_after generation {pg} must be >= 0")
        elif pg >= p.max_generations - 1:
            report.add(
                "warning", "logic",
                f"purge_after generation {pg} leaves no later generation to "
                f"re-discover the cohort (max_generations={p.max_generations})",
                "purge earlier or raise max_generations",
            )
    if not (0.0 <= p.validation_threshold <= 1.0):
        report.add(
            "error", "logic",
            f"validation_threshold={p.validation_threshold} must be in [0, 1]",
        )
    elif p.validation_enforce and p.validation_threshold == 0.0:
        report.add(
            "info", "logic",
            "validation_threshold=0: the interstage gate never aborts",
        )


def _check_catalog(report: HealthReport, workdir: str) -> None:
    """Catalog state: manifest must load; orphan staged files suggest vacuum
    (the temp-cleanup analog of orchestrator/main.py:311-312)."""
    from ..sources.catalog import SnapshotCatalog

    manifest = os.path.join(workdir, "_manifest.json")
    if not os.path.exists(manifest):
        return  # fresh workdir — nothing to validate
    try:
        cat = SnapshotCatalog(workdir)
        gen = cat.committed_generation()
    except Exception as e:
        report.add(
            "error", "catalog", f"catalog manifest unreadable: {e}",
            "the workdir holds a corrupt catalog — choose a fresh --workdir",
        )
        return
    report.add("info", "catalog", f"existing catalog: committed generation {gen}",
               "pass --resume to continue it; a plain crawl restarts from scratch")
    orphans = cat.orphan_files()
    if orphans:
        report.add(
            "warning", "catalog",
            f"{len(orphans)} orphan staged files from crashed generations",
            "run `main.py vacuum --workdir ...` to reclaim them",
        )


def _check_env(report: HealthReport) -> None:
    """SPARK_GRAFT_AS_OF must parse as an ISO date, and it must be set
    before process launch (it is read at import time by the oracle SQL —
    CLAUDE.md recency-anchor quirk)."""
    as_of = os.environ.get("SPARK_GRAFT_AS_OF")
    if as_of is not None:
        import datetime

        try:
            datetime.date.fromisoformat(as_of)
        except ValueError:
            report.add(
                "error", "env",
                f"SPARK_GRAFT_AS_OF={as_of!r} is not an ISO date (YYYY-MM-DD)",
                "fix or unset it (the pinned analysis.AS_OF default applies)",
            )
            return
    # desync guard: the query registry captures the anchor into its
    # generated oracle SQL at import; if the live env no longer matches,
    # the Spark queries (which read env at query time) and the SQL twins
    # have silently diverged
    import sys

    eq = sys.modules.get("scrapy_spark.entry_queries")
    if eq is not None:
        from ..functions import analysis

        live = as_of if as_of is not None else analysis.AS_OF
        if getattr(eq, "AS_OF_AT_IMPORT", live) != live:
            report.add(
                "error", "env",
                f"SPARK_GRAFT_AS_OF changed after the query registry was "
                f"imported (registry captured {eq.AS_OF_AT_IMPORT}, env now "
                f"resolves {live}) — the Spark and oracle-SQL twins would "
                "desynchronize",
                "export SPARK_GRAFT_AS_OF before launching the process",
            )


def health_check(
    cfg: SynthConfig, params: CrawlParams, workdir: str | None = None
) -> HealthReport:
    """Run every check; no Spark session required (launch-time gate)."""
    report = HealthReport()
    if workdir is not None:
        _check_filesystem(report, workdir)
        _check_catalog(report, workdir)
    _check_staging(report)
    _check_synth(report, cfg)
    _check_params(report, params, cfg)
    _check_env(report)
    return report


def print_report(report: HealthReport) -> None:
    """Severity-grouped text report (config_validator.py:334-384 shape)."""
    if not report.issues:
        print("health check: PASSED (no issues)")
        return
    for sev in SEVERITIES:
        group = report.by_severity(sev)
        if not group:
            continue
        print(f"{sev.upper()} ({len(group)}):")
        for i in group:
            line = f"  [{i.category}] {i.message}"
            if i.suggestion:
                line += f" — {i.suggestion}"
            print(line)
    print("status:", "PASSED" if report.ok else "FAILED (fix errors before running)")
