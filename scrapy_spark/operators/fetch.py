"""Vectorized Arrow-UDF fetch over salted per-host micro-batches (S4).

The reference fetches with aiohttp/Scrapy (validator.py:474-546,
async_enrichment.py:391-468) under per-domain concurrency caps, AutoThrottle
and AIMD rate control. In the rebuild (SURVEY §4):

- the frontier is **salted-repartitioned** on (host, pmod(url_hash, S)) before
  the fetch stage so one hot host (img*.uconn.edu carries 1/4 of all images by
  design) splits across S tasks instead of serializing one straggler task;
- fetch itself is ``mapInPandas`` — one Python invocation per Arrow batch,
  resolving each URL against the deterministic synthetic web (sandbox stand-in
  for HTTP GET; the real-network variant plugs an http client into the same
  batch loop);
- per-host politeness pacing and retry/circuit state live inside the
  partition (optional real sleeping is off for benches — budget enforcement
  happens at *selection* time, the primary mechanism per SURVEY §7.3.3);
- image bytes enter existence here and are never shuffled afterwards
  (SURVEY §7.3.4): extraction needs only the small array columns.

Output adds: status_code, content_type, title, is_valid, bytes, w, h, fmt,
body_links, image_refs — captions come from the candidate's anchor (the
reference's <img alt>/<figcaption> extraction, F10).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.classify import py_classify
from ..functions.errors import classify_error, is_retryable
from ..plans.oracle import MAX_ATTEMPTS, VALID_CONTENT_TYPES
from ..sources.synth import SynthConfig, resolve, zipf_page_counts

FETCH_SCHEMA = (
    "url string, url_hash long, host string, depth int, score double, "
    "source_type string, anchor string, source_url string, rank_in_host int, "
    "attempt int, status_code int, content_type string, title string, "
    "is_valid boolean, error_type string, age_days int, latency_ms long, "
    "is_final boolean, "
    "bytes binary, w int, h int, fmt string, "
    "body_links array<string>, "
    "image_refs array<struct<image_id:string,alt:string>>, "
    "raw_snippets array<struct<kind:string,text:string>>, "
    "pdf_uris array<string>, "
    "content_category string, content_quality string, is_enrichable boolean"
)

IN_COLS = [
    "url",
    "url_hash",
    "host",
    "depth",
    "score",
    "source_type",
    "anchor",
    "source_url",
    "rank_in_host",
    "attempt",
]


def synth_resolver(cfg: SynthConfig):
    """Default resolver: the deterministic synthetic web. A resolver is any
    ``(url: str, attempt: int, timeout_ms=None) -> dict`` with the resolve()
    result shape (timeout_ms is supplied per-row on the adaptive-fetch path;
    None = no client timeout) — see http_resolver for the real-network
    plug-in."""
    counts = zipf_page_counts(cfg)  # tiny, recomputed per executor from cfg

    def _resolve(url: str, attempt: int, timeout_ms: int | None = None) -> dict:
        return resolve(cfg, counts, url, attempt, timeout_ms)

    return _resolve


def http_resolver(timeout_s: float = 10.0, user_agent: str = "scrapy-spark/0.1"):
    """Real-network resolver plug-in: same batch loop, urllib instead of the
    synthetic web. Import/usage is gated — the sandbox has no network, so
    this path is exercised only by its shape (tests/test_fetch_seam.py);
    on a cluster pass ``resolver_factory=lambda: http_resolver()`` to
    CrawlJob/fetch_frontier. Returns the FETCH result-dict shape with
    body_links/image_refs parsed minimally (href/src attributes)."""
    import re
    import urllib.error
    import urllib.parse
    import urllib.request

    href_re = re.compile(rb"""href=["']([^"'#>]+)""", re.I)
    img_tag_re = re.compile(rb"<img[^>]*>", re.I)
    src_re = re.compile(rb"""src=["']([^"'>]+)""", re.I)
    alt_re = re.compile(rb"""alt=["']([^"']*)""", re.I)
    title_re = re.compile(rb"<title[^>]*>([^<]*)</title>", re.I)
    # raw-snippet surfaces for heuristic URL mining (functions/mining.py):
    # inline scripts (json kind when type=...json...), html comments,
    # inline style attributes, meta-refresh directives
    script_re = re.compile(rb"<script([^>]*)>(.*?)</script>", re.I | re.S)
    comment_re = re.compile(rb"<!--(.*?)-->", re.S)
    style_attr_re = re.compile(rb"""style=["']([^"']*)""", re.I)
    meta_refresh_re = re.compile(
        rb"""<meta[^>]*http-equiv=["']?refresh["']?[^>]*content=["']([^"']*)""", re.I
    )

    def _snippets(body: bytes) -> list[dict]:
        out = []
        dec = lambda b: b.decode("utf-8", "replace")  # noqa: E731
        for attrs, text in script_re.findall(body):
            if not text.strip():
                continue
            kind = "json" if b"json" in attrs.lower() else "script"
            out.append({"kind": kind, "text": dec(text)})
        for c in comment_re.findall(body):
            out.append({"kind": "comment", "text": dec(c)})
        for s in style_attr_re.findall(body):
            if b"url(" in s.lower():
                out.append({"kind": "css", "text": dec(s)})
        for m in meta_refresh_re.findall(body):
            out.append({"kind": "meta_refresh", "text": dec(m)})
        return out

    def _resolve(url: str, attempt: int, timeout_ms: int | None = None) -> dict:
        out = {
            "status_code": 599, "content_type": None, "title": None,
            "body_links": [], "image_refs": [], "raw_snippets": [],
            "bytes": None, "w": None, "h": None, "fmt": None, "age_days": None,
        }
        t0 = time.perf_counter()
        # adaptive per-domain timeout overrides the constructor default —
        # the SmartRequestHandler consumption point
        # (request_infrastructure.py:199-260)
        eff_timeout = timeout_ms / 1000.0 if timeout_ms is not None else timeout_s
        try:
            req = urllib.request.Request(url, headers={"User-Agent": user_agent})
            with urllib.request.urlopen(req, timeout=eff_timeout) as resp:
                body = resp.read()
                ct = (resp.headers.get("Content-Type") or "").split(";")[0].strip()
                out["status_code"] = resp.status
                out["content_type"] = ct or None
                if ct == "text/html":
                    m = title_re.search(body)
                    out["title"] = m.group(1).decode("utf-8", "replace").strip() if m else None
                    # real sites link mostly relatively; canonicalize() rejects
                    # scheme-less URLs, so resolve against the page URL here
                    out["body_links"] = [
                        urllib.parse.urljoin(url, x.decode("utf-8", "replace"))
                        for x in href_re.findall(body)
                    ]
                    refs = []
                    for tag in img_tag_re.findall(body):
                        sm, am = src_re.search(tag), alt_re.search(tag)
                        if sm:
                            refs.append(
                                {
                                    "image_id": urllib.parse.urljoin(
                                        url, sm.group(1).decode("utf-8", "replace")
                                    ),
                                    "alt": am.group(1).decode("utf-8", "replace")
                                    if am
                                    else None,
                                }
                            )
                    out["image_refs"] = refs
                    out["raw_snippets"] = _snippets(body)
                elif ct.startswith("image/"):
                    out["bytes"] = body
                    out["fmt"] = ct.split("/", 1)[1]
                elif ct == "application/pdf":
                    out["bytes"] = body
                    out["fmt"] = "pdf"
        except urllib.error.HTTPError as e:
            out["status_code"] = e.code
        except Exception:
            out["status_code"] = 599  # timeout/connection -> transient class
        # measured wall time (the adaptive loop's learning signal; the
        # synthetic resolver supplies a deterministic twin of this)
        out["latency_ms"] = int((time.perf_counter() - t0) * 1000)
        return out

    return _resolve


def fetch_frontier(
    selected: DataFrame,
    cfg: SynthConfig,
    salt_buckets: int = 8,
    politeness_delay_s: float = 0.0,
    fetch_latency_s: float = 0.0,
    fetch_partitions: int | None = None,
    resolver_factory=None,
    adaptive: bool = False,
    adaptive_config: DataFrame | None = None,
) -> DataFrame:
    """Fetch the selected frontier slice; returns FETCH_SCHEMA rows.

    ``resolver_factory`` () -> ((url, attempt) -> result-dict) plugs the
    fetch backend; default is the deterministic synthetic web. The factory
    runs ONCE PER TASK inside the UDF (connection pools / parsed config live
    executor-side, never serialized from the driver).

    ``salt_buckets`` splits each host across S partitions (skew control);
    the politeness budget was already enforced per host at selection time,
    so pacing here (delay * S effective, SURVEY §4) is a safety net.

    ``fetch_latency_s`` simulates network RTT per URL (the reference crawler
    is I/O-bound: 185 URLs/s across 32 aiohttp workers, README.md:111); the
    benchmark enables it so scaling numbers reflect a real fetch stage rather
    than an unrealistically-free synthetic resolve.

    ``fetch_partitions`` pins the exchange width: a latency-bound stage has
    tiny byte sizes, so AQE would coalesce it to a handful of tasks and
    serialize the sleeps — exactly the wrong plan. Explicit repartition(N)
    keeps the fetch wide (default 4x defaultParallelism).

    ``adaptive`` (CrawlParams.adaptive_fetch): every row carries a per-host
    timeout (and pacing delay) from ``adaptive_config`` (operators/adaptive
    — the learned table; hosts absent from it, or the whole table at
    generation 0, use the base config), passed into the resolver per row.
    The config is a host-keyed dim like the rate-control budgets — joined
    without a hint so AQE sizes it. The learned DELAY's primary effect is
    upstream (selection-time budget pacing, adaptive.paced_budgets); here it
    only raises the per-host politeness sleep when politeness pacing is
    enabled — with politeness off there is no execution-time sleeping to
    raise (round-robin layout, no host adjacency).
    """
    from . import adaptive as adaptive_mod

    synthetic_resolver = resolver_factory is None
    if resolver_factory is None:
        resolver_factory = lambda: synth_resolver(cfg)  # noqa: E731

    in_cols = list(IN_COLS)
    if adaptive:
        if adaptive_config is not None:
            selected = selected.join(
                adaptive_config.select(
                    "host", "timeout_ms", "max_attempts", "delay_ms"
                ),
                "host",
                "left",
            )
        else:
            selected = selected.withColumns(
                {
                    "timeout_ms": F.lit(None).cast("long"),
                    "max_attempts": F.lit(None).cast("int"),
                    "delay_ms": F.lit(None).cast("long"),
                }
            )
        selected = selected.withColumns(
            {
                "af_timeout_ms": F.coalesce(
                    F.col("timeout_ms"), F.lit(adaptive_mod.BASE_TIMEOUT_MS)
                ),
                "af_max_attempts": F.coalesce(
                    F.col("max_attempts"), F.lit(MAX_ATTEMPTS)
                ),
                "af_delay_ms": F.coalesce(
                    F.col("delay_ms"), F.lit(adaptive_mod.BASE_DELAY_MS)
                ),
            }
        ).drop("timeout_ms", "max_attempts", "delay_ms")
        in_cols += ["af_timeout_ms", "af_max_attempts", "af_delay_ms"]

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        do_resolve = resolver_factory()  # once per task, executor-side
        for pdf in batches:
            if pdf.empty:
                continue
            if fetch_latency_s > 0:
                # batch-equivalent of per-row RTT (same wall time per task)
                time.sleep(fetch_latency_s * len(pdf))
            out_rows = []
            last_host = None
            for row in pdf.itertuples(index=False):
                if politeness_delay_s > 0:
                    # per-host pacing inside the partition (salting multiplies
                    # the effective delay; selection-time budget is primary).
                    # The adaptive path raises the pace to the learned
                    # per-domain delay when throttling was observed
                    # (request_infrastructure.py:193-196)
                    if row.host == last_host:
                        pace = politeness_delay_s
                        if adaptive:
                            pace = max(pace, row.af_delay_ms / 1000.0)
                        time.sleep(pace * salt_buckets)
                    last_host = row.host
                if adaptive:
                    r = do_resolve(row.url, row.attempt, int(row.af_timeout_ms))
                else:
                    r = do_resolve(row.url, row.attempt)
                ct = r["content_type"]
                sc = r["status_code"]
                err = classify_error(sc)
                # finality decided HERE and persisted (is_final): transient
                # classes re-enqueue while attempts remain under the cap —
                # MAX_ATTEMPTS, or the learned per-host max_attempts on the
                # adaptive path (request_infrastructure.py:189-190)
                cap = int(row.af_max_attempts) if adaptive else MAX_ATTEMPTS
                is_final = not (is_retryable(err) and row.attempt < cap)
                # PDF link annotations extracted HERE, while the bytes are
                # already in hand — downstream extraction reads only this
                # small array column, never the bytes column again
                # (SURVEY §7.3.4 bytes discipline)
                pdf_uris: list[str] = []
                if ct == "application/pdf" and r["bytes"]:
                    from ..functions import pdffn

                    if pdffn.is_pdf(r["bytes"]):
                        pdf_uris = pdffn.pdf_link_uris(r["bytes"])
                # stage-2→3 classification computed HERE, row-side, with the
                # same python twin the sequential oracle uses
                # (functions/classify.py_classify): the declarative
                # when-chain form (the content_classification driver query)
                # is equivalent but costs seconds of DRIVER-SERIAL plan
                # analysis per generation — measured as an N→4N scaling
                # efficiency loss, since serial driver work hurts the wide
                # configuration relatively more. content_length = payload
                # size, or the structured-page body-size proxy.
                clen = (
                    len(r["bytes"])
                    if r["bytes"] is not None
                    else 500
                    + 120 * len(r["body_links"] or [])
                    + 80 * len(r["image_refs"] or [])
                )
                cat, qual, enrichable = py_classify(sc, ct or "", clen)
                out_rows.append(
                    {
                        "url": row.url,
                        "url_hash": row.url_hash,
                        "host": row.host,
                        "depth": row.depth,
                        "score": row.score,
                        "source_type": row.source_type,
                        "anchor": row.anchor,
                        "source_url": row.source_url,
                        "rank_in_host": row.rank_in_host,
                        "attempt": row.attempt,
                        "error_type": err,
                        "age_days": r.get("age_days"),
                        "latency_ms": r.get("latency_ms"),
                        "is_final": is_final,
                        "status_code": sc,
                        "content_type": ct,
                        "title": r["title"],
                        "is_valid": bool(
                            200 <= sc < 400 and (ct or "") in VALID_CONTENT_TYPES
                        ),
                        "bytes": r["bytes"],
                        "w": r["w"],
                        "h": r["h"],
                        "fmt": r["fmt"],
                        "body_links": r["body_links"],
                        "image_refs": r["image_refs"],
                        "raw_snippets": r.get("raw_snippets") or [],
                        "pdf_uris": pdf_uris,
                        "content_category": cat,
                        "content_quality": qual,
                        "is_enrichable": enrichable,
                    }
                )
            yield pd.DataFrame(out_rows)

    if fetch_partitions is None:
        # latency-bound fetches (politeness pacing, simulated RTT, or any
        # real-network resolver) keep the stage 4x wider than the core
        # count so sleeps/IO overlap; the pure-compute synthetic path with
        # no sleeping gains nothing from over-splitting and pays ~4x the
        # Arrow/Python task overhead, so it runs at core width
        mult = (
            4
            if (
                politeness_delay_s > 0
                or fetch_latency_s > 0
                or not synthetic_resolver
            )
            else 1
        )
        fetch_partitions = (
            selected.sparkSession.sparkContext.defaultParallelism * mult
        )
    if politeness_delay_s > 0:
        # per-host pacing needs host-grouped partitions: salted hash layout
        # (hot hosts split across salt_buckets tasks, SURVEY §4)
        salted = selected.select(*in_cols).repartition(
            fetch_partitions,
            F.col("host"),
            F.pmod(F.col("url_hash"), F.lit(salt_buckets)),
        )
    else:
        # budget already enforced per host at selection time; without
        # execution-time pacing, deterministic round-robin gives perfectly
        # even partitions — key-hashed layouts are Poisson-lumpy and the
        # stragglers cap scaling on a latency-bound stage
        salted = selected.select(*in_cols).repartition(fetch_partitions)
    return salted.mapInPandas(fetch_batches, schema=FETCH_SCHEMA)
