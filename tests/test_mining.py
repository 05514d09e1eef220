"""Heuristic URL mining (functions/mining.py + operators/extract.
mined_candidates): Spark regexes == Python twin, kind semantics match the
reference families (discovery_spider.py:36-39,386-478,729-774), and the
crawl-parity fixture's /hidden/ pages — reachable ONLY via mining — are
actually discovered (exercised end-to-end by tests/test_crawl_parity.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_spark.functions import mining
from scrapy_spark.operators.extract import mined_candidates

SNIPPETS = [
    # script WITH dynamic hint: quoted absolute + root-relative both mined
    ("script", 'var go = function() { fetch("https://a.uconn.edu/hidden/h1"); loadMore("/news/p3"); };'),
    # script WITHOUT hint: quoted URL must NOT be mined
    ("script", 'var tmpl = "/academics/p9"; // static template'),
    # json: hint keys at any depth; non-hint keys skipped
    ("json", '{"url": "https://a.uconn.edu/hidden/h2", "items": [{"href": "https://a.uconn.edu/news/p1"}], "note": "see https://example.com/x", "label": "L"}'),
    # comment: bare absolute URL
    ("comment", "<!-- staging link https://a.uconn.edu/news/p2 -->"),
    # meta refresh
    ("meta_refresh", "0; url=https://a.uconn.edu/events/p4"),
    # css url(...)
    ("css", "background-image: url('https://img0.uconn.edu/i/img000004.png')"),
    # protocol-relative in a hinted script
    ("script", 'axios.get("//b.uconn.edu/research/p5")'),
    # form action: the value IS the endpoint
    ("form_action", " /submit/search "),
    # data attribute, plain value
    ("data_attr", "/load/next"),
    # data attribute, JSON payload -> key-hint mining
    ("data_attr", '{"endpoint": "https://a.uconn.edu/api/items", "x": "y"}'),
    # unknown kind: nothing
    ("blob", 'x "https://a.uconn.edu/news/p7" y'),
]

SOURCE = "https://a.uconn.edu/news/p0"

EXPECTED = {
    ("https://a.uconn.edu/hidden/h1", "ajax_endpoint"),
    ("https://a.uconn.edu/news/p3", "ajax_endpoint"),
    ("https://a.uconn.edu/hidden/h2", "json_blob"),
    ("https://a.uconn.edu/news/p1", "json_blob"),
    ("https://a.uconn.edu/news/p2", "html_comment"),
    ("https://a.uconn.edu/events/p4", "meta_refresh"),
    ("https://img0.uconn.edu/i/img000004.png", "css_inline_style"),
    ("https://b.uconn.edu/research/p5", "ajax_endpoint"),
    ("https://a.uconn.edu/submit/search", "ajax_endpoint"),
    ("https://a.uconn.edu/load/next", "ajax_endpoint"),
    ("https://a.uconn.edu/api/items", "ajax_endpoint"),
}


def test_python_twin_mines_expected():
    got = set()
    for kind, text in SNIPPETS:
        st = mining.KIND_SOURCE_TYPE.get(kind)
        for u in mining.py_mine_snippet(kind, text):
            got.add((mining.py_resolve_mined(u, SOURCE), st))
    assert got == EXPECTED


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [SOURCE] * len(SNIPPETS),
                "depth": [1] * len(SNIPPETS),
                "raw_snippets": [[{"kind": k, "text": t}] for k, t in SNIPPETS],
            }
        ),
        schema="url string, depth int, "
        "raw_snippets array<struct<kind:string,text:string>>",
    )
    rows = mined_candidates(df).collect()
    got = {(r["raw_url"], r["source_type"]) for r in rows}
    assert got == EXPECTED
    assert all(r["depth"] == 2 and r["anchor"] is None and r["attempt"] == 1 for r in rows)


def test_synth_snippets_round_trip(spark):
    """Synthetic page snippets flow through the Spark miner and the Python
    twin identically, including hidden-page targets."""
    from scrapy_spark.sources import synth

    cfg = synth.SynthConfig(seed=42, n_hosts=6, n_pages=120, n_images=40)
    counts = synth.zipf_page_counts(cfg)
    rows, expected = [], set()
    for hidx in range(cfg.n_hosts):
        for j in range(counts[hidx]):
            sn = synth.page_snippets(cfg, counts, hidx, j)
            if not sn:
                continue
            src = synth.page_url(cfg, hidx, j)
            rows.append({"url": src, "depth": 0, "raw_snippets": sn})
            for s in sn:
                for u in mining.py_mine_snippet(s["kind"], s["text"]):
                    expected.add(
                        (
                            mining.py_resolve_mined(u, src),
                            mining.KIND_SOURCE_TYPE[s["kind"]],
                            src,
                        )
                    )
    assert expected, "fixture must produce minable snippets"
    assert any("/hidden/" in u for u, _, _ in expected), "hidden pages must be minable"
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="url string, depth int, "
        "raw_snippets array<struct<kind:string,text:string>>",
    )
    got = {
        (r["raw_url"], r["source_type"], r["source_url"])
        for r in mined_candidates(df).collect()
    }
    assert got == expected


def test_negative_fixture_not_mined():
    """k==5 synth snippet (no dynamic hint) yields nothing."""
    assert mining.py_mine_snippet("script", 'var tmpl = "/news/p2"; // static template') == []


def test_whitespace_trim_twins_agree(spark):
    """F.trim strips ASCII spaces only; the Python twin must match exactly —
    a '\\t/submit\\n' form action mines the SAME url in both engines
    (ADVICE r3: str.strip() stripped \\t/\\n and diverged)."""
    cases = [
        ("form_action", "\t/submit\n"),
        ("form_action", "  /submit  "),
        ("data_attr", "\t/api/x\n"),
        ("data_attr", " {\"endpoint\": \"/api/y\"} "),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [SOURCE] * len(cases),
                "depth": [1] * len(cases),
                "raw_snippets": [[{"kind": k, "text": t}] for k, t in cases],
            }
        ),
        schema="url string, depth int, "
        "raw_snippets array<struct<kind:string,text:string>>",
    )
    got = {(r["raw_url"], r["source_type"]) for r in mined_candidates(df).collect()}
    expected = set()
    for kind, text in cases:
        st = mining.KIND_SOURCE_TYPE[kind]
        for u in mining.py_mine_snippet(kind, text):
            expected.add((mining.py_resolve_mined(u, SOURCE), st))
    assert got == expected
    # both engines must KEEP the tab/newline (space-only trim semantics)
    assert ("\t/submit\n", "ajax_endpoint") in expected
