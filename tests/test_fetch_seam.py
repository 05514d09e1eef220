"""Pluggable fetch backend (operators/fetch.py): the resolver seam works
end-to-end through the Arrow batch loop, and the real-network http_resolver
maps responses/errors into the same result shape (network calls faked —
this sandbox has no egress)."""

from __future__ import annotations

import io
import urllib.error
import urllib.request

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_spark.operators.fetch import fetch_frontier, http_resolver
from scrapy_spark.sources.synth import SynthConfig

HTML = b"""<html><head><title> Fake Page </title></head><body>
<a href="https://x.uconn.edu/a">a</a>
<a href='/relative'>r</a>
<img src="https://img0.uconn.edu/i/img1.png" alt="a caption">
</body></html>"""


class _FakeResp:
    def __init__(self, body: bytes, ct: str, status: int = 200):
        self._body, self.status = body, status
        self.headers = {"Content-Type": ct}

    def read(self):
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_http_resolver_html_parse(monkeypatch):
    monkeypatch.setattr(
        urllib.request,
        "urlopen",
        lambda req, timeout: _FakeResp(HTML, "text/html; charset=utf-8"),
    )
    r = http_resolver()("https://x.uconn.edu/section/page", 1)
    assert r["status_code"] == 200 and r["content_type"] == "text/html"
    assert r["title"] == "Fake Page"
    assert "https://x.uconn.edu/a" in r["body_links"]
    # relative hrefs must come back absolute (urljoin against the page URL):
    # canonicalize() rejects scheme-less URLs, so a verbatim '/relative'
    # would be silently dropped downstream
    assert "https://x.uconn.edu/relative" in r["body_links"]
    assert "/relative" not in r["body_links"]
    assert r["image_refs"] == [
        {"image_id": "https://img0.uconn.edu/i/img1.png", "alt": "a caption"}
    ]
    assert r["bytes"] is None


def test_http_resolver_relative_image_src(monkeypatch):
    html = b'<html><body><img src="../img/pic.png" alt="c"></body></html>'
    monkeypatch.setattr(
        urllib.request,
        "urlopen",
        lambda req, timeout: _FakeResp(html, "text/html"),
    )
    r = http_resolver()("https://x.uconn.edu/a/b/page.html", 1)
    assert r["image_refs"] == [
        {"image_id": "https://x.uconn.edu/a/img/pic.png", "alt": "c"}
    ]


def test_http_resolver_image_and_errors(monkeypatch):
    monkeypatch.setattr(
        urllib.request,
        "urlopen",
        lambda req, timeout: _FakeResp(b"\x89PNG...", "image/png"),
    )
    r = http_resolver()("https://img0.uconn.edu/i/x.png", 1)
    assert r["bytes"] == b"\x89PNG..." and r["fmt"] == "png"

    def raise_404(req, timeout):
        raise urllib.error.HTTPError("u", 404, "nf", {}, io.BytesIO())

    monkeypatch.setattr(urllib.request, "urlopen", raise_404)
    assert http_resolver()("https://x/", 1)["status_code"] == 404

    def raise_conn(req, timeout):
        raise urllib.error.URLError("refused")

    monkeypatch.setattr(urllib.request, "urlopen", raise_conn)
    assert http_resolver()("https://x/", 1)["status_code"] == 599  # transient


def test_custom_resolver_through_spark(spark):
    """A user-supplied resolver flows through the Arrow batch loop: rows come
    back classified and schema-complete."""
    pdf = pd.DataFrame(
        {
            "url": ["https://a.uconn.edu/x", "https://a.uconn.edu/y"],
            "url_hash": [1, 2],
            "host": ["a.uconn.edu"] * 2,
            "depth": [0, 1],
            "score": [1.0, 2.0],
            "source_type": ["seed", "html_link"],
            "anchor": [None, None],
            "source_url": [None, None],
            "rank_in_host": [1, 2],
            "attempt": [1, 1],
        }
    )
    selected = spark.createDataFrame(pdf)

    def factory():
        def _resolve(url, attempt):
            ok = url.endswith("/x")
            return {
                "status_code": 200 if ok else 503,
                "content_type": "text/html" if ok else None,
                "title": "t" if ok else None,
                "body_links": ["https://a.uconn.edu/z"] if ok else [],
                "image_refs": [],
                "bytes": None,
                "w": None,
                "h": None,
                "fmt": None,
                "age_days": 7 if ok else None,
            }

        return _resolve

    out = {
        r["url"]: r
        for r in fetch_frontier(
            selected, SynthConfig(), fetch_partitions=2, resolver_factory=factory
        ).collect()
    }
    x, y = out["https://a.uconn.edu/x"], out["https://a.uconn.edu/y"]
    assert x["is_valid"] and x["error_type"] is None and x["age_days"] == 7
    assert not y["is_valid"] and y["error_type"] == "server_error"
    assert x["body_links"] == ["https://a.uconn.edu/z"]
