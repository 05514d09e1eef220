"""REAL-HTTP end-to-end: fetch_frontier with the http_resolver plug-in
against a loopback HTTP server (no external network — closes the
"real-HTTP e2e" deferral honestly). The server serves a small site built
with the repo's own codecs: HTML pages, a PNG from functions/imagefn, a PDF
from functions/pdffn with an embedded /URI link. Asserts the full Arrow
batch path: statuses, title parse, absolute link resolution, byte-exact
binary payloads, fetch-time PDF /URI extraction, 404 and
connection-refused (599 transient) classification."""

from __future__ import annotations

import socket
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_spark.functions.imagefn import encode_png
from scrapy_spark.functions.pdffn import encode_pdf
from scrapy_spark.operators.fetch import fetch_frontier, http_resolver
from scrapy_spark.sources.synth import SynthConfig


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    root = tmp_path_factory.mktemp("site")
    png = encode_png(
        np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    )
    pdf = encode_pdf(
        ["hello loopback world"],
        title="e2e doc",
        author="tester",
        link_uris=["http://127.0.0.1/page2.html"],
    )
    from scrapy_spark.functions.giffn import encode_gif

    logo = np.zeros((10, 14, 3), np.uint8)
    logo[2:8, 3:11] = (10, 200, 60)
    gif = encode_gif(logo)
    (root / "i").mkdir()
    (root / "index.html").write_text(
        "<html><head><title>E2E Index</title></head><body>"
        '<a href="/page2.html">two</a> <a href="doc.pdf">doc</a>'
        '<img src="/i/img1.png" alt="a test image">'
        '<img src="/i/logo.gif" alt="a gif logo">'
        "</body></html>"
    )
    (root / "page2.html").write_text(
        "<html><head><title>Page Two</title></head><body>fin</body></html>"
    )
    (root / "i" / "img1.png").write_bytes(png)
    (root / "i" / "logo.gif").write_bytes(gif)
    (root / "doc.pdf").write_bytes(pdf)

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    # a port that is closed for the connection-refused case
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    dead_port = s.getsockname()[1]
    s.close()
    yield {
        "port": port,
        "dead_port": dead_port,
        "png": png,
        "pdf": pdf,
        "gif": gif,
        "logo": logo,
    }
    srv.shutdown()


def test_real_http_fetch_end_to_end(spark, site):
    base = f"http://127.0.0.1:{site['port']}"
    urls = [
        f"{base}/index.html",
        f"{base}/page2.html",
        f"{base}/i/img1.png",
        f"{base}/doc.pdf",
        f"{base}/missing.html",
        f"http://127.0.0.1:{site['dead_port']}/nope",
    ]
    selected = spark.createDataFrame(
        [
            (u, i, "127.0.0.1", 0, 1.0, "seed", "a test image" if "img" in u
             else None, None, i, 1)
            for i, u in enumerate(urls)
        ],
        "url string, url_hash long, host string, depth int, score double, "
        "source_type string, anchor string, source_url string, "
        "rank_in_host int, attempt int",
    )
    fetched = fetch_frontier(
        selected,
        SynthConfig(seed=1, n_hosts=1, n_pages=1, n_images=1),
        fetch_partitions=2,
        resolver_factory=lambda: http_resolver(timeout_s=5),
    )
    rows = {r["url"]: r for r in fetched.collect()}
    assert len(rows) == len(urls)

    idx = rows[f"{base}/index.html"]
    assert idx["status_code"] == 200 and idx["content_type"] == "text/html"
    assert idx["title"] == "E2E Index"
    assert idx["is_valid"]
    # relative hrefs resolved absolute against the page URL
    assert f"{base}/page2.html" in idx["body_links"]
    assert f"{base}/doc.pdf" in idx["body_links"]
    refs = {r["image_id"]: r["alt"] for r in idx["image_refs"]}
    assert refs == {
        f"{base}/i/img1.png": "a test image",
        f"{base}/i/logo.gif": "a gif logo",
    }

    png_row = rows[f"{base}/i/img1.png"]
    assert png_row["status_code"] == 200 and png_row["fmt"] == "png"
    assert bytes(png_row["bytes"]) == site["png"]  # byte-exact through Arrow

    pdf_row = rows[f"{base}/doc.pdf"]
    assert pdf_row["status_code"] == 200 and pdf_row["fmt"] == "pdf"
    assert bytes(pdf_row["bytes"]) == site["pdf"]
    # /URI annotations extracted INSIDE the fetch UDF (bytes discipline)
    assert pdf_row["pdf_uris"] == ["http://127.0.0.1/page2.html"]

    assert rows[f"{base}/missing.html"]["status_code"] == 404
    assert rows[f"{base}/missing.html"]["error_type"] is not None
    dead = rows[f"http://127.0.0.1:{site['dead_port']}/nope"]
    assert dead["status_code"] == 599  # transient class -> retry policy


def test_real_http_crawl_job(spark, site, tmp_path):
    """FULL CrawlJob over the loopback site: seed list + http_resolver +
    domain allow-list — the frontier discovers, filters, dedups, and fetches
    the real pages/image/PDF across two generations with the classification
    gate live. This is the 'point the engine at a real site' path
    (main.py crawl --http --seed-url ... --domain ...)."""
    from scrapy_spark.plans.crawl import CrawlJob
    from scrapy_spark.plans.oracle import CrawlParams

    base = f"http://127.0.0.1:{site['port']}"
    params = CrawlParams(
        max_generations=2, per_host_budget=10, domain="127.0.0.1"
    )
    job = CrawlJob(
        spark,
        SynthConfig(seed=1, n_hosts=1, n_pages=1, n_images=1),
        params,
        str(tmp_path / "httpcrawl"),
        salt_buckets=2,
        resolver_factory=lambda: http_resolver(timeout_s=5),
        seed_urls=[f"{base}/index.html"],
    )
    job.run()
    rows = {r["url"]: r for r in job.catalog.read(spark, "fetch_results").collect()}
    assert f"{base}/index.html" in rows
    # generation 1 discovered the real links: page2 (html), the image, the pdf
    assert rows[f"{base}/page2.html"]["generation"] == 1
    assert rows[f"{base}/page2.html"]["title"] == "Page Two"
    img = rows[f"{base}/i/img1.png"]
    assert img["generation"] == 1 and bytes(img["bytes"]) == site["png"]
    assert img["source_type"] == "img_tag" and img["caption"] == "a test image"
    # a real-web GIF flows through fetch AND decodes with the from-scratch
    # codec, pixel-exact (palettized content)
    gif_row = rows[f"{base}/i/logo.gif"]
    assert gif_row["content_type"] == "image/gif"
    assert bytes(gif_row["bytes"]) == site["gif"]
    from scrapy_spark.functions.imagefn import decode_image

    assert np.array_equal(
        decode_image(bytes(gif_row["bytes"]), "gif"), site["logo"]
    )
    pdf = rows[f"{base}/doc.pdf"]
    assert pdf["source_type"] == "pdf_link"
    assert bytes(pdf["bytes"]) == site["pdf"]
    # classification gate live on real rows
    assert rows[f"{base}/index.html"]["content_category"] == "html_page"
    assert rows[f"{base}/index.html"]["is_enrichable"]
    assert img["content_category"] == "image" and not img["is_enrichable"]
    # seen set: every fetched URL except still-transient probes (the S3
    # sitemap probe is https://host/sitemap.xml — connection-refused on the
    # loopback site, so it stays out of url_seen and would retry)
    seen = {r["url"] for r in job.catalog.read(spark, "url_seen").collect()}
    assert seen <= set(rows)
    unresolved = set(rows) - seen
    assert all("sitemap" in u for u in unresolved), unresolved
    assert all(rows[u]["status_code"] == 599 for u in unresolved)
