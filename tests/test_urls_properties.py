"""Property-based tests (hypothesis) for the canonicalizer — it must be
total (never throws), deterministic, and idempotent over arbitrary input,
because at 10^10 URLs every pathological string WILL occur."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_spark.functions.hashing import spark_xxhash64_str, xxh64
from scrapy_spark.functions.urls import canonicalize, clean_seed_url, url_host, url_path

text = st.text(max_size=200)
urlish = st.one_of(
    text,
    st.builds(
        lambda h, p, q, f: f"https://{h}.uconn.edu/{p}?{q}#{f}",
        st.text(alphabet="abcdefghij.-", min_size=1, max_size=20),
        st.text(alphabet="abc/0123456789%._~ ", max_size=40),
        st.text(alphabet="abc=&123%", max_size=30),
        st.text(max_size=10),
    ),
)


@given(urlish)
@settings(max_examples=300, deadline=None)
def test_canonicalize_total_and_idempotent(s):
    c = canonicalize(s)
    if c is not None:
        c2 = canonicalize(c)
        assert c2 == c  # idempotent
        assert url_host(c) is not None
        assert url_path(c) is not None


@given(text)
@settings(max_examples=200, deadline=None)
def test_clean_seed_total(s):
    out = clean_seed_url(s)
    if out is not None:
        assert "://" in out


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_xxh64_total_and_stable(b):
    a = xxh64(b)
    assert 0 <= a < (1 << 64)
    assert xxh64(b) == a


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_spark_hash_twin_total(s):
    v = spark_xxhash64_str(s)
    assert -(1 << 63) <= v < (1 << 63)
