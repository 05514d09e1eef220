"""Crawl operators: candidate pipeline, dedup kernel, fetch, extraction."""
