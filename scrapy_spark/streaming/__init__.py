"""Structured Streaming surfaces (continuous crawl loop + windowed metrics)."""
