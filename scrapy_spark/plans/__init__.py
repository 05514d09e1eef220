"""Crawl plans: the Spark generation-loop driver and the sequential oracle."""
