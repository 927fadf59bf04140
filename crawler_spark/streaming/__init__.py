"""Structured Streaming front-ends for the crawl engine."""
