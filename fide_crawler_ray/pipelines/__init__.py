"""Composed Dataset pipelines: crawl loop, analytics, driver queries."""
