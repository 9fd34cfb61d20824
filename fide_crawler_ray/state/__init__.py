"""Stateful actors and data structures: URL-seen filters, frontier shards."""
