"""Stateless map_batches stages: parsers, URL ops, normalize, dedup."""
