"""Scalar/vector functions: perf rating, fuzzy match, text stats, sketches, ANN."""
