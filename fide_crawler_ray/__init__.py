"""fide_crawler_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch re-implementation of the capabilities of the reference
repo ``rafaelvleite/fide_crawler`` (see /root/repo/SURVEY.md) as a
distributed URL-frontier + fetch scheduler + analytics engine built on
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``schema``      Arrow schemas for the span-document / frontier / store tables
- ``synth``       deterministic synthetic FIDE-like site (no network, seeded)
- ``refsem``      single-process reference-semantics crawler+parser (test golden)
- ``stages``      stateless map_batches stages: parsers, normalize, dedup, URL ops
- ``state``       stateful actors: frontier shards (politeness heap, robots,
                  cuckoo/bloom URL-seen filters, watermarks, checkpoints)
- ``functions``   scalar/vector fns: perf rating, fuzzy match, text stats,
                  minhash/simhash sketches, ANN search
- ``pipelines``   composed Dataset pipelines: crawl loop, analytics, queries
- ``sources``     parquet store layer (Lance stand-in: Lance is unavailable in
                  this environment, so stores are partitioned Parquet + manifest)

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()``; the
caller (driver, bench.py, tests/conftest.py) owns the Ray session.
"""

__version__ = "0.1.0"


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable even without
    aiohttp. Ray Data's path resolution imports it on EVERY read/write to
    probe for HTTP filesystems; since the import fails here (no aiohttp),
    Python never caches the module, and two driver threads importing it
    concurrently race into a half-initialized module and a spurious
    ``ImportError: cannot import name 'HTTPFileSystem'``. A cached stub
    class (used only in isinstance checks, matching nothing) removes both
    the race and the per-call import cost."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()


def _silence_schema_hash_noise() -> None:
    """Drop Ray Data's per-read "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning. It fires on every
    read of a parquet file carrying pandas schema metadata (this
    pyarrow's ``hash(Schema)`` chokes on the embedded dict) — a purely
    cosmetic dedup fast-path miss inside Ray's unify_schemas; Ray falls
    through to the full unification and the result is identical. The
    input files are external (testdata), so the metadata cannot be
    stripped at the source. This module is imported in every worker
    process that runs our stages, so the filter applies fleet-wide."""
    import logging

    class _SchemaHashNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_SchemaHashNoise())


_silence_schema_hash_noise()
