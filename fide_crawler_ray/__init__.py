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
