"""Sources/sinks: partitioned-parquet stores with resumable manifests."""
