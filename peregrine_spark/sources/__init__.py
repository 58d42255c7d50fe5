"""Sources: synthetic repo_files catalog, parquet/testdata loaders, ingest."""
