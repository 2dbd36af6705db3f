"""Engine operators: aggregation semantics, time windows, enrichment
joins, rules engine, preprocess, top-N, and large-scale data-pipeline
extensions (dedup, similarity search, text analysis)."""
