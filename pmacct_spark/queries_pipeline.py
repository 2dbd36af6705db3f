"""Gated queries: large-scale training-data pipeline operators — dedup
(exact/minhash/simhash/jaccard), similarity search, text analysis.

Populated by M8; modules register into driver_queries at import.
"""
