"""Structured Streaming surface: the reference's continuous pipeline
(source decode -> enrich -> per-plugin windowed aggregation -> periodic
purge) as streaming queries (SURVEY.md §2.10, §3.1)."""
