"""Gated queries: enrichment joins (SURVEY.md §2.4) — LPM networks_file,
GeoIP range join, pretag rules engine, dictionaries, seqno monitoring.

Populated by M3; modules register into driver_queries at import.
"""
