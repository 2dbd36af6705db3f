"""Gated queries: general relational surface over the TPC-H-ish tables
(joins, unions, set ops) proving the engine composes with plain Spark.

Populated alongside M3; modules register into driver_queries at import.
"""
