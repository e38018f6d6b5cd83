"""Catalog family modules (split out of pipelines/queries.py, round 5).

The driver-facing surface stays `pipelines.queries` (build_queries /
build_oracle_sql + every query callable re-exported); these modules
hold the per-family implementations.
"""
