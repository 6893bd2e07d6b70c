"""Scans + deterministic synthetic fixture tables.

``pages`` stands in for the 10^12-row Common-Crawl Iceberg table
(BASELINE.json input_hint); generation is pure Column arithmetic over
``spark.range`` so it is order-independent and parallelism-invariant —
local[8] and local[32] produce identical rows (FIXTURES.md requirement).
"""
