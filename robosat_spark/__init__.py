"""robosat_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the query/data-processing capabilities of mapbox/robosat
(``rs cover -> predict -> features -> merge -> dedupe``) as an idiomatic
Spark DataFrame engine over web-scale page tables, per SURVEY.md.

Layout:
  kernels/    pure-NumPy geometry/raster/hash kernels (zero Spark imports)
  functions/  Spark Column expressions + vectorized pandas/Arrow UDFs
  operators/  DataFrame operators (cover, spatial join, kNN, merge, dedupe, ...)
  sources/    scans + deterministic synthetic fixture tables
  plans/      stage runner with checkpoint resume + lineage metrics
  streaming/  Structured Streaming ingest surface
"""

__version__ = "0.1.0"
