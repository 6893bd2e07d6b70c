"""Spark Column expressions + vectorized pandas/Arrow UDF wrappers.

Rule of the house (SURVEY.md §4): everything expressible as built-in
``pyspark.sql.functions`` arithmetic stays JVM-side inside whole-stage
codegen — tile encoding, geotag extraction, text metrics, cosine distance.
Python appears only in Arrow-batched pandas UDFs wrapping the NumPy kernels
(cover, PIP refine, contours, IoU); never per-row Python UDFs.
"""
