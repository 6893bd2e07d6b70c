"""DataFrame operators wiring kernels into scans/joins/aggregations.

Each operator takes DataFrames in, returns a DataFrame (lazy plan) out —
Catalyst owns physical strategy; operators only add explicit repartition /
broadcast / salting where the optimizer cannot know the spatial semantics
(SURVEY.md §4).
"""
