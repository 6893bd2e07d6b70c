"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.md): tiles+pages joined/sec for the flagship
cover->geotag->tile-encode->PIP->agg pipeline (the e2e spatial join), i.e.
assigned join rows / elapsed sec. Per-query wall seconds in "queries".

Scaling evidence (north rule): run with SPARK_GRAFT_CPUS=8 then =32 on the
same input; efficiency = throughput(32) / (4 * throughput(8)). See
tools/bench_scaling.py which automates the pair and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from robosat_spark.session import get_spark

    spark = get_spark(app="robosat_spark_bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    bench_queries = [
        "tile_encode",
        "pip_assign",
        "knn",
        "tile_adjacency",
        "latest_event_per_user",
        "sessionize",
        "dedup_exact",
        "token_stats",
        "lang_id",
        "ann_cosine",
        "pricing_summary",
        "market_join",
    ]
    timings = {}
    for name in bench_queries:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship e2e throughput: assigned join rows / sec
    from robosat_spark.operators.spatial_join import assign_broadcast
    from robosat_spark.sources.oracle_features import oracle_rect_features
    from robosat_spark.sources.pages import pages_from_events

    t0 = time.perf_counter()
    pg = pages_from_events(spark, sf_dir)
    ft = oracle_rect_features(spark)
    assigned = assign_broadcast(spark, pg, ft, zoom=7)
    joined_rows = assigned.count()
    flagship_sec = time.perf_counter() - t0
    timings["flagship_e2e"] = round(flagship_sec, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "pages_joined_per_sec",
                "value": round(joined_rows / flagship_sec, 1),
                "unit": "rows/sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "joined_rows": joined_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
