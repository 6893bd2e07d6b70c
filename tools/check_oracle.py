"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count, schema (column names), and order-insensitive values.

Values are compared through pandas on BOTH sides (Spark ``toPandas`` /
DuckDB ``.df()``) including the pandas dtype per column — this mimics the
driver's value-hash, which caught BIGINT-vs-HUGEINT width mismatches that a
plain str() compare hides (round-1 lesson: event_type_pivot /
tile_pyramid_rollup hashed differently purely on integer width).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def canon_pdf(pdf):
    """Order-insensitive canonical rows + dtype fingerprint from a pandas
    DataFrame: columns sorted by name, floats rounded to 9, NaN/None
    normalized."""
    import pandas as pd

    cols = sorted(pdf.columns)
    dtypes = {}
    for c in cols:
        k = pdf[c].dtype.kind  # i/u -> int, f -> float, else object-ish
        dtypes[c] = {"i": "int", "u": "int", "f": "float"}.get(k, "obj")
    rows = []
    for tup in pdf[cols].itertuples(index=False, name=None):
        vals = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(round(v, 9)))
            else:
                s = str(v)
                # DuckDB DATE -> pandas datetime64 prints a midnight time;
                # Spark to_date -> datetime.date doesn't. Strip it on both
                # sides (driver's hash treats them as equal — r1 evidence).
                if s.endswith(" 00:00:00"):
                    s = s[:-9]
                vals.append(s)
        rows.append("|".join(vals))
    return sorted(rows), dtypes


def main():
    import duckdb

    import __spark_entry__ as entry
    from robosat_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    osql = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        if name not in osql:
            print(f"{name:<26} rows-only: {len(spdf)} rows")
            continue
        dpdf = con.execute(osql[name]).df()
        status = []
        if sorted(spdf.columns) != sorted(dpdf.columns):
            status.append(f"SCHEMA spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}")
        elif len(spdf) != len(dpdf):
            status.append(f"ROWS spark={len(spdf)} duck={len(dpdf)}")
        else:
            s, sdt = canon_pdf(spdf)
            d, ddt = canon_pdf(dpdf)
            if sdt != ddt:
                mism = {c: (sdt[c], ddt[c]) for c in sdt if sdt[c] != ddt[c]}
                status.append(f"DTYPES {mism}")
            if s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                status.append(f"VALUES first-diffs={diff}")
        if status:
            failures.append(name)
            print(f"{name:<26} FAIL  {' ; '.join(status)}")
        else:
            print(f"{name:<26} OK    {len(spdf)} rows")
    print()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
