"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-bound oracle SQL (ann_ivf_topk inlines centroid literals)
    # must be generated for the sf this check runs at
    import os
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[16]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: schema {list(a.columns)} vs "
                  f"{list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(neq.sum())} rows")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  duck :", b[neq].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
