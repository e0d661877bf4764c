"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the same sf dir,
compare row count + schema-width + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else str(bool(v)))
        elif pd.api.types.is_numeric_dtype(df[c]):
            # dtype-insensitive: int64 99111 and float64 99111.0 both → same
            df[c] = df[c].map(
                lambda v: "NULL"
                if pd.isna(v)
                else ("%.6f" % round(float(v), 6))
            )
        else:
            df[c] = df[c].map(lambda v: "NULL" if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def value_hash(df: pd.DataFrame) -> int:
    return int(
        pd.util.hash_pandas_object(
            canon(df).astype(str).agg("|".join, axis=1), index=False
        ).sum()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from dig_entity_resolution_spark.session import build_session

    spark = build_session(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    from dig_entity_resolution_spark.operators.dedup import release_caches

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # dedup queries persist intermediates; freeing them per query
            # keeps a 45-query session's executor storage flat (r3 review)
            release_caches()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{status} {name}: rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_rows and ok_cols:
            a, b = canon(sdf), canon(odf)
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            print("  first diffs:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
