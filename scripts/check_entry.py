"""Replicate the driver's correctness check: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
counts, schemas (column names), and order-insensitive values."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from xltsearch_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(None if pd.isna(v) else (round(v, 9) if isinstance(v, float) else v)
                  for v in r) for r in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def main(sf_dir="/root/testdata/sf0.01", *only):
    spark = get_spark("check_entry", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:  # check a subset: scripts/check_entry.py <sf_dir> name1 name2 ...
        qs = {k: v for k, v in qs.items() if k in only}
    n_bad = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        ok_schema = sorted(sdf.columns) == sorted(ddf.columns)
        ok_rows = len(sdf) == len(ddf)
        ok_vals = ok_schema and ok_rows and norm(sdf) == norm(ddf)
        status = "OK  " if ok_vals else "FAIL"
        print(f"{status} {name}: spark {len(sdf)} rows vs duckdb {len(ddf)}; "
              f"schema {'ok' if ok_schema else f'{list(sdf.columns)} vs {list(ddf.columns)}'}")
        if not ok_vals:
            n_bad += 1
            a, b = norm(sdf), norm(ddf)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            only_a = [x for x in a if x not in b][:3]
            only_b = [x for x in b if x not in a][:3]
            print("   first diffs:", diff or (only_a, only_b))
    print("ENTRY CHECK:", "ALL OK" if n_bad == 0 else f"{n_bad} FAILURES")
    try:
        r = entry_mod.entry(spark)
        rows = r.collect()
        print(f"entry(): {len(rows)} rows, schema={[f.name for f in r.schema.fields]}")
    except Exception as e:
        print("entry() FAILED:", e)
        n_bad += 1
    spark.stop()
    return n_bad


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
