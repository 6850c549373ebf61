"""Local mimic of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at a given sf, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray" else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rowcount {len(got)} vs {len(want)}")
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a.isna() & b.isna()) | (abs(a - b) < 1e-9)).all()
            else:
                ok = (a.fillna("__N__") == b.fillna("__N__")).all() if a.dtype == object else (a.isna() & b.isna()).all() or (a == b).all()
            if not ok:
                bad = (a != b) if a.dtype != object else (a.fillna("__N__") != b.fillna("__N__"))
                idx = list(g.index[bad])[:3]
                problems.append(f"values differ in {c} at {idx}: got={list(a[bad][:2])} want={list(b[bad][:2])}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sf = synth.sf_name_of(sf_dir)
    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entrymod._oracle_sql_for(sf)
    failures = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
    print("entry(spark):", entrymod.entry(spark).count(), "rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
