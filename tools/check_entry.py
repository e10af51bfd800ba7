"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf_dir and compare row count,
column names, and order-insensitive values against oracle_sql() in DuckDB.

Usage: python tools/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from ds_discovery_opensearch_taxonomy_spark.cli import make_spark

    spark = make_spark("8", shuffle_partitions=8)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle, rows-only) [{dt:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {e}")
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(g)} rows differ")
            print("  engine:", g[diff].head(3).to_dict("records"))
            print("  oracle:", e[diff].head(3).to_dict("records"))
            continue
        print(f"OK    {name}: {len(g)} rows match [{dt:.1f}s]")

    # flagship smoke
    if not only:
        df = entry_mod.entry(spark)
        n = df.count()
        print(f"ENTRY {n} rows, schema {df.schema.simpleString()}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
