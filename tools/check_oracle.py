"""Driver-mimic: run every queries() entry against its oracle_sql()
via DuckDB at a given sf_dir; compare row count, column names and an
order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            parts.append(s.round(9).astype(str))
        else:
            parts.append(s.astype(str))
    joined = pd.concat(parts, axis=1).agg("|".join, axis=1)
    return hashlib.sha256("\n".join(sorted(joined)).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: "
                  f"{str(e)[:200]}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(res)} rows, "
                  f"cols={list(res.columns)})")
            continue
        try:
            ora = canon(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        if list(res.columns) != list(ora.columns):
            problems.append(f"cols {list(res.columns)} vs "
                            f"{list(ora.columns)}")
        if len(res) != len(ora):
            problems.append(f"rows {len(res)} vs {len(ora)}")
        if not problems and value_hash(res) != value_hash(ora):
            problems.append("value hash mismatch")
            merged = res.merge(ora, how="outer", indicator=True,
                               on=list(res.columns))
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"{len(diff)} differing rows; sample:\n"
                            f"{diff.head(6)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: {len(res)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
