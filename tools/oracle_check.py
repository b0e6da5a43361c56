#!/usr/bin/env python3
"""Driver-style oracle comparison: for each query output written by
graft.Verify, run the matching oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values (sorted columns, sorted rows,
dtype-sensitive hash) — a local replica of the CORRECTNESS_r{N}.json gate.

Usage: python3 tools/oracle_check.py <verifyOutDir> <sfDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        h.update(pd.util.hash_pandas_object(df[col], index=False).values.tobytes())
    return h.hexdigest()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            oracle_df = con.execute(sql).df()
            s, o = canon(spark_df), canon(oracle_df)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            # dtype-align like the driver: compare values after casting to
            # common dtypes where pandas read parquet differently
            for c in s.columns if schema else []:
                if s[c].dtype != o[c].dtype:
                    try:
                        o[c] = o[c].astype(s[c].dtype)
                    except (TypeError, ValueError):
                        pass
            match = rows and schema and hash_df(s) == hash_df(o)
            status = "OK  " if match else "FAIL"
            if not match:
                failures += 1
                detail = f" rows {len(s)}/{len(o)} cols {list(s.columns)}/{list(o.columns)}"
                if rows and schema:
                    neq = (s != o) & ~(s.isna() & o.isna())
                    bad = neq.any()
                    detail += f" diff-cols={list(bad[bad].index)}"
                    for c in list(bad[bad].index)[:2]:
                        i = neq[c].idxmax()
                        detail += f" [{c}@{i}: {s[c][i]!r} vs {o[c][i]!r}]"
            else:
                detail = f" rows={len(s)}"
            print(f"{status} {name}{detail}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERR  {name}: {e}")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
