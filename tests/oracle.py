"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark AND its oracle SQL through DuckDB on the
same parquet tables, then compares row-count, column names, and an
order-insensitive value hash with columns sorted by name — the same contract
described in __spark_entry__.py. Used by tests so oracle breakage is caught
before the driver runs.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and float repr noise
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_bag(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle: str, sf_dir: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle, sf_dir)
    result = {
        "rowcount_match": len(s_rows) == len(d_rows),
        "columns_match": sorted(s_cols) == sorted(d_cols),
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    if result["rowcount_match"] and result["columns_match"]:
        sb, db = value_bag(s_cols, s_rows), value_bag(d_cols, d_rows)
        result["values_match"] = sb == db
        if not result["values_match"]:
            diff = [(a, b) for a, b in zip(sb, db) if a != b][:5]
            result["first_diffs"] = diff
    else:
        result["values_match"] = False
    result["ok"] = result["rowcount_match"] and result["columns_match"] and result["values_match"]
    return result
