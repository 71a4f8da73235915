"""Local replica of the driver's DuckDB differential-testing oracle.

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet tables and compares row count, column names, and an
order-insensitive canonical form of all values (the driver hashes; we diff
so failures are debuggable). Floats are compared exactly — queries are
expected to round on BOTH sides so values are bit-identical
(FIXTURES.md oracle-compatibility rules).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import numpy as np

TABLES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def duckdb_connect(sf_dir: str = DEFAULT_SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        if f == 0.0:  # -0.0 == 0.0
            return "0.0"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return _canon_cell(v.to_pydatetime())
    return str(v)


def canonicalize(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_df, oracle_sql: str, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Raise AssertionError with a useful diff if the two sides disagree."""
    spark_pdf = spark_df.toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pdf = con.execute(oracle_sql).fetch_df()
    finally:
        con.close()

    s_cols, s_rows = canonicalize(spark_pdf)
    d_cols, d_rows = canonicalize(duck_pdf)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}\n"
        f"spark head: {s_rows[:3]}\nduckdb head: {d_rows[:3]}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ]
        head = "\n".join(
            f"  row {i}:\n    spark : {a}\n    duckdb: {b}" for i, a, b in diffs[:5]
        )
        raise AssertionError(
            f"value mismatch in {len(diffs)}/{len(s_rows)} rows (sorted):\n{head}"
        )
