"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names and values (columns
sorted by name, rows sorted, floats rounded).  Stricter than the
driver's hash so that anything passing here passes there.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from splitserve_spark.registry import REGISTRY
from splitserve_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame, float_dp: int = 4) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            df[col] = s.astype("float64").round(float_dp)
        elif pd.api.types.is_datetime64_any_dtype(s):
            ts = pd.to_datetime(s)
            try:
                ts = ts.dt.tz_localize(None)
            except TypeError:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            df[col] = ts
        elif s.dtype == object:
            import numpy as np

            def conv(v):
                if isinstance(v, dict):
                    return tuple(sorted((k, conv(x)) for k, x in v.items()))
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(conv(x) for x in v)
                return v

            df[col] = s.map(conv)
        elif pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(oracle_df)} (oracle)"
    )
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    s, o = _normalize(spark_df), _normalize(oracle_df)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv):
            mism = ~(
                (sv.isna() & ov.isna())
                | ((sv - ov).abs() <= 1e-4 + 1e-6 * ov.abs().fillna(0))
            )
        else:
            mism = ~((sv.isna() & ov.isna()) | (sv == ov))
        if mism.any():
            idx = mism[mism].index[:5]
            detail = "\n".join(
                f"  row {i}: spark={sv[i]!r} oracle={ov[i]!r}" for i in idx
            )
            raise AssertionError(
                f"{name}: column {col!r} mismatches ({int(mism.sum())} rows):\n{detail}"
            )


def check_query(spark, name: str, sf_dir: str = SF_DIR_ORACLE) -> None:
    """Run query `name` on Spark and DuckDB at sf_dir; assert match."""
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert spark_pdf is not None
        return
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
