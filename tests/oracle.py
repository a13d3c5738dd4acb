"""DuckDB-oracle differential harness mirroring the driver's compare:
row-count + schema (column names) + order-insensitive exact values."""

from __future__ import annotations

import duckdb
import pandas as pd

from research_data_pipeline_spark.tables import TPCH_TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for t in TPCH_TABLES:
            # driver layout is one file per table; test fixtures written
            # by Spark are part-file directories — glob those.
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    exp = duckdb_run(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} != oracle {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for col in g.columns:
        gs, es = g[col], e[col]
        if pd.api.types.is_datetime64_any_dtype(es) or pd.api.types.is_datetime64_any_dtype(gs):
            gs = pd.to_datetime(gs).astype("datetime64[us]")
            es = pd.to_datetime(es).astype("datetime64[us]")
        # The driver's value hash is representation-sensitive: an int64 Spark
        # column vs a float64 oracle column (e.g. DuckDB HUGEINT->float64)
        # hash-mismatches even when numerically equal. Model that here.
        if gs.dtype.kind in "iuf" and es.dtype.kind in "iuf":
            assert (gs.dtype.kind in "iu") == (es.dtype.kind in "iu"), (
                f"{name}.{col}: int/float representation differs: "
                f"spark={gs.dtype} oracle={es.dtype} (driver hash would fail)"
            )
        pd.testing.assert_series_equal(
            gs, es, check_dtype=False, check_exact=True, check_names=False,
            obj=f"{name}.{col}",
        )
