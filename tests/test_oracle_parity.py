"""Replicates the driver's correctness gate: every query with an oracle is
run through Spark AND DuckDB and compared (row count, schema width,
order-insensitive values). Exact equality — the driver hashes values, so
'close' is not good enough.

Marked ``fullparity`` (VERDICT r7 #7): this sweep dominates the suite's
wall clock (one Spark + one DuckDB execution per registry entry), so the
developer loop runs ``pytest tests/ -m "not fullparity"`` and CI / the
end-of-session gate runs everything."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from airflow_etl_spark import catalog, queries as Q


def _oracle_df(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in catalog.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].where(pd.notna(out[c]), None)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )
    return out


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return (a is None or (isinstance(a, float) and math.isnan(a)))  and (
                b is None or (isinstance(b, float) and math.isnan(b))
            )
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


pytestmark = pytest.mark.fullparity

WITH_ORACLE = sorted(Q.oracle_sql())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = Q.queries()[name]
    sql = Q.oracle_sql()[name]

    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = _oracle_df(sf_dir, sql)

    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )

    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    mismatches = []
    for i in range(len(s)):
        for c in s.columns:
            av, bv = s.iloc[i][c], o.iloc[i][c]
            av = None if (av is pd.NA or (isinstance(av, float) and pd.isna(av))) else av
            bv = None if (bv is pd.NA or (isinstance(bv, float) and pd.isna(bv))) else bv
            if not _values_equal(av, bv):
                mismatches.append((i, c, av, bv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (row, col, spark, oracle): {mismatches}"
