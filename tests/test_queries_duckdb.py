"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row count + schema-sorted values EXACTLY (the driver hashes values, so any
fp divergence must be engineered away in the query, not tolerated here)."""

import duckdb
import pandas as pd
import pytest

import os

SF_DIR = os.environ.get("SWLST_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        df[c] = df[c].astype(object).where(pd.notna(df[c]), None)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)


def _pairs():
    from __spark_entry__ import oracle_sql, queries
    q = queries()
    o = oracle_sql()
    return [(name, q[name], o[name]) for name in o]


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_duckdb_oracle(spark, name, qfn, sql):
    got = _norm(qfn(spark, SF_DIR).toPandas())
    exp = _norm(_duck(sql))
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        mism = [
            (i, a, b) for i, (a, b) in enumerate(zip(got[c], exp[c])) if repr(a) != repr(b)
        ][:5]
        assert not mism, f"{name}.{c}: {mism}"


def test_rows_only_queries_run(spark):
    from __spark_entry__ import oracle_sql, queries
    rows_only = set(queries()) - set(oracle_sql())
    for name in rows_only:
        df = queries()[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    from __spark_entry__ import entry
    df = entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
