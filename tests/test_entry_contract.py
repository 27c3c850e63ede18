"""Replicates the driver's correctness gate locally: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf0.01 parquet, compare row count + column names + order-insensitive
values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        if pd.api.types.is_float_dtype(g[c]):
            ok = all(
                (pd.isna(a) and pd.isna(b))
                or (a == b)
                or (not pd.isna(a) and not pd.isna(b) and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9))
                for a, b in zip(gv, wv)
            )
        else:
            ok = gv == wv
        assert ok, f"{name}: column {c} values differ\nspark head: {gv[:5]}\noracle head: {wv[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema is not None


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    assert name in sqls, f"{name} missing oracle SQL"
    got = q(spark, SF_DIR).toPandas()
    want = duck.sql(sqls[name]).df()
    _compare(name, got, want)
