"""Emulates the driver's correctness gate: run every ``queries()`` entry on
Spark at sf0.01 and compare to ``oracle_sql()`` on DuckDB — row count, column
names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle():
    # every queries() entry carries a full DuckDB oracle — no rows-only rows
    assert E.queries().keys() <= E.oracle_sql().keys()


@pytest.mark.parametrize("name", sorted(E.queries().keys() & E.oracle_sql().keys()))
def test_query_vs_oracle(spark, ddb, name):
    got = canon(E.queries()[name](spark, SF_DIR).toPandas())
    want = canon(ddb.execute(E.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a = got[c].to_numpy()
            b = want[c].to_numpy(dtype=float)
            nan_match = (pd.isna(a) == pd.isna(b)).all()
            assert nan_match, f"{name}.{c}: NaN placement differs"
            mask = ~pd.isna(a)
            assert (abs(a[mask] - b[mask]) <= 1e-9).all(), f"{name}.{c}: values differ"
        else:
            assert got[c].equals(want[c].astype(got[c].dtype)), f"{name}.{c}: values differ"
