"""Mimics the driver's CORRECTNESS gate: run every queries() entry at
sf0.01 against its oracle_sql() twin in DuckDB — row-count, schema-shape
and (column-name-sorted, row-sorted) value equality."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalise(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = _normalise(QUERIES[name](spark, SF_DIR).toPandas())
    exp = _normalise(ddb.sql(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            assert np.allclose(g.astype(float), e.astype(float), atol=1.5e-6, equal_nan=True), f"{name}.{c}"
        else:
            assert (g == e).all(), f"{name}.{c}: first diff {g[g != e][:3]} vs {e[g != e][:3]}"


def test_rows_only_queries_run(spark):
    # iterative / non-SQL ops: must run and return >=0 rows, stable schema
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        n = df.count()
        assert n >= 0 and len(df.schema.fields) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["name", "comm"]
