"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle_sql() runs on Spark AND DuckDB at sf0.01 and must
match on row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols].copy()
    rows = []
    for tup in out.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(f"{v:.6f}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows), cols


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    s_rows, s_cols = _normalize(spark_pdf)
    d_rows, d_cols = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
