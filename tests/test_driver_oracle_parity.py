"""Emulates the driver's correctness gate locally: every queries() entry with
an oracle must match the DuckDB result on the same parquet — row count,
column names, and exact values after name-sorting columns and row-sorting.

Runs at sf0.001 for speed (the driver uses sf0.01; same code path).
"""

import duckdb
import pandas as pd
import pytest

from sequenzo_spark.driver_queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, duck):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)


def test_all_queries_have_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLE_SQL)
    # documented rows-only checks (non-SQL-expressible / probabilistic)
    assert missing <= {
        "turbulence",           # subsequence-count DP
        "minhash_lsh_candidates",  # engine-specific hash + probabilistic
        "simhash",              # engine-specific hash
        "lsh_cosine_topk",      # approximate ANN
    }, missing
