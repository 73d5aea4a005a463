"""Runs every queries.py entry on Spark AND its DuckDB oracle twin, then
compares row counts, column names and values (order-insensitive, columns
sorted by name) — a local mirror of the driver's CORRECTNESS gate."""

import math

import duckdb
import pytest

from amharic_ecommerce_data_extractor_spark.queries import ORACLE_SQL, SPARK_QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    sdf = SPARK_QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLE_SQL[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"

    got = _normalize(srows, scols)
    want = _normalize(drows, dcols)
    mismatch = [
        (g, w) for g, w in zip(got, want)
        if not _rows_close(g, w)
    ]
    assert not mismatch, f"{name}: first mismatches {mismatch[:3]}"


def _rows_close(g, w):
    if len(g) != len(w):
        return False
    for a, b in zip(g, w):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                continue
            if abs(a - b) > 1e-6 * max(1.0, abs(a), abs(b)):
                return False
        elif a != b:
            return False
    return True


def test_all_queries_have_entries():
    assert set(ORACLE_SQL) <= set(SPARK_QUERIES)
    assert len(SPARK_QUERIES) >= 20
