"""Local mirror of the driver's correctness gate: run every probe's
Spark DataFrame and DuckDB oracle SQL on sf0.001 testdata and compare
row count, column names, dtypes, and values.

Strictness matches the driver's value-hash: values are compared with
their Python types intact (``5 != 5.0``), and pandas dtype *kinds* are
compared per column, so an oracle that returns float64 where Spark
returns int64 (e.g. an uncast DuckDB ``SUM(BIGINT)`` -> HUGEINT)
fails here exactly as it fails the driver."""

import math

import duckdb
import pytest

from cloud_based_web_crawling_indexing_system_spark.plans import probes

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    # Keep the Python type: int stays int, float stays float.  The only
    # normalization is NaN (unorderable / self-unequal).
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _typed(v):
    return (type(v).__name__, _norm(v))


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_typed(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


_KIND = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts", "O": "obj"}


def _kinds(pdf):
    return {c: _KIND.get(pdf[c].dtype.kind, pdf[c].dtype.kind) for c in pdf.columns}


@pytest.mark.parametrize("name", sorted(probes.registry()))
def test_probe_matches_duckdb(spark, ddb, name):
    fn = probes.registry()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_pdf = sdf.toPandas()
    spark_rows = list(spark_pdf.itertuples(index=False, name=None))

    sql = probes.oracles().get(name)
    if sql is None:
        pytest.skip("rows-only probe (no SQL oracle)")
    duck_pdf = ddb.execute(sql).df()
    duck_cols = list(duck_pdf.columns)
    duck_rows = list(duck_pdf.itertuples(index=False, name=None))

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert _kinds(spark_pdf) == _kinds(duck_pdf), (
        f"{name}: dtype mismatch spark={_kinds(spark_pdf)} duckdb={_kinds(duck_pdf)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"
