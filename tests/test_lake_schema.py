"""Marker-borne schema on RoundTable reads (the schema rides in the
commit marker so reads skip the parquet-inference Spark job — see
sources/lake.py write_round docstring and scripts/jobs_probe.py)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_based_web_crawling_indexing_system_spark.sources.lake import RoundTable


@pytest.fixture()
def table(spark, tmp_path):
    return RoundTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="k string, v long, tags array<string>",
    )


def test_marker_carries_schema_and_read_uses_it(spark, table):
    table.write_round(0, _df(spark, [{"k": "a", "v": 1, "tags": ["x", "y"]}]))
    mk = json.load(open(os.path.join(table.path, "_commits", "000000.json")))
    assert mk["schema"]["type"] == "struct"
    assert [f["name"] for f in mk["schema"]["fields"]] == ["k", "v", "tags"]
    got = table.read_round(0)
    assert got.drop("round").schema == T.StructType.fromJson(mk["schema"])
    assert got.collect()[0]["tags"] == ["x", "y"]


def test_read_falls_back_without_marker_schema(spark, table):
    """Tables committed before markers carried a schema must still
    read (inference fallback)."""
    table.write_round(0, _df(spark, [{"k": "a", "v": 1, "tags": []}]))
    mkp = os.path.join(table.path, "_commits", "000000.json")
    mk = json.load(open(mkp))
    del mk["schema"]
    json.dump(mk, open(mkp, "w"))
    assert table._marker_schema(0) is None
    assert table.read_round(0).count() == 1
    assert table.read_all() is not None and table.read_all().count() == 1


def test_read_all_appends_partition_round_over_marker_schema(spark, table):
    for r in (0, 1, 2):
        table.write_round(r, _df(spark, [{"k": f"r{r}", "v": r, "tags": []}]))
    df = table.read_all(upto=1)
    assert df.schema["round"].dataType == T.IntegerType()
    assert sorted((x["round"], x["k"]) for x in df.collect()) == [(0, "r0"), (1, "r1")]


def test_pandas_write_path_records_schema(spark, table):
    pdf = pd.DataFrame({"round": [0], "key": ["n"], "value": [3]})
    schema = pa.schema(
        [pa.field("round", pa.int32()), pa.field("key", pa.string()),
         pa.field("value", pa.int64())]
    )
    table.write_round_pandas(0, pdf, schema)
    st = table._marker_schema(0)
    assert st is not None and [f.name for f in st.fields] == ["round", "key", "value"]
    row = table.read_round(0).collect()[0]
    assert (row["key"], row["value"]) == ("n", 3)


def test_replayed_round_updates_marker_schema(spark, table):
    """A replace-write with an evolved schema must win: readers follow
    the round's OWN marker, not a stale one."""
    table.write_round(0, _df(spark, [{"k": "a", "v": 1, "tags": []}]))
    evolved = _df(spark, [{"k": "a", "v": 1, "tags": []}]).withColumn(
        "extra", F.lit(7).cast("int")
    )
    table.write_round(0, evolved)
    st = table._marker_schema(0)
    assert [f.name for f in st.fields] == ["k", "v", "tags", "extra"]
    assert table.read_round(0).collect()[0]["extra"] == 7
