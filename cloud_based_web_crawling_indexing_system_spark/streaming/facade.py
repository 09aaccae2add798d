"""Structured Streaming façades over the engine (SURVEY.md §1:
"Structured Streaming + foreachBatch is an optional façade over the
same round function").

Two streaming surfaces:

- ``page_ingest_stream``: continuous ingestion of new WARC-style page
  files into the corpus — readStream(parquet) with watermarked
  dedup-by-url, the streaming equivalent of the S2/S3 frontier push
  plus D1 dedup for late/duplicate page captures.

- ``live_metrics_stream``: a live monitor over the crawl's metrics
  table (the C6 heartbeat/monitor view, §3.3): tail the metric rows
  as they commit and maintain running per-stage aggregates.

Both are driven to completion in tests with availableNow triggers /
``processAllAvailable`` (no long-running daemons in CI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["page_ingest_stream", "live_metrics_stream", "PAGES_SCHEMA"]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def page_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Ingest page parquet drops: watermark on capture time, drop
    duplicate urls within the watermark (first capture wins), append
    to the corpus sink exactly-once via the checkpointed sink.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``)
    so the watermark actually scopes AND EVICTS the dedup state — with
    the plain variant the state is global and grows unboundedly in a
    continuous run."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def live_metrics_stream(
    spark: SparkSession, metrics_data_dir: str, query_name: str = "crawl_monitor"
) -> StreamingQuery:
    """Tail the crawl's committed metric rows; keep running totals per
    (stage, key) in an in-memory table — the /monitor endpoint shape
    (/root/reference/Cloud/scripts/master.py:219-242) as a stream."""
    schema = "round int, partition_id int, stage string, key string, value long"
    stream = spark.readStream.schema(schema).parquet(metrics_data_dir)
    agg = stream.groupBy("stage", "key").agg(
        F.sum("value").alias("total"), F.count("*").alias("n_rows")
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
