"""Structured Streaming façades over the engine (SURVEY.md §1:
"Structured Streaming + foreachBatch is an optional façade over the
same round function").

Three streaming surfaces:

- ``page_ingest_stream``: continuous ingestion of new WARC-style page
  files into the corpus — readStream(parquet) with watermarked
  dedup-by-url, the streaming equivalent of the S2/S3 frontier push
  plus D1 dedup for late/duplicate page captures.

- ``live_metrics_stream``: a live monitor over the crawl's metrics
  table (the C6 heartbeat/monitor view, §3.3): tail the metric rows
  as they commit and maintain running per-stage aggregates.

- ``host_stats_stream``: a CUSTOM STATEFUL operator via
  ``applyInPandasWithState`` — per-host cumulative counts + latest
  capture time held in the checkpointed state store, surviving
  restarts; the streaming form of the per-host crawl counters.

Both are driven to completion in tests with availableNow triggers /
``processAllAvailable`` (no long-running daemons in CI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "page_ingest_stream",
    "host_stats_stream",
    "live_metrics_stream",
    "PAGES_SCHEMA",
]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def page_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Ingest page parquet drops: watermark on capture time, drop
    duplicate urls within the watermark (first ARRIVAL wins — the row
    processed first is kept, which is the reference's seen_urls-claim
    semantics; it is NOT min-warc_ts: a re-capture whose file arrives
    before the original's keeps the re-capture), append to the corpus
    sink exactly-once via the checkpointed sink.

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


def host_stats_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    per-host cumulative page counts + latest capture time, state kept
    in the checkpointed state store across triggers AND restarts —
    the streaming form of the per-host crawl counters (C6/A3), i.e.
    what a live politeness/rate controller would consume.

    Arrow-batched like every other per-row path in the engine; the
    host key comes from the JVM's parse_url, so the Python side only
    folds counts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
        .select(
            F.expr("parse_url(url, 'HOST')").alias("host"),
            F.col("warc_ts").cast("long").alias("ts"),
        )
    )

    def fold(key, pdfs, state: GroupState):
        total, last_ts = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            # dropna: warc_ts is nullable, and an all-null batch's
            # max() is NaN — int(NaN) would kill the streaming query
            ts = pdf["ts"].dropna()
            if len(ts):
                last_ts = max(last_ts, int(ts.max()))
        state.update((total, last_ts))
        yield pd.DataFrame(
            {"host": [key[0]], "n_pages": [total], "last_ts": [last_ts]}
        )

    out = stream.groupBy("host").applyInPandasWithState(
        fold,
        outputStructType="host string, n_pages long, last_ts long",
        stateStructType="total long, last_ts long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    def sink(batch_df, epoch_id: int) -> None:
        # foreachBatch is the checkpoint-recoverable sink for update
        # mode (the memory sink cannot resume); appends are idempotent
        # enough here because readers take the max per host
        batch_df.write.mode("append").parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def live_metrics_stream(
    spark: SparkSession, metrics_data_dir: str, query_name: str = "crawl_monitor"
) -> StreamingQuery:
    """Tail the crawl's metric rows as they land; keep running totals
    per (stage, key) in an in-memory table — the /monitor endpoint
    shape (/root/reference/Cloud/scripts/master.py:219-242) as a
    stream.  Files appear atomically (lake.write_round_pandas renames
    into place).  Monitor semantics, not a ledger: a crashed round's
    rows are visible until its replay rewrites them, and the file
    source keys by path so the (deterministic, identical) rewrite is
    not re-read.  ``ignoreMissingFiles``: a replay DELETES the round
    file before rewriting it (lake.py replace-write) — a micro-batch
    that listed the old file must skip it, not kill the query."""
    # full on-disk metrics schema incl. job_id (crawl._METRICS_SCHEMA;
    # advisor r3: the stream must not silently prune columns the sink
    # gained).  Parquet files written before the job_id column read as
    # null under this schema -> coalesced to '' like _write_metrics
    # writes for non-job rows.
    schema = (
        "round int, partition_id int, stage string, key string, value long, "
        "job_id string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("ignoreMissingFiles", "true")
        .parquet(metrics_data_dir)
        .withColumn("job_id", F.coalesce(F.col("job_id"), F.lit("")))
    )
    # stage='job' rows keep their job attribution as a grouping key
    # (job_id = '' for round/parse rows), so per-job running totals
    # stay separable instead of folding into the stage/key totals
    agg = stream.groupBy("stage", "key", "job_id").agg(
        F.sum("value").alias("total"), F.count("*").alias("n_rows")
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
