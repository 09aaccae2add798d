"""Round-log lake tables: snapshot-per-round parquet with atomic commits.

The north-star deployment stores every engine table (frontier,
seen_urls, postings, metrics) in Iceberg, one snapshot per crawl
round, resumable mid-crawl (BASELINE.json:14).  The Iceberg runtime
jars are not in this sandbox, so this module provides the same
*semantics* over plain parquet with an explicit commit log — the API
is shaped so an Iceberg backend is a drop-in (`append` -> writeTo().
append(), `replace_round` -> overwriteWhere, `committed_rounds` ->
snapshot history):

    table/
      data/round=NNNNNN/*.parquet   (written first)
      _commits/NNNNNN.json          (written last, via atomic rename)

Readers only see rounds with a commit marker, so a crashed round is
invisible and a re-run of the same round replaces its data directory
then re-marks it — idempotent replay, which is exactly the resume
contract (SURVEY.md §4.4, C8).

Scale notes: at 10^10 URLs each round directory is written by all
executors in parallel (plain distributed parquet write — no driver
bottleneck); reading `rounds <= r` is partition-pruned by directory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["RoundTable"]


@dataclass
class RoundTable:
    spark: SparkSession
    path: str  # table root directory

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def _commit_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def committed_rounds(self) -> list[int]:
        d = self._commit_dir
        if not os.path.isdir(d):
            return []
        return sorted(int(f[:-5]) for f in os.listdir(d) if f.endswith(".json"))

    def last_round(self) -> int | None:
        rs = self.committed_rounds()
        return rs[-1] if rs else None

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self._data_dir, f"round={rnd:06d}")

    def _uncommit(self, rnd: int) -> None:
        """Drop the commit marker BEFORE touching a round's data dir:
        'readers only see rounds with a marker' must hold THROUGH the
        rewrite window of a replayed round, not just between writes —
        otherwise a reader that listed the still-committed round races
        the rmtree and fails on the vanished directory.  (Same
        marker-first order truncate_after uses.)"""
        mk = os.path.join(self._commit_dir, f"{rnd:06d}.json")
        if os.path.isfile(mk):
            os.remove(mk)

    def _commit(self, rnd: int, meta: dict | None = None) -> None:
        """Atomic commit marker (tmp json + rename) — the ONE copy of
        the marker protocol, shared by both write paths."""
        os.makedirs(self._commit_dir, exist_ok=True)
        marker = {"round": rnd, "ts": time.time(), **(meta or {})}
        tmp = os.path.join(self._commit_dir, f".{rnd:06d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, os.path.join(self._commit_dir, f"{rnd:06d}.json"))  # atomic

    def write_round(self, rnd: int, df: DataFrame, meta: dict | None = None) -> None:
        """Replace-write round ``rnd`` then commit it (Iceberg:
        ``overwrite(col('round')==rnd)`` in one snapshot).

        The writer's schema rides in the commit marker so readers pass
        it to ``spark.read.schema(...)`` — parquet footer inference on
        an UNKNOWN schema is a per-read Spark job (one stage-job of
        pure launch latency per round in the crawl loop, measured in
        scripts/jobs_probe.py), while a marker read is a driver-side
        os read the commit protocol already does.  (Iceberg: the
        table metadata carries the schema the same way.)"""
        rd = self._round_dir(rnd)
        self._uncommit(rnd)
        if os.path.isdir(rd):
            shutil.rmtree(rd)  # idempotent replay of an uncommitted/re-run round
        df.write.mode("overwrite").parquet(rd)
        self._commit(rnd, {**(meta or {}), "schema": df.schema.jsonValue()})

    def write_round_pandas(self, rnd: int, pdf, schema, meta: dict | None = None) -> None:
        """Driver-side replace-write for TINY round payloads (metrics):
        one pyarrow file, no Spark job at all."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rd = self._round_dir(rnd)
        self._uncommit(rnd)
        if os.path.isdir(rd):
            shutil.rmtree(rd)
        os.makedirs(rd, exist_ok=True)
        table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        # write-then-rename so the file APPEARS atomically: a live
        # reader (e.g. the streaming metrics monitor tailing data/)
        # must never see a half-written parquet footer
        tmp = os.path.join(rd, ".part-00000.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(rd, "part-00000.parquet"))
        meta = dict(meta or {})
        try:  # same marker-borne schema as write_round (skip on any
            from pyspark.sql.pandas.types import from_arrow_schema

            meta["schema"] = from_arrow_schema(table.schema).jsonValue()
        except Exception:  # noqa: BLE001 — arrow-type gap: reader falls back to inference
            pass
        self._commit(rnd, meta)

    def file_row_counts(self, rnd: int) -> list[int]:
        """Per-file (== per-writing-partition) row counts from parquet
        footers — free per-partition lineage."""
        import pyarrow.parquet as pq

        rd = self._round_dir(rnd)
        return [
            pq.read_metadata(os.path.join(rd, f)).num_rows
            for f in sorted(os.listdir(rd))
            if f.endswith(".parquet")
        ]

    def count_round(self, rnd: int) -> int:
        """Row count from parquet footers via pyarrow — pure driver-side
        metadata reads, no Spark job."""
        import pyarrow.parquet as pq

        rd = self._round_dir(rnd)
        total = 0
        for f in os.listdir(rd):
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(rd, f)).num_rows
        return total

    def _marker_schema(self, rnd: int):
        """Writer schema recorded in the commit marker (None for
        tables written before markers carried one)."""
        from pyspark.sql.types import StructType

        mk = os.path.join(self._commit_dir, f"{rnd:06d}.json")
        try:
            with open(mk) as f:
                js = json.load(f).get("schema")
            return StructType.fromJson(js) if js else None
        except (OSError, ValueError, KeyError):
            return None

    def read_round(self, rnd: int) -> DataFrame:
        from pyspark.sql import functions as F

        st = self._marker_schema(rnd)
        reader = self.spark.read.schema(st) if st is not None else self.spark.read
        return reader.parquet(self._round_dir(rnd)).withColumn("round", F.lit(rnd))

    def read_all(
        self, upto: int | None = None, after: int | None = None
    ) -> DataFrame | None:
        """All committed rounds (optionally ``after < round <= upto``)
        as ONE partitioned parquet scan — the 'current table state'
        view.  The directory layout ``data/round=NNNNNN`` IS a hive
        partitioning, so this is a single FileSourceScan with the
        round filter partition-pruned, instead of an O(#rounds)
        union-of-plans that blows up the planner at thousands of
        rounds.  Uncommitted/stale round dirs (a crashed attempt) are
        excluded by the same pruning filter."""
        from pyspark.sql import functions as F

        rounds = self.committed_rounds()
        if upto is not None:
            rounds = [r for r in rounds if r <= upto]
        if after is not None:
            rounds = [r for r in rounds if r > after]
        if not rounds:
            return None
        # data schema from the newest marker (stable per table); the
        # hive partition column `round` is appended by partition
        # discovery on top of the user-specified DATA schema
        st = self._marker_schema(rounds[-1])
        reader = self.spark.read.schema(st) if st is not None else self.spark.read
        df = reader.option("basePath", self._data_dir).parquet(
            *(self._round_dir(r) for r in rounds)
        )
        return df.withColumn("round", F.col("round").cast("int"))

    def truncate_after(self, rnd: int) -> None:
        """Drop commits > rnd (used by kill-and-resume tests to model a
        crash between rounds)."""
        for r in self.committed_rounds():
            if r > rnd:
                os.remove(os.path.join(self._commit_dir, f"{r:06d}.json"))
                rd = self._round_dir(r)
                if os.path.isdir(rd):
                    shutil.rmtree(rd)
