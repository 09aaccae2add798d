"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship crawl-shaped query (postings build +
  §2.8 AND search) on /root/testdata/sf0.001.
- ``queries()``: every SQL-expressible operator probe from
  cloud_based_web_crawling_indexing_system_spark.plans.probes
  (SURVEY.md §2 operator shapes + the training-pipeline suite:
  dedup exact/minhash-LSH/simhash/jaccard, embedding kNN + near-dup,
  quality scoring, fingerprinting, blob plumbing).
- ``oracle_sql()``: the matching DuckDB SQL per probe.

The crawl engine itself (round loop, byte-identical extraction,
Porter postings, robots/politeness/seen-set, resume) is exercised by
``python -m pytest -x -q`` against the sequential reference oracle —
see tests/test_crawl_vs_oracle.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud_based_web_crawling_indexing_system_spark.plans import probes  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return probes.registry()["q21_search_and"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return probes.registry()


def oracle_sql() -> dict[str, str]:
    return probes.oracles()
