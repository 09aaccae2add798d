"""URL-seen set: broadcast bloom pre-filter + exact anti-join (D1/D2/J4).

The reference's seen set is an exact MySQL unique index probed one
URL at a time (/root/reference/Cloud/scripts/indexer_worker.py:105-132).
At 10^10 URLs the scalable shape (north_star, BASELINE.json:6) is:

- approximate tier: a bloom filter over md5(url) broadcast to all
  executors; candidates that miss the bloom are definitely new and
  skip the expensive join;
- exact tier: a left-anti join against the seen table resolves bloom
  false positives (authoritative).

Hash scheme: the seen key is already md5 hex (P8), so the k bloom
positions are just k disjoint 8-hex-digit slices of the key modulo m —
computable identically JVM-side (``conv(substring(...),16,10)``) for
the build and NumPy-side for the vectorized probe; no Python/JVM hash
divergence possible.

The bit array grows incrementally on the driver (new positions per
round are appended; a resume rebuilds it from the seen table with one
aggregation), and ships to executors via ``SparkContext.broadcast``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomSeen", "position_cols"]

K = 4  # hash functions = 4 disjoint md5 slices


def position_cols(url_hash_col: str, m: int) -> list:
    """JVM-side bloom positions: slice i of the md5 hex, mod m."""
    return [
        F.pmod(
            F.conv(F.substring(F.col(url_hash_col), 1 + 8 * i, 8), 16, 10).cast("long"),
            F.lit(m),
        ).alias(f"_bp{i}")
        for i in range(K)
    ]


class BloomSeen:
    """Driver-held bloom bit array over the seen table."""

    def __init__(self, spark, m_bits: int = 1 << 22):
        self.spark = spark
        self.m = m_bits
        self.bits = np.zeros(m_bits, dtype=bool)
        self._bc = None

    N_SHARDS = 64

    def add_positions_df(self, df: DataFrame, url_hash_col: str = "url_hash") -> None:
        """OR the new rows into the bit array WITHOUT shipping raw
        positions to the driver: positions are sharded, each shard's
        partial bitmap is packed executor-side (applyInPandas), and the
        driver collects at most N_SHARDS fixed-size byte arrays —
        O(m/8) bytes total regardless of row count, so the update cost
        scales out with executors instead of serializing on the
        driver."""
        import pandas as pd

        m = self.m
        shard_size = m // self.N_SHARDS  # m is a power of two

        pos = df.select(
            F.explode(F.array(*position_cols(url_hash_col, m))).alias("p")
        ).withColumn("shard", (F.col("p") / F.lit(shard_size)).cast("int"))

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            local = np.zeros(shard_size, dtype=bool)
            local[pdf["p"].to_numpy(dtype=np.int64) - shard * shard_size] = True
            return pd.DataFrame({"shard": [shard], "bits": [np.packbits(local).tobytes()]})

        rows = pos.groupBy("shard").applyInPandas(pack, "shard int, bits binary").collect()
        for r in rows:
            s = r["shard"]
            self.bits[s * shard_size : (s + 1) * shard_size] |= np.unpackbits(
                np.frombuffer(r["bits"], dtype=np.uint8)
            ).astype(bool)
        self._bc = None  # invalidate broadcast

    def _broadcast(self):
        if self._bc is None:
            self._bc = self.spark.sparkContext.broadcast(np.packbits(self.bits))
        return self._bc

    def prefilter(self, cand: DataFrame, url_hash_col: str = "url_hash") -> DataFrame:
        """Adds boolean ``_maybe_seen``; False rows are DEFINITELY new."""
        bc = self._broadcast()
        m = self.m
        pcols = position_cols(url_hash_col, m)
        with_pos = cand.select("*", *pcols)
        pos_names = [f"_bp{i}" for i in range(K)]

        @F.pandas_udf("boolean")
        def probe(*cols: pd.Series) -> pd.Series:
            packed = bc.value  # np.packbits layout: MSB-first within byte
            out = np.ones(len(cols[0]), dtype=bool)
            for c in cols:
                pos = c.to_numpy(dtype=np.int64)
                byte = packed[pos >> 3]
                out &= ((byte >> (7 - (pos & 7))) & 1).astype(bool)
            return pd.Series(out)

        return with_pos.withColumn("_maybe_seen", probe(*pos_names)).drop(*pos_names)


def filter_new(
    cand: DataFrame,
    seen_df: DataFrame | None,
    bloom: BloomSeen | None,
    url_hash_col: str = "url_hash",
) -> DataFrame:
    """Exact new-URL filter: bloom pre-filter (approximate) then
    left-anti join vs the seen table (authoritative)."""
    if seen_df is None:
        return cand
    if bloom is not None:
        pre = bloom.prefilter(cand, url_hash_col)
        definitely_new = pre.where(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = pre.where(F.col("_maybe_seen")).drop("_maybe_seen")
        resolved = maybe.join(
            seen_df.select(F.col(url_hash_col)), url_hash_col, "left_anti"
        )
        return definitely_new.unionByName(resolved)
    return cand.join(seen_df.select(F.col(url_hash_col)), url_hash_col, "left_anti")
