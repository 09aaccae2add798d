"""URL-seen set: sharded bloom pre-filter + exact anti-join (D1/D2/J4).

The reference's seen set is an exact MySQL unique index probed one
URL at a time (/root/reference/Cloud/scripts/indexer_worker.py:105-132).
At 10^10 URLs the scalable shape (north_star, BASELINE.json:6) is:

- approximate tier: a bloom filter over md5(url), sharded by key;
  candidates that miss the bloom are definitely new and skip the
  expensive join;
- exact tier: a left-anti join against the seen table resolves bloom
  false positives (authoritative — the bloom is NEVER authoritative).

Layout.  The key's shard is a salted md5 slice; its K=4 bit positions
are salted md5 slices local to that shard, so every key's bits live in
ONE shard.  All hash arithmetic is JVM-side Catalyst expressions
(``md5``/``conv``/``pmod``) for build AND probe — the Python side only
ever indexes into byte arrays, so no Python/JVM hash divergence is
possible.

Sizing.  m is sized from |seen| at BITS_PER_KEY=16 with K=4 probes:
FP = (1 - e^(-K·n/m))^K ≈ 0.24 %.  When n grows past m/BITS_PER_KEY
the filter is rebuilt at the next power of two from the seen table
(one aggregation) — the fixed-m failure mode (FP saturation at
10^10 keys turning the prefilter into pure overhead) cannot happen.

Residency.  The bit shards live in a parquet side table written and
OR-merged BY EXECUTORS (applyInPandas over shard groups); the driver
never holds or builds the bit array.

Write path (delta generations).  Each ``add_positions_df`` call packs
ONLY its own keys' bits into a new generation directory
(``gen-NNNNNN``) — O(delta keys · touched shards) work and bytes, NOT
O(m): at the 10^10 sizing (2^38 bits = 32 GiB packed) a round that
adds few keys writes a few shard-rows, not a 32 GiB rewrite.  Readers
OR all generations' rows per shard (bloom bits are a join-semilattice,
so the fold is order-free and crash-replay-idempotent); when the
generation count passes ``COMPACT_GENS`` the table is folded back to
one generation (amortized O(m)/COMPACT_GENS per round, and the
compacted dir is written BEFORE the stale ones are removed, so a
crash anywhere leaves a superset of the bits — false positives only).

Probe paths:

- m/8 <= broadcast_cap_bytes: the packed shards (sum = m/8 bytes) are
  broadcast and probed in a vectorized UDF — zero shuffle on the
  candidate side (the right trade below the cap);
- m/8  > broadcast_cap_bytes: partition-local probe — candidates
  cogroup with the shard table on shard id, so each task holds only
  its shards' bits.  At 10^10 keys (m = 2^38 bits, 32 GiB packed —
  far beyond any broadcast) this is the only residency that works:
  the shard count scales with m (shards_for) so each shard stays
  ~1 MiB packed (32768 shards at 2^38), co-partitioned with the
  anti-join that follows.

Both paths produce identical decisions (property-tested), and
no-bloom equals bloom end-to-end (the exact join is authoritative).

Crash safety: the shard table is updated inside the round's commit
pool BEFORE the round-done marker, so a replayed round re-ORs the
same positions (idempotent); a bloom that is AHEAD of the seen table
(crash after bloom write) only adds false positives, which the exact
join resolves.  A missing/corrupt shard table rebuilds from the seen
table on resume.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["BloomSeen", "position_cols", "bloom_m_for"]

K = 4  # hash probes per key
BITS_PER_KEY = 16  # m/n target -> FP ~= 0.24% at K=4
M_MIN = 1 << 20
SHARD_BITS_TARGET = 1 << 23  # ~1 MiB packed per shard
COMPACT_GENS = 8  # fold delta generations back to one past this count


def bloom_m_for(n_keys: int) -> int:
    """Power-of-two m for a target of BITS_PER_KEY bits per key.
    10^10 keys -> 2^38 bits (32 GiB packed across shards)."""
    need = max(M_MIN, n_keys * BITS_PER_KEY)
    return 1 << (need - 1).bit_length()


def shards_for(m: int) -> int:
    """Shard count scaled with m so per-shard bitmaps stay ~1 MiB
    packed regardless of filter size (2^38 bits -> 32768 shards);
    floor of 64 keeps small filters parallel."""
    return max(64, m // SHARD_BITS_TARGET)


def _salted_slice(url_hash_col: str, salt: str, n_hex: int) -> F.Column:
    """conv(substring(md5(url_hash || '|salt'), 1, n_hex), 16, 10) —
    pure Catalyst, identical wherever it runs."""
    h = F.md5(F.encode(F.concat(F.col(url_hash_col), F.lit(f"|{salt}")), "utf-8"))
    return F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long")


def position_cols(url_hash_col: str, m: int, n_shards: int) -> list[F.Column]:
    """[shard, local position 0..K-1] for a key.  Local positions use
    60-bit salted slices mod shard_size, so any shard_size up to 2^60
    is uniform — no width cap on m."""
    shard_size = m // n_shards
    cols = [F.pmod(_salted_slice(url_hash_col, "s", 8), F.lit(n_shards)).alias("_bshard")]
    cols += [
        F.pmod(_salted_slice(url_hash_col, str(i), 15), F.lit(shard_size)).alias(f"_bp{i}")
        for i in range(K)
    ]
    return cols


_POS_NAMES = ["_bshard"] + [f"_bp{i}" for i in range(K)]


class BloomSeen:
    """Sharded, executor-resident bloom over the seen table."""

    def __init__(
        self,
        spark,
        path: str,
        m_bits: int = M_MIN,
        n_shards: int | None = None,
        broadcast_cap_bytes: int = 1 << 26,
    ):
        self.spark = spark
        self.path = path  # parquet dir: (shard int, bits binary) + _meta.json
        self.n_shards = n_shards if n_shards is not None else shards_for(m_bits)
        self.broadcast_cap_bytes = broadcast_cap_bytes
        self.m = m_bits
        self.n_keys = 0
        self._bc = None
        self._load_meta()  # persisted layout (m, n_shards) wins

    # -- persistence -------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _load_meta(self) -> None:
        if os.path.isfile(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.m = int(meta["m"])
            self.n_keys = int(meta["n_keys"])
            # n_shards defines the hash layout: an instance opened over
            # persisted shards MUST use the layout they were built with
            # (probing with a different shard count reads wrong bits)
            self.n_shards = int(meta["n_shards"])

    def _write_meta(self) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"m": self.m, "n_keys": self.n_keys, "n_shards": self.n_shards}, f)
        os.replace(tmp, self._meta_path)

    def _gen_dirs(self) -> list[str]:
        """Generation directories, oldest first.  Readers OR every
        generation's rows per shard (order-free semilattice fold)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("gen-") and os.path.isdir(os.path.join(self.path, d))
        )

    def exists(self) -> bool:
        return os.path.isfile(self._meta_path) and bool(self._gen_dirs())

    def _shards_df(self) -> DataFrame | None:
        gens = self._gen_dirs()
        if not os.path.isfile(self._meta_path) or not gens:
            return None
        return self.spark.read.schema("shard int, bits binary, n_new long").parquet(
            *gens
        )

    # -- build / update (executor-side) -------------------------------------

    def add_positions_df(self, df: DataFrame, url_hash_col: str = "url_hash") -> None:
        """OR the rows' bits into the shard table by writing a DELTA
        generation: one Spark job packing ONLY this call's keys
        (applyInPandas per touched shard) — O(delta), never the O(m)
        full-table rewrite.  Idempotent on replay (a crashed round's
        re-run writes a second delta with the same bits; OR absorbs
        it, and compaction folds the duplicate away)."""
        m, n_shards = self.m, self.n_shards
        shard_size = m // n_shards

        pos = df.select(*position_cols(url_hash_col, m, n_shards))
        long_pos = pos.select(
            F.col("_bshard").cast("int").alias("shard"),
            F.explode(F.array(*[F.col(f"_bp{i}") for i in range(K)])).alias("p"),
        )
        nbytes = shard_size // 8

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            acc = np.zeros(nbytes, dtype=np.uint8)
            p = pdf["p"].to_numpy(dtype=np.int64)
            # scatter-OR on the packed array directly (MSB-first):
            # O(len(p)) work and no shard_size-sized bool buffer
            np.bitwise_or.at(acc, p >> 3, (1 << (7 - (p & 7))).astype(np.uint8))
            # new-key count rides in the output so sizing needs no
            # extra count() action (K positions per key)
            return pd.DataFrame(
                {"shard": [shard], "bits": [acc.tobytes()], "n_new": [len(p) // K]}
            )

        delta = long_pos.groupBy("shard").applyInPandas(
            pack, "shard int, bits binary, n_new long"
        )
        gen_dir = self._write_gen(delta)
        import pyarrow.parquet as pq

        n_added = 0
        for f in os.listdir(gen_dir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(gen_dir, f), columns=["n_new"])
                n_added += sum(t.column("n_new").to_pylist())
        self.n_keys += int(n_added)
        self._write_meta()
        self._bc = None  # invalidate broadcast
        if len(self._gen_dirs()) > COMPACT_GENS:
            self._compact()

    def _write_gen(self, shards_df: DataFrame) -> str:
        """Write (shard, bits, n_new) rows as the next generation dir
        (tmp write + atomic rename, driver only renames)."""
        os.makedirs(self.path, exist_ok=True)
        gens = self._gen_dirs()
        nxt = int(os.path.basename(gens[-1]).split("-")[1]) + 1 if gens else 0
        tmp = os.path.join(self.path, f".tmp-gen-{nxt:06d}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        shards_df.write.mode("overwrite").parquet(tmp)
        final = os.path.join(self.path, f"gen-{nxt:06d}")
        os.replace(tmp, final)
        return final

    def _compact(self) -> None:
        """Fold every generation into one (executor-side OR per shard).
        The compacted generation is written BEFORE the stale ones are
        removed: a crash in between leaves duplicate bits, which OR
        makes harmless (the next compaction removes them)."""
        old_gens = self._gen_dirs()
        rows = self._shards_df()
        if rows is None:
            return
        nbytes = (self.m // self.n_shards) // 8

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            acc = np.zeros(nbytes, dtype=np.uint8)
            for b in pdf["bits"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
            return pd.DataFrame(
                {"shard": [shard], "bits": [acc.tobytes()],
                 "n_new": [int(pdf["n_new"].sum())]}
            )

        folded = rows.groupBy("shard").applyInPandas(
            fold, "shard int, bits binary, n_new long"
        )
        self._write_gen(folded)
        for g in old_gens:
            shutil.rmtree(g)
        self._bc = None

    def sync_n_keys(self, n_keys: int) -> None:
        """Clamp the sizing counter to the authoritative seen-table
        count.  The incremental n_new accounting overcounts under
        crash replays and duplicate keys (harmless direction — rebuilds
        fire early, never late); callers that know |seen| exactly (a
        parquet-footer read) pin it here."""
        self.n_keys = int(n_keys)
        self._write_meta()

    def needs_rebuild(self) -> bool:
        return self.n_keys * BITS_PER_KEY > self.m

    def rebuild(self, seen_df: DataFrame | None, n_keys: int) -> None:
        """Resize to fit ``n_keys`` and rebuild from the authoritative
        seen table (one aggregation job).  The shard count re-scales
        with m so per-shard bitmaps stay bounded (~1 MiB packed)."""
        self.m = bloom_m_for(n_keys)
        self.n_shards = shards_for(self.m)
        self.n_keys = 0
        self._bc = None
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)
        if seen_df is not None:
            self.add_positions_df(seen_df)
        else:
            self._write_meta()

    # -- probe ---------------------------------------------------------------

    def _broadcast(self):
        """Packed shards assembled into one m/8-byte array and
        broadcast — only taken when m/8 <= broadcast_cap_bytes."""
        if self._bc is None:
            shard_size = self.m // self.n_shards
            packed = np.zeros(self.m // 8, dtype=np.uint8)
            if self.exists():
                import pyarrow.parquet as pq

                for gen in self._gen_dirs():
                    t = pq.read_table(gen, columns=["shard", "bits"])
                    for shard, bits in zip(
                        t.column("shard").to_pylist(), t.column("bits").to_pylist()
                    ):
                        off = shard * (shard_size // 8)
                        packed[off : off + len(bits)] |= np.frombuffer(
                            bits, dtype=np.uint8
                        )
            self._bc = self.spark.sparkContext.broadcast(packed)
        return self._bc

    def prefilter(self, cand: DataFrame, url_hash_col: str = "url_hash") -> DataFrame:
        """Adds boolean ``_maybe_seen``; False rows are DEFINITELY new."""
        if self.m // 8 <= self.broadcast_cap_bytes:
            return self._prefilter_broadcast(cand, url_hash_col)
        return self._prefilter_cogrouped(cand, url_hash_col)

    def _prefilter_broadcast(self, cand: DataFrame, url_hash_col: str) -> DataFrame:
        bc = self._broadcast()
        shard_bytes = (self.m // self.n_shards) // 8
        with_pos = cand.select("*", *position_cols(url_hash_col, self.m, self.n_shards))

        @F.pandas_udf("boolean")
        def probe(*cols: pd.Series) -> pd.Series:
            packed = bc.value  # np.packbits layout: MSB-first within byte
            shard = cols[0].to_numpy(dtype=np.int64)
            base = shard * shard_bytes * 8
            out = np.ones(len(shard), dtype=bool)
            for c in cols[1:]:
                pos = base + c.to_numpy(dtype=np.int64)
                byte = packed[pos >> 3]
                out &= ((byte >> (7 - (pos & 7))) & 1).astype(bool)
            return pd.Series(out)

        return with_pos.withColumn("_maybe_seen", probe(*_POS_NAMES)).drop(*_POS_NAMES)

    def _prefilter_cogrouped(self, cand: DataFrame, url_hash_col: str) -> DataFrame:
        """Partition-local probe: candidates cogroup with the shard
        table on shard id — each task holds only its shards' bits, the
        driver none.  The scale path for m beyond broadcast."""
        with_pos = cand.select("*", *position_cols(url_hash_col, self.m, self.n_shards))
        shards = self._shards_df()
        if shards is None:
            shards = self.spark.createDataFrame([], "shard int, bits binary")
        out_schema = T.StructType(
            [f for f in with_pos.schema.fields if f.name not in _POS_NAMES[1:]]
            + [T.StructField("_maybe_seen", T.BooleanType())]
        )
        keep = [f.name for f in with_pos.schema.fields if f.name not in _POS_NAMES[1:]]

        def probe(cand_pdf: pd.DataFrame, bits_pdf: pd.DataFrame) -> pd.DataFrame:
            if bits_pdf.empty:
                maybe = np.zeros(len(cand_pdf), dtype=bool)
            else:
                # OR the shard's rows across delta generations (the
                # cogroup delivers one row per generation that touched
                # this shard)
                packed = np.zeros(len(bits_pdf["bits"].iloc[0]), dtype=np.uint8)
                for b in bits_pdf["bits"]:
                    packed |= np.frombuffer(b, dtype=np.uint8)
                maybe = np.ones(len(cand_pdf), dtype=bool)
                for i in range(K):
                    pos = cand_pdf[f"_bp{i}"].to_numpy(dtype=np.int64)
                    byte = packed[pos >> 3]
                    maybe &= ((byte >> (7 - (pos & 7))) & 1).astype(bool)
            out = cand_pdf[keep].copy()
            out["_maybe_seen"] = maybe
            return out

        return (
            with_pos.groupby("_bshard")
            .cogroup(shards.groupby("shard"))
            .applyInPandas(probe, out_schema)
            .drop("_bshard")
        )


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
