"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED (image/audio codecs are not in this
container): ``decode_image_meta`` produces a deterministic fake
derived from the blob bytes, clearly marked, so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures —
is real and tested while the codec is swappable.  In production the
body of ``_fake_decode`` is replaced by PIL/libav calls; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MEDIA_SCHEMA", "decode_image_meta", "frame_sample", "attach_blob"]

# canonical media-row schema: opaque payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, mime string, meta_json string"
)

_DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, "
    "width int, height int, n_channels int"
)


def _fake_decode(digest: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decode (no codec in this image).
    Derives plausible (width, height, channels) from the content hash
    so tests are stable; replace with a real decoder in production."""
    return 64 + digest[0] % 192, 64 + digest[1] % 192, 1 + digest[2] % 4


def decode_image_meta(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary in, typed metadata out.
    Arrow-batched; per-partition iterator keeps memory bounded even
    for multi-MB blobs.  The blob is hashed ONCE per row — the sha
    column and the fake dims both derive from that digest."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, shas, dims = [], [], []
            for b in pdf["blob"]:
                if b is None:
                    n_bytes.append(0)
                    shas.append(None)
                    dims.append((0, 0, 0))
                    continue
                h = hashlib.sha256(bytes(b))
                n_bytes.append(len(b))
                shas.append(h.hexdigest())
                dims.append(_fake_decode(h.digest()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha": shas,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(op, schema=_DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-sampling plumbing for video-kind rows: emits
    (media_id, frame_idx, frame_sha) for sampled frame indices.  The
    frame *extraction* is stubbed (frame bytes = slice hash); the
    explode/partition shape is the real thing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                b = bytes(blob)
                n_frames = max(1, len(b) // 64)  # STUB: 64 bytes ~ one frame
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(b[i * 64 : (i + 1) * 64]).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return media.where(F.col("kind") == "video").mapInPandas(
        op, schema="media_id long, frame_idx int, frame_sha string"
    )


def attach_blob(df: DataFrame, text_col: str, id_col: str, kind: str = "text") -> DataFrame:
    """Turn any text table into MEDIA_SCHEMA rows (used by tests and
    the blob-stats probe): payload = utf-8 bytes, metadata typed."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.lit("text/plain; charset=utf-8").alias("mime"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta_json"),
    )
