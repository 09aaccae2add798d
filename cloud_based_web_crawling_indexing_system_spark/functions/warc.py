"""WARC (Web ARChive, ISO 28500) record codec — the container format
of Common-Crawl-style page archives, the canonical ingestion format
for webtext training pipelines (the north-star corpus is
"Common-Crawl-style pages").

From-scratch, stdlib-only, same posture as multimodal.py's container
demuxers:

- the ENCODER writes spec-shaped WARC/1.0 files — a `warcinfo`
  record followed by `response` records, each carrying a full
  HTTP/1.1 response block (status line, headers, body) with correct
  dual Content-Lengths and CRLF discipline — optionally with
  per-record gzip members concatenated back-to-back, which is
  exactly how Common Crawl ships .warc.gz (each record its own gzip
  member so readers can split on member boundaries);
- the DECODER walks records by the declared Content-Length (never by
  scanning for separators, which embedded payload bytes could fake),
  validates version line, header grammar, the record-terminating
  CRLF CRLF, and the HTTP sub-block, and REFUSES rather than guesses
  on truncation, bad lengths, or malformed headers: parsing stops at
  the first unrecoverable corruption and every successfully parsed
  record is flagged ``parsed=True`` — the q61 probe's
  n_parsed == n_records is the no-silent-fallback gate.

Scale shape: a WARC file is one opaque binary cell; encode and
decode are narrow Arrow-batched stages (mapInPandas) with no
shuffle — at 100 TB the files arrive pre-split (one blob per source
object or per gzip member range) and the record walk is per-row
work, exactly like frame_sample over video containers.
"""

from __future__ import annotations

import gzip
import io
import zlib

__all__ = [
    "encode_warc", "decode_warc", "warc_records", "WARC_SCHEMA",
    "write_warc_archive",
]

_CRLF = b"\r\n"
_DATE = "2024-01-01T00:00:00Z"  # fixed: archives are reproducible


def _record(rec_type: str, headers: list[tuple[str, str]], block: bytes) -> bytes:
    for _, v in headers:
        if "\r" in v or "\n" in v:
            # a CR/LF inside a header value (e.g. a hostile target
            # URI) would let payload forge record headers
            raise ValueError(f"CR/LF in WARC header value: {v!r}")
    out = [b"WARC/1.0", f"WARC-Type: {rec_type}".encode()]
    out += [f"{k}: {v}".encode() for k, v in headers]
    out.append(f"Content-Length: {len(block)}".encode())
    return _CRLF.join(out) + _CRLF + _CRLF + block + _CRLF + _CRLF


def _http_block(status: int, mime: str, body: bytes) -> bytes:
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def encode_warc(
    responses: list[tuple[str, bytes]],
    per_record_gzip: bool = False,
    mime: str = "text/html",
) -> bytes:
    """One WARC file: a warcinfo record + one response record per
    (url, body) pair.  ``per_record_gzip=True`` wraps EACH record in
    its own gzip member (the .warc.gz convention)."""
    info_fields = b"software: from-scratch-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
    recs = [
        _record(
            "warcinfo",
            [("WARC-Date", _DATE),
             ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
             ("Content-Type", "application/warc-fields")],
            info_fields,
        )
    ]
    for i, (url, body) in enumerate(responses):
        recs.append(
            _record(
                "response",
                [("WARC-Date", _DATE),
                 ("WARC-Record-ID",
                  f"<urn:uuid:00000000-0000-0000-0000-{i + 1:012d}>"),
                 ("WARC-Target-URI", url),
                 ("Content-Type", "application/http; msgtype=response")],
                _http_block(200, mime, body),
            )
        )
    if not per_record_gzip:
        return b"".join(recs)
    out = io.BytesIO()
    for rec in recs:
        # mtime=0: byte-reproducible members
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


def _gunzip_members(blob: bytes) -> bytes | None:
    """Concatenated-gzip-member decompression (the .warc.gz layout);
    None on any corrupt member."""
    out, rest = [], blob
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            return None
        if not d.eof:  # truncated member
            return None
        rest = d.unused_data
    return b"".join(out)


def _parse_headers(raw: bytes) -> dict | None:
    headers: dict = {}
    for line in raw.split(_CRLF):
        if not line:
            continue
        if b":" not in line:
            return None  # malformed header line: refuse
        k, v = line.split(b":", 1)
        headers[k.strip().decode("ascii", "replace").lower()] = (
            v.strip().decode("ascii", "replace")
        )
    return headers


def decode_warc(blob: bytes) -> list[dict]:
    """Parse every record out of a WARC file (plain or per-record
    gzip).  Returns dicts with rec_idx/rec_type/url/http_status/mime/
    body/parsed; stops at the first unrecoverable corruption (the
    remaining bytes yield NO rows — absence, not guesses)."""
    if blob[:2] == b"\x1f\x8b":
        plain = _gunzip_members(blob)
        if plain is None:
            return []
        blob = plain
    out: list[dict] = []
    pos, idx = 0, 0
    n = len(blob)
    while pos < n:
        ver_end = blob.find(_CRLF, pos)
        if ver_end < 0 or not blob[pos:ver_end].startswith(b"WARC/1."):
            break
        hdr_end = blob.find(_CRLF + _CRLF, ver_end)
        if hdr_end < 0:
            break
        headers = _parse_headers(blob[ver_end + 2:hdr_end])
        if headers is None or "content-length" not in headers:
            break
        try:
            clen = int(headers["content-length"])
        except ValueError:
            break
        block_start = hdr_end + 4
        block_end = block_start + clen
        # the record MUST terminate with CRLF CRLF after the block
        if clen < 0 or block_end + 4 > n or blob[block_end:block_end + 4] != _CRLF * 2:
            break
        block = blob[block_start:block_end]
        rec = {
            "rec_idx": idx,
            "rec_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "http_status": None,
            "mime": None,
            "body": None,
            "parsed": False,
        }
        if rec["rec_type"] == "response":
            parsed = _parse_http(block)
            if parsed is not None:
                rec.update(parsed)
                rec["parsed"] = True
        else:
            rec["parsed"] = True  # non-response record, fully walked
        out.append(rec)
        idx += 1
        pos = block_end + 4
    return out


def _parse_http(block: bytes) -> dict | None:
    line_end = block.find(_CRLF)
    if line_end < 0 or not block[:line_end].startswith(b"HTTP/1."):
        return None
    parts = block[:line_end].split()
    if len(parts) < 2 or not parts[1].isdigit():
        return None
    hdr_end = block.find(_CRLF + _CRLF, line_end)
    if hdr_end < 0:
        return None
    headers = _parse_headers(block[line_end + 2:hdr_end])
    if headers is None:
        return None
    body = block[hdr_end + 4:]
    if "content-length" in headers:
        try:
            blen = int(headers["content-length"])
        except ValueError:
            return None
        if blen != len(body):  # declared length must match: refuse
            return None
    return {
        "http_status": int(parts[1]),
        "mime": headers.get("content-type"),
        "body": body,
    }


WARC_SCHEMA = (
    "warc_id long, rec_idx int, rec_type string, url string, "
    "http_status int, mime string, body binary, parsed boolean"
)


def warc_records(df, id_col: str = "warc_id", blob_col: str = "blob"):
    """DataFrame of per-record rows from a DataFrame of WARC blobs —
    a narrow Arrow-batched map (no shuffle), one row per record."""
    import pandas as pd

    cols = [c.strip().split(" ")[0] for c in WARC_SCHEMA.split(",")]

    def walk(batches):
        for pdf in batches:
            rows = []
            for wid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    # refuse-don't-guess, like the other codecs: a NULL
                    # blob yields no records instead of a task-killing
                    # TypeError (advisor r6)
                    continue
                for rec in decode_warc(bytes(blob)):
                    rows.append((int(wid), rec["rec_idx"], rec["rec_type"],
                                 rec["url"], rec["http_status"], rec["mime"],
                                 rec["body"], rec["parsed"]))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(walk, schema=WARC_SCHEMA)


def write_warc_archive(
    df,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "html",
    per_record_gzip: bool = True,
) -> list[dict]:
    """The raw-page ARCHIVE SINK (reference S5, upgraded from
    "the pages table is the archive" to a real exporter): write a
    (url, body) DataFrame as one ``part-NNNNN.warc.gz`` per Spark
    partition under ``out_dir``, plus a ``manifest.json`` + _SUCCESS
    marker.  Returns the manifest rows.

    Executor-side file writes are AT-LEAST-ONCE (task retries re-run
    the write), so the sink is made idempotent the standard way:
    rows are sorted by url within the partition (deterministic bytes
    for a deterministic partitioning), the filename is derived from
    the partition id alone, and the write goes to a tmp path +
    os.replace (atomic on POSIX) — a retried task overwrites with
    identical bytes instead of duplicating records.  The manifest is
    driver-written from the per-task stat rows (tiny), and _SUCCESS
    commits the archive only after every task reported.

    Deployment note (advisor r6): the executor-side open/os.replace
    into ``out_dir`` assumes executors share the driver's filesystem —
    true in local mode and on shared mounts; a cluster deploy over
    object storage would route through a task-attempt tmp dir plus a
    driver-side commit instead."""
    import json
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    gz = per_record_gzip

    def dump(batches):
        rows, pid = [], None
        for pdf in batches:
            for u, b in zip(pdf[url_col], pdf[body_col]):
                rows.append((str(u), bytes(b) if b is not None else b""))
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # total order: (url, body) — two rows with the same url but
        # different bodies would otherwise sort nondeterministically
        # across retries and break the identical-bytes claim
        # (advisor r6)
        rows.sort(key=lambda r: (r[0], r[1]))
        name = f"part-{pid:05d}.warc" + (".gz" if gz else "")
        blob = encode_warc(rows, per_record_gzip=gz)
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame(
            [(name, len(rows), len(blob))],
            columns=["file", "n_records", "n_bytes"],
        )

    manifest = [
        r.asDict()
        for r in df.select(F.col(url_col).alias(url_col),
                           F.col(body_col).alias(body_col))
        .mapInPandas(dump, schema="file string, n_records long, n_bytes long")
        .collect()
    ]
    manifest.sort(key=lambda r: r["file"])
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest
