"""WARC (Web ARChive, ISO 28500) ingest — the raw-crawl format a
large-scale training-data pipeline starts from (Common Crawl publishes
its corpus as ~1 GB ``.warc.gz`` segment files).

Engine extra (no reference counterpart — the reference's nearest
surface is BinaryFileFormat's archive walk,
``core/.../io/binary/BinaryFileFormat.scala``): the reader composes
Spark's built-in ``binaryFile`` source (one row per archive file —
distribution, listing, and pushed ``pathGlobFilter`` all come from the
JVM source) with an Arrow-batched ``mapInPandas`` record parser, so
adding a format costs a pure-python parser, never a DataSource
implementation.

Scale shape, sized to the real corpus:

- **Partition = segment file.** Common Crawl's ~1 GB-gzip segments are
  the unit of parallelism (a 100 TB crawl is ~100k files → ~100k
  tasks). WARC's per-RECORD gzip members mean a segment cannot be
  split mid-file anyway — matching the upstream processing convention
  (one worker per segment).
- **Memory bound per task** is one decompressed segment (~4-5 GB for
  Common Crawl's 1 GB members) plus the emitted Arrow batches; size
  executor memory accordingly, exactly like any whole-archive reader
  (the zip walk has the same contract).
- **Row-level filters do not reach the archive** (the payload is
  opaque to parquet-style pushdown) — filter as early as possible
  AFTER the parse, and use ``recordTypes``/``httpOnly`` so non-content
  records (warcinfo, request, metadata) never materialize as rows.

Malformed input follows the PatchedImageFileFormat philosophy
(fault-tolerant decode): a segment whose byte stream stops parsing
yields the records up to the corruption point rather than failing the
task — a 100k-file crawl always contains a few truncated members.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — WARC.gz
    files are CONCATENATED per-record gzip members, which
    ``gzip.GzipFile`` reads end-to-end. A truncated final member
    yields the bytes decoded so far (fault-tolerant contract)."""
    import zlib

    try:
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
            return g.read()
    except (OSError, EOFError, zlib.error):
        # salvage: decode member-by-member until the corruption
        out, pos = [], 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            try:
                out.append(d.decompress(data[pos:]))
            except zlib.error:
                break
            if not d.unused_data:
                break
            pos = len(data) - len(d.unused_data)
        return b"".join(out)


def _iter_warc_records(data: bytes):
    """Yield ``(headers_dict, block_bytes)`` per WARC record. A record
    is ``WARC/1.x CRLF headers CRLFCRLF <Content-Length bytes>
    CRLFCRLF``; parsing stops (never raises) at the first malformed
    boundary — the salvage contract for truncated segments."""
    pos, n = 0, len(data)
    while pos < n:
        while data[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            return
        header_block = data[pos:end_hdr].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            return
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            return
        body_start = end_hdr + 4
        if body_start + clen > n:
            return  # truncated final record: drop it, keep the rest
        yield headers, data[body_start:body_start + clen]
        pos = body_start + clen


def _split_http(block: bytes):
    """(status:int|None, payload:bytes) — peel the HTTP envelope off a
    response record's block; non-HTTP blocks pass through whole."""
    if not block.startswith(b"HTTP/"):
        return None, block
    end = block.find(b"\r\n\r\n")
    if end < 0:
        return None, block
    status_line = block[:block.find(b"\r\n")].decode("latin-1",
                                                     "replace")
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, block[end + 4:]


def read_warc(spark: SparkSession, path: str,
              recordTypes: tuple = ("response",),
              httpOnly: bool = True,
              payloadAsText: bool = False,
              recursive: bool = True,
              pathGlobFilter: str | None = None) -> DataFrame:
    """Read WARC / WARC.gz archives into one row per record.

    Columns: ``warc_file, record_id, warc_type, target_uri, warc_date,
    content_type, http_status, payload`` (+ ``text`` when
    ``payloadAsText`` — payload decoded utf-8-with-replacement, the
    curation entry point). ``recordTypes`` keeps only the named
    WARC-Type values (``None`` keeps all); ``httpOnly`` additionally
    peels the HTTP envelope off response records so ``payload`` is the
    body, with the status code surfaced.

    Distribution comes from the built-in ``binaryFile`` source (one
    task per segment file, recursive listing, glob pushdown); parsing
    is an Arrow-batched ``mapInPandas`` — see the module docstring for
    the 100 TB sizing contract.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    keep = set(recordTypes) if recordTypes is not None else None
    schema = WARC_SCHEMA
    if payloadAsText:
        schema = T.StructType(list(WARC_SCHEMA.fields) + [
            T.StructField("text", T.StringType(), True)])
    cols = [f.name for f in schema.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data)
                for h, block in _iter_warc_records(data):
                    wtype = h.get("warc-type")
                    if keep is not None and wtype not in keep:
                        continue
                    status, payload = (None, block)
                    if httpOnly:
                        status, payload = _split_http(block)
                    row = [fpath, h.get("warc-record-id"), wtype,
                           h.get("warc-target-uri"),
                           h.get("warc-date"),
                           h.get("content-type"), status, payload]
                    if payloadAsText:
                        row.append(payload.decode("utf-8", "replace"))
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", str(recursive).lower()))
    if pathGlobFilter:
        reader = reader.option("pathGlobFilter", pathGlobFilter)
    return (reader.load(path)
            .select(F.col("path"), F.col("content"))
            .mapInPandas(parse, schema))


def write_warc(df: DataFrame, out_path: str,
               uriCol: str = "target_uri",
               payloadCol: str = "payload",
               dateCol: str | None = None,
               gzipMembers: bool = True) -> None:
    """Write rows back out as WARC.gz response records, one archive
    file per partition (``part-<n>.warc.gz`` under ``out_path``) —
    the round-trip sink for re-publishing a curated subset in the
    crawl's native format. Per-record gzip members (the Common Crawl
    convention) keep the output streamable by standard WARC tooling.
    Executors must share the target filesystem — the same contract as
    every file sink here."""
    import os
    import uuid

    def _record(uri: str, date: str | None, payload: bytes) -> bytes:
        rid = f"<urn:uuid:{uuid.uuid4()}>"
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Record-ID: {rid}\r\n"
               + (f"WARC-Date: {date}\r\n" if date else "")
               + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
               + f"Content-Length: {len(payload)}\r\n\r\n")
        return hdr.encode("utf-8") + payload + b"\r\n\r\n"

    date_col = dateCol

    def _write(rows) -> None:
        from pyspark import TaskContext

        idx = TaskContext.get().partitionId()
        os.makedirs(out_path, exist_ok=True)
        fname = os.path.join(out_path,
                             f"part-{idx:05d}.warc"
                             + (".gz" if gzipMembers else ""))
        wrote = False
        with open(fname, "wb") as f:
            for r in rows:
                wrote = True
                payload = bytes(r[payloadCol])
                rec = _record(r[uriCol],
                              r[date_col] if date_col else None,
                              payload)
                f.write(gzip.compress(rec) if gzipMembers else rec)
        if not wrote:
            os.remove(fname)  # no empty archives

    df.foreachPartition(_write)
