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
- **Memory bound per task** is the COMPRESSED segment (the
  ``binaryFile`` content column, ~1 GB) plus ONE decompressed gzip
  member (= one record under the Common Crawl convention) plus one
  bounded Arrow batch (``_ROWS_PER_BATCH`` records) — the per-record
  members are decoded one at a time by a streaming ``decompressobj``
  loop, never the whole ~4-5 GB segment at once, so 32 concurrent
  tasks fit a 128 GiB executor with room to spare.
- **Row-level filters do not reach the archive** (the payload is
  opaque to parquet-style pushdown) — filter as early as possible
  AFTER the parse, and use ``recordTypes``/``httpOnly`` so non-content
  records (warcinfo, request, metadata) never materialize as rows.
- **Segment-size contract**: the ``binaryFile`` source delivers each
  file as ONE byte array, hard-capped at 2 GiB − 1 (a JVM array), and
  each task holds its segment's full compressed bytes — so keep
  segments in the ~1 GB band the upstream convention already uses
  (Common Crawl's own segmenter targets this). ``read_warc`` fails
  FAST at plan time, naming the offending files with split advice,
  when the input contains a segment the source would otherwise reject
  at task time with an opaque error; for streams, the same check runs
  over the files present at start, and a LATER-arriving oversized
  segment fails its micro-batch with Spark's own binaryFile error
  (re-split the segment with ``split``/``warcio`` and re-drop it).

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

# Records per emitted Arrow batch — bounds the pandas frame the parser
# holds alongside the current member.
_ROWS_PER_BATCH = 256

# decompressobj feed size: bounds the bytes `unused_data` can copy at
# a member boundary to one chunk instead of the rest of the segment.
_GZ_CHUNK = 1 << 20


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield one DECOMPRESSED gzip member at a time from a
    concatenated multi-member stream (the ``.warc.gz`` convention:
    one member per record) without ever materializing the whole
    decompressed segment — peak extra memory is max(member) + one
    feed chunk. A truncated or corrupt tail yields the bytes decoded
    so far and stops (fault-tolerant contract)."""
    import zlib

    view = memoryview(data)
    n = len(view)
    pos = 0
    d = zlib.decompressobj(wbits=31)
    out = bytearray()
    while pos < n:
        chunk = view[pos:pos + _GZ_CHUNK]
        pos += len(chunk)
        try:
            out += d.decompress(chunk)
        except zlib.error:
            break  # corrupt member: salvage what decoded, stop
        while d.eof:
            yield bytes(out)
            out = bytearray()
            rest = d.unused_data  # ≤ one chunk — cheap copy
            d = zlib.decompressobj(wbits=31)
            if not rest:
                break
            try:
                out += d.decompress(rest)
            except zlib.error:
                return  # garbage after a member boundary
    if out:
        yield bytes(out)  # truncated final member: partial salvage


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream to one bytes
    object. Convenience for small inputs and tests — ``read_warc``
    itself uses the streaming ``_iter_gzip_members`` loop so a 4-5 GB
    segment is never materialized."""
    return b"".join(_iter_gzip_members(data))


def _iter_warc_stream(members: Iterator[bytes]):
    """Yield ``(headers_dict, block_bytes)`` per WARC record from an
    iterator of byte chunks (decompressed gzip members, or one whole
    plain-``.warc`` buffer). Records may span chunk boundaries — a
    bounded carry buffer holds at most one partial record. Parsing
    gives up (never raises) at the first malformed record boundary,
    after which remaining chunks are drained without accumulating —
    the same output as parsing the concatenated stream in one pass.
    """
    carry = bytearray()
    for m in members:
        carry += m
        pos, n = 0, len(carry)
        while True:
            while carry[pos:pos + 2] in (b"\r\n", b"\n\n"):
                pos += 2
            if pos >= n:
                break  # consumed everything so far
            # a record must start 'WARC/'; checking the prefix before
            # waiting for the full header keeps the carry bounded on
            # garbage input (give-up is sticky, matching whole-buffer
            # parse output)
            probe = carry[pos:pos + 5]
            if len(probe) == 5 and not bytes(probe).startswith(b"WARC/"):
                return
            end_hdr = carry.find(b"\r\n\r\n", pos)
            if end_hdr < 0:
                break  # header incomplete: wait for the next chunk
            header_block = carry[pos:end_hdr].decode("utf-8", "replace")
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
                break  # body incomplete: wait for the next chunk
            yield headers, bytes(carry[body_start:body_start + clen])
            pos = body_start + clen
        del carry[:pos]
    # leftover carry after the last chunk = truncated final record:
    # dropped, keeping every complete record before it


def _iter_warc_records(data: bytes):
    """Yield ``(headers_dict, block_bytes)`` per WARC record of one
    in-memory buffer — the whole-buffer view of ``_iter_warc_stream``
    (same parser, same salvage contract)."""
    yield from _iter_warc_stream(iter((data,)))


def _split_http(block: bytes):
    """(status:int|None, payload:bytes) — peel the HTTP envelope off a
    record block; blocks without an HTTP status line pass through
    whole."""
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


_BINARYFILE_MAX = (1 << 31) - 1  # binaryFile content cap (JVM array)


def _refuse_oversized_segments(spark: SparkSession, path: str,
                               recursive: bool,
                               pathGlobFilter: str | None) -> None:
    """Fail FAST (plan time, descriptive) on segments the binaryFile
    source would reject at task time with an opaque "file too big"
    error — the module docstring's segment-size contract. Best-effort:
    a listing that cannot be taken (glob-as-path, remote scheme
    quirks) defers to the source's own error rather than blocking a
    read that would have worked."""
    import fnmatch

    from mmlspark_spark.llm.index_common import _hadoop_fs

    try:
        fs, P = _hadoop_fs(spark, path)
        it = fs.listFiles(P(path), bool(recursive))
        bad = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if pathGlobFilter and not fnmatch.fnmatch(name,
                                                      pathGlobFilter):
                continue
            if st.getLen() > _BINARYFILE_MAX:
                bad.append(f"{st.getPath()} "
                           f"({st.getLen() / 2**30:.1f} GiB)")
                if len(bad) >= 5:  # enough to act on
                    break
    except Exception:
        return
    if bad:
        raise ValueError(
            "WARC segment(s) exceed the 2 GiB binaryFile cap (one "
            "byte array per file): " + "; ".join(bad) + " — re-split "
            "oversized segments to the ~1 GB upstream convention "
            "(each task also holds its segment's full compressed "
            "bytes, so smaller segments bound executor memory too)")


def _warc_parser(recordTypes, httpOnly: bool, payloadAsText: bool):
    """Build the (schema, Arrow mapInPandas parser) pair shared by the
    batch and streaming readers — one parser, two sources."""
    import pandas as pd

    keep = set(recordTypes) if recordTypes is not None else None
    schema = WARC_SCHEMA
    if payloadAsText:
        schema = T.StructType(list(WARC_SCHEMA.fields) + [
            T.StructField("text", T.StringType(), True)])
    cols = [f.name for f in schema.fields]

    def parse(batches) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    records = _iter_warc_stream(_iter_gzip_members(data))
                else:
                    records = _iter_warc_records(data)
                for h, block in records:
                    wtype = h.get("warc-type")
                    if keep is not None and wtype not in keep:
                        continue
                    status, payload = (None, block)
                    if httpOnly and "application/http" in (
                            h.get("content-type") or ""):
                        status, payload = _split_http(block)
                    row = [fpath, h.get("warc-record-id"), wtype,
                           h.get("warc-target-uri"),
                           h.get("warc-date"),
                           h.get("content-type"), status, payload]
                    if payloadAsText:
                        row.append(payload.decode("utf-8", "replace"))
                    rows.append(row)
                    if len(rows) >= _ROWS_PER_BATCH:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        yield pd.DataFrame(rows, columns=cols)

    return schema, parse


def read_warc(spark: SparkSession, path: str,
              recordTypes: tuple = ("response", "resource",
                                    "conversion"),
              httpOnly: bool = True,
              payloadAsText: bool = False,
              recursive: bool = True,
              pathGlobFilter: str | None = None) -> DataFrame:
    """Read WARC / WARC.gz archives into one row per record.

    Columns: ``warc_file, record_id, warc_type, target_uri, warc_date,
    content_type, http_status, payload`` (+ ``text`` when
    ``payloadAsText`` — payload decoded utf-8-with-replacement, the
    curation entry point). ``recordTypes`` keeps only the named
    WARC-Type values (``None`` keeps all) — the default keeps the
    three content-bearing types (``response``, plus ``resource`` /
    ``conversion`` as used by re-published and WET-style archives).
    ``httpOnly`` peels the HTTP envelope off records whose record
    Content-Type declares ``application/http`` (ISO 28500 §6.3) so
    ``payload`` is the body, with the status code surfaced; payloads
    of other content types pass through byte-exact even when they
    happen to start with ``HTTP/``.

    Distribution comes from the built-in ``binaryFile`` source (one
    task per segment file, recursive listing, glob pushdown); parsing
    is an Arrow-batched ``mapInPandas`` that decodes gzip members and
    emits row batches INCREMENTALLY — see the module docstring for
    the 100 TB sizing contract (peak ≈ compressed segment +
    max(record) + one Arrow batch).
    """
    from pyspark.sql import functions as F

    _refuse_oversized_segments(spark, path, recursive, pathGlobFilter)
    schema, parse = _warc_parser(recordTypes, httpOnly, payloadAsText)
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", str(recursive).lower()))
    if pathGlobFilter:
        reader = reader.option("pathGlobFilter", pathGlobFilter)
    return (reader.load(path)
            .select(F.col("path"), F.col("content"))
            .mapInPandas(parse, schema))


def read_warc_stream(spark: SparkSession, path: str,
                     recordTypes: tuple = ("response", "resource",
                                           "conversion"),
                     httpOnly: bool = True,
                     payloadAsText: bool = False,
                     recursive: bool = True,
                     pathGlobFilter: str | None = None,
                     maxFilesPerTrigger: int | None = None) -> DataFrame:
    """STREAMING WARC ingest: the crawl-arrival entry point of the
    curation pipeline. New segment files landing under ``path`` become
    micro-batches of parsed records — compose with
    ``neardup_screen_foreach_batch`` / ``registry_ingest_foreach_batch``
    / ``bm25_ingest_foreach_batch`` downstream for a complete
    crawl-to-index streaming topology::

        recs = read_warc_stream(spark, "/crawl/incoming",
                                payloadAsText=True)
        docs = recs.select(F.xxhash64("record_id").alias("doc_id"),
                           "text")
        docs.writeStream.foreachBatch(
            neardup_screen_foreach_batch(dedup, "/idx/minhash",
                                         "doc_id")).start()

    Built on Spark's file streaming source over the ``binaryFile``
    format (exactly-once file tracking via the stream checkpoint; one
    task per segment; ``maxFilesPerTrigger`` bounds micro-batch size)
    + the SAME Arrow record parser as :func:`read_warc` — identical
    schema, salvage contract, and max(record)-bounded member decode.
    The file source requires an explicit schema: ``binaryFile``'s is
    fixed (path, modificationTime, length, content), declared here.

    Long-running crawl streams at 100 TB scale: the file source's
    seen-files log grows with every segment ever ingested — for a
    months-long stream over a hot landing directory, set the standard
    source maintenance options on the returned reader's stream
    (``option("maxFileAge", "7d")`` bounds the tracked set;
    ``option("cleanSource", "archive")`` + ``sourceArchiveDir`` moves
    ingested segments out of the listing path) so per-trigger listing
    stays proportional to NEW files, not crawl history.
    """
    from pyspark.sql import functions as F

    # files PRESENT at stream start get the fast, descriptive
    # oversize check; later arrivals fail their micro-batch with the
    # source's own error (module docstring segment-size contract)
    _refuse_oversized_segments(spark, path, recursive, pathGlobFilter)
    schema, parse = _warc_parser(recordTypes, httpOnly, payloadAsText)
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .option("recursiveFileLookup", str(recursive).lower()))
    if pathGlobFilter:
        reader = reader.option("pathGlobFilter", pathGlobFilter)
    if maxFilesPerTrigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(maxFilesPerTrigger))
    return (reader.load(path)
            .select(F.col("path"), F.col("content"))
            .mapInPandas(parse, schema))


def write_warc(df: DataFrame, out_path: str,
               uriCol: str = "target_uri",
               payloadCol: str = "payload",
               dateCol: str | None = None,
               gzipMembers: bool = True) -> None:
    """Write rows back out as WARC.gz records, one archive file per
    partition (``part-<n>.warc.gz`` under ``out_path``) — the
    round-trip sink for re-publishing a curated subset in the crawl's
    native format. Records are typed ``WARC-Type: resource`` with
    ``Content-Type: application/octet-stream`` (ISO 28500 §6.5: a
    resource record's block IS the payload, no protocol envelope) —
    NOT ``response``, whose block must be an ``application/http``
    message; this keeps the round trip byte-exact even for payloads
    that themselves start with ``HTTP/``, and keeps external WARC
    tooling conformant. Per-record gzip members (the Common Crawl
    convention) keep the output streamable by standard WARC tooling.

    Each task writes to a unique temp name (task attempt id + uuid)
    and atomically renames into place, so a retried or speculative
    duplicate attempt can never interleave with a zombie writer on
    the same archive. Executors must share the target filesystem —
    the same contract as every file sink here."""
    import os
    import uuid

    def _record(uri: str, date: str | None, payload: bytes) -> bytes:
        rid = f"<urn:uuid:{uuid.uuid4()}>"
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: resource\r\n"
               f"WARC-Record-ID: {rid}\r\n"
               + (f"WARC-Date: {date}\r\n" if date else "")
               + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
               + f"Content-Type: application/octet-stream\r\n"
               + f"Content-Length: {len(payload)}\r\n\r\n")
        return hdr.encode("utf-8") + payload + b"\r\n\r\n"

    date_col = dateCol

    def _write(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        idx = ctx.partitionId()
        os.makedirs(out_path, exist_ok=True)
        fname = os.path.join(out_path,
                             f"part-{idx:05d}.warc"
                             + (".gz" if gzipMembers else ""))
        tmp = os.path.join(
            out_path,
            f".part-{idx:05d}-attempt{ctx.taskAttemptId()}"
            f"-{uuid.uuid4().hex}.tmp")
        wrote = False
        try:
            with open(tmp, "wb") as f:
                for r in rows:
                    wrote = True
                    payload = bytes(r[payloadCol])
                    rec = _record(r[uriCol],
                                  r[date_col] if date_col else None,
                                  payload)
                    f.write(gzip.compress(rec) if gzipMembers else rec)
            if wrote:
                os.replace(tmp, fname)  # atomic: last attempt wins
            else:
                os.remove(tmp)  # no empty archives
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    df.foreachPartition(_write)
