"""HTTP micro-batch serving source + reply sink.

Parity: reference ``core/.../sql/execution/streaming/HTTPSource.scala``:

- ``:43-75``   server starts on the head node, handler enqueues rows;
- ``:78-113``  ``getOffset``/``getBatch`` expose queued requests as
               micro-batch DataFrames keyed by a LongOffset;
- ``:114-128`` ``reply(id, response)`` routes through
               ``HTTPSourceStateHolder`` (per-JVM singleton registry);
- ``:178-210`` the sink evaluates the reply column and answers each
               request; ``commit(end)`` trims replied batches.

Spark-4-first: the source is a **python streaming DataSource**
(``SimpleDataSourceStreamReader``) — the public API for exactly this
head-node pattern. Process topology (python data sources execute in a
separate worker process, so the reference's same-JVM state sharing
needs one explicit hop):

- the HTTP server runs in the **driver process** (started by
  ``start_serving_server``), holding the pending-request registry that
  ``foreachBatch`` reply routing needs;
- the stream reader (data-source worker process) drains queued
  requests via the server's internal ``/__drain__`` endpoint — the
  local-socket analog of the reference's shared ``HTTPSourceStateHolder``;
- replies route in-process in the driver (``reply_batch``), unblocking
  the per-request handler thread (504 on timeout).

Offsets are a monotone counter; drained-but-uncommitted batches are
retained for replay (``readBetweenOffsets``) and trimmed on ``commit``,
exactly the reference's LongOffset bookkeeping. Distributed mode
(per-executor servers) is not expressible with the python source API;
``streaming/distributed_serving.py`` provides it instead via a
barrier-hosted fleet (no replay semantics, continuous-class latency).
"""

from __future__ import annotations

import base64
import itertools
import secrets
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

REQUEST_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("headers", T.StringType()),  # JSON object
    T.StructField("body", T.BinaryType()),
])

REPLY_TIMEOUT = 30.0
_INTERNAL_DRAIN = "/__drain__"


class _ServerState:
    """Pending requests + reply routing (HTTPSourceStateHolder analog)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.queue: list[tuple] = []
        self.counter = itertools.count()
        self.pending: dict[str, dict] = {}  # id -> {event, response}

    def enqueue(self, method, path, headers, body) -> str:
        rid = f"req-{next(self.counter)}"
        ev = threading.Event()
        with self.lock:
            self.pending[rid] = {"event": ev, "response": None}
            self.queue.append((rid, method, path, headers, body))
        return rid

    def drain(self):
        with self.lock:
            rows, self.queue = self.queue, []
        return rows

    def reply(self, rid: str, status: int, body: bytes):
        with self.lock:
            slot = self.pending.get(rid)
        if slot is not None:
            slot["response"] = (status, body)
            slot["event"].set()

    def wait_for_reply(self, rid: str, timeout: float):
        with self.lock:
            slot = self.pending.get(rid)
        if slot is None:
            return None
        ok = slot["event"].wait(timeout)
        with self.lock:
            self.pending.pop(rid, None)
            if not ok:
                # a timed-out request must leave the QUEUE too: with no
                # consumer running, dead entries would accumulate
                # unboundedly and flood the first real micro-batch with
                # requests whose reply slots are already gone
                self.queue = [t for t in self.queue if t[0] != rid]
        return slot["response"] if ok else None


_SERVERS: dict[str, tuple] = {}  # name -> (server, state, port)
_SERVERS_LOCK = threading.Lock()


def start_serving_server(name: str, host: str = "127.0.0.1",
                         port: int = 0) -> int:
    """Start (or look up) the named head-node server; returns its port.
    Call in the driver before starting the stream."""
    with _SERVERS_LOCK:
        if name in _SERVERS:
            return _SERVERS[name][2]
        state = _ServerState()
        drain_token = secrets.token_hex(16)

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: with the 1.0 default every request
            # opens a fresh TCP connection, and a concurrent burst of
            # connects can overflow the accept backlog — the kernel's
            # 1 s SYN retransmit then shows up as a bimodal ~1.2 s p99
            # on an otherwise ~0.15 s path (observed in rounds 3-4).
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def do_POST(self):
                if self.path == _INTERNAL_DRAIN:
                    # token-gated: the drain endpoint shares the public
                    # serving port, and an unauthenticated drain would
                    # hand the whole pending queue (ids, headers,
                    # bodies) to any client that guesses the path
                    if self.headers.get("X-Drain-Token") != drain_token:
                        self.send_response(403)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    rows = state.drain()
                    payload = json.dumps([
                        {"id": r[0], "method": r[1], "path": r[2],
                         "headers": r[3],
                         "body": base64.b64encode(r[4]).decode()}
                        for r in rows
                    ]).encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                self._serve()

            def _serve(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n) if n else b""
                hdrs = json.dumps(dict(self.headers.items()))
                rid = state.enqueue(self.command, self.path, hdrs, body)
                resp = state.wait_for_reply(rid, REPLY_TIMEOUT)
                if resp is None:
                    self.send_response(504)
                    # HTTP/1.1: a response without Content-Length would
                    # otherwise force a connection close
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                status, payload = resp
                payload = payload or b""
                self.send_response(status)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_PUT = do_DELETE = _serve

        class _Server(ThreadingHTTPServer):
            # default backlog of 5 is the other half of the SYN-retry
            # tail; keep-alive makes bursts of new connections rare,
            # the deeper backlog absorbs the ones that remain
            request_queue_size = 128

        srv = _Server((host, port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        _SERVERS[name] = (srv, state, srv.server_port, drain_token)
        return srv.server_port


def get_server_state(name: str) -> _ServerState:
    return _SERVERS[name][1]


def get_server_port(name: str) -> int:
    return _SERVERS[name][2]


def get_server_token(name: str) -> str:
    """The drain token the stream reader must present (pass as the
    reader's ``drainToken`` option)."""
    return _SERVERS[name][3]


def stop_server(name: str):
    with _SERVERS_LOCK:
        entry = _SERVERS.pop(name, None)
    if entry:
        entry[0].shutdown()
        # shutdown() only stops the serve loop; without server_close()
        # the listening socket stays bound and an immediate restart on
        # the same port dies with EADDRINUSE
        entry[0].server_close()


class _HTTPStreamReader(SimpleDataSourceStreamReader):
    """Runs in the data-source worker process; bridges to the driver's
    server over the internal drain endpoint."""

    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options["port"])  # required: start the server first
        self.token = options.get("drainToken", "")
        self._retained: dict[tuple, list] = {}

    def _drain(self):
        import requests

        resp = requests.post(
            f"http://{self.host}:{self.port}{_INTERNAL_DRAIN}",
            headers={"X-Drain-Token": self.token}, timeout=10)
        resp.raise_for_status()  # 403 = missing/stale drainToken option
        rows = []
        for r in resp.json():
            rows.append((r["id"], r["method"], r["path"], r["headers"],
                         base64.b64decode(r["body"])))
        return rows

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        rows = self._drain()
        end = {"offset": start["offset"] + len(rows)}
        if rows:
            self._retained[(start["offset"], end["offset"])] = rows
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._retained.get((start["offset"], end["offset"]), []))

    def commit(self, end: dict):
        # trim replied batches (HTTPSource.scala:129-135)
        for key in [k for k in self._retained if k[1] <= end["offset"]]:
            self._retained.pop(key, None)


class HTTPServingDataSource(DataSource):
    """``spark.readStream.format("http_serving").option("port", p)`` —
    rows follow REQUEST_SCHEMA."""

    @classmethod
    def name(cls):
        return "http_serving"

    def schema(self):
        return REQUEST_SCHEMA

    def simpleStreamReader(self, schema):
        return _HTTPStreamReader(self.options)


def register_serving_source(spark) -> None:
    spark.dataSource.register(HTTPServingDataSource)


def make_reply(col, status: int = 200, binary: bool = False) -> F.Column:
    """Build a reply struct from any column (ServingUDFs.makeReplyUDF,
    ``ServingUDFs.scala:17-51``): JSON-serializes values, or passes a
    binary column through raw with ``binary=True`` (the reference's
    binary fast path — JSON-wrapping bytes would hand the client a
    base64 string inside an envelope instead of the payload)."""
    body = (col if isinstance(col, F.Column) else F.col(col))
    if binary:
        payload = body.cast("binary")
    else:
        payload = F.to_json(F.struct(body.alias("value"))).cast("binary")
    return F.struct(
        F.lit(status).alias("status"),
        payload.alias("body"),
    )


def reply_batch(batch_df: DataFrame, server_name: str,
                idCol: str = "id", replyCol: str = "reply") -> None:
    """Route one micro-batch's replies (HTTPSink.addBatch,
    ``HTTPSource.scala:184-210``). The collect here is the pending
    request set — bounded by in-flight HTTP requests, not data size."""
    state = get_server_state(server_name)
    for row in batch_df.select(idCol, replyCol).collect():
        r = row[replyCol]
        state.reply(row[idCol], int(r["status"]),
                    bytes(r["body"]) if r["body"] is not None else b"")


def serving_sink(df: DataFrame, server_name: str, idCol: str = "id",
                 replyCol: str = "reply", trigger: str = "50 milliseconds",
                 checkpoint: str | None = None):
    """``writeStream.server()`` analog: foreachBatch reply routing."""
    writer = (df.writeStream
              .foreachBatch(lambda b, _i: reply_batch(b, server_name,
                                                      idCol, replyCol))
              .trigger(processingTime=trigger))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
