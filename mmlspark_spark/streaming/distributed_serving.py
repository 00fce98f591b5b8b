"""Per-executor HTTP serving fleet (DistributedHTTPSource analog).

Parity: reference ``core/.../DistributedHTTPSource.scala:90-203``
(one HTTP server per executor, addresses aggregated through the
driver) and the latency class of continuous serving
(``HTTPSourceV2.scala:54-92,205-330`` — requests answered in place,
no batch boundary).

The python streaming DataSource API cannot host per-executor servers
(its readers run in isolated worker processes — documented delta
since round 1), but **barrier execution can**: a long-lived barrier
job pins one task per requested server, each task binds a
``ThreadingHTTPServer`` on its executor, reports ``host:port`` to the
driver over a TCP registration socket, and serves until the driver
posts ``/__admin__/stop``. The request handler is an arbitrary
picklable callable ``dict -> dict`` (JSON in / JSON out, the
``make_reply`` value shape) evaluated per request in the server
thread — there is no micro-batch trigger in the path, which is what
buys back the reference's latency class: measured sub-millisecond
p50 on localhost vs ~150 ms through the micro-batch source.

Scale design: ``numServers`` barrier tasks = that many
executor-hosted servers; clients spread load with an external LB or
client-side round-robin over ``addresses`` — the same
service-discovery pattern the reference's distributed source uses.
The barrier job holds its task slots for the fleet's lifetime; that
is not a leak but the cost model of resident serving (the reference
pays it too). ``stop()`` tears the fleet down and releases the slots;
a job-group cancel backs up the graceful path.

Delta vs the reference: micro-batch exactly-once semantics do not
apply — requests are answered directly, nothing is checkpointed. For
replayable request/reply streams use ``streaming/serving.py``; for
low-latency model serving use this fleet.
"""

from __future__ import annotations

import json
import socket
import threading
import time
import urllib.request
from typing import Callable

_ADMIN_STOP = "/__admin__/stop"


def _serve_partition(handler: Callable[[dict], dict], driver_host: str,
                     reg_port: int, admin_token: str):
    """Body of each barrier task: bind, register, serve until stopped."""

    def run(_it):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        # Advertise the address the scheduler knows this task by — on a
        # cluster that is the executor's host, in local mode 127.x.
        host = ctx.getTaskInfos()[pid].address.split(":")[0]
        stop_event = threading.Event()

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # keep-alive (see serving.py)

            def log_message(self, *a):
                pass

            def _respond(self, status: int, payload: bytes):
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_POST(self):
                if self.path == _ADMIN_STOP:
                    # servers bind 0.0.0.0 by design (clients must
                    # reach them) — shutdown requires the per-fleet
                    # token only the driver holds
                    if self.headers.get("X-Admin-Token") != admin_token:
                        self._respond(403, b'{"error": "forbidden"}')
                        return
                    self._respond(200, b"{}")
                    stop_event.set()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n) if n else b"{}"
                try:
                    req = json.loads(body) if body else {}
                    out = handler(req)
                    self._respond(200, json.dumps(out).encode())
                except Exception as e:  # handler errors -> 500, fleet lives
                    self._respond(500, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode())

            def do_GET(self):  # health probe
                self._respond(200, b'{"status": "ok"}')

        class _Server(ThreadingHTTPServer):
            request_queue_size = 128
            daemon_threads = True

        srv = _Server(("0.0.0.0", 0), Handler)
        port = srv.server_port
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        # Every server is up before any address is advertised — a
        # client can hit any registered address immediately.
        ctx.barrier()
        with socket.create_connection((driver_host, reg_port),
                                      timeout=15) as s:
            s.sendall(f"{pid} {host}:{port}\n".encode())
        stop_event.wait()
        srv.shutdown()
        return iter([pid])

    return run


class DistributedHTTPServer:
    """Executor-hosted HTTP serving fleet.

    >>> fleet = DistributedHTTPServer(spark, lambda r: {"y": r["x"] * 2},
    ...                               numServers=4)
    >>> addrs = fleet.start()      # ["host:port", ...] in partition order
    >>> ...                        # POST JSON to any address
    >>> fleet.stop()
    """

    def __init__(self, spark, handler: Callable[[dict], dict],
                 numServers: int = 2, name: str = "dserving"):
        sc = spark.sparkContext
        self.spark = spark
        self.handler = handler
        self.numServers = max(1, min(int(numServers), sc.defaultParallelism))
        self.name = name
        self.addresses: list[str] = []
        self._thread: threading.Thread | None = None
        self._reg_sock: socket.socket | None = None
        self._admin_token = ""
        self._launch_error: Exception | None = None

    def start(self, timeout: float = 60.0) -> list[str]:
        import secrets

        if self._thread is not None:
            return self.addresses
        sc = self.spark.sparkContext
        driver_host = sc.getConf().get("spark.driver.host", "127.0.0.1")
        self._admin_token = secrets.token_hex(16)
        reg = socket.socket()
        reg.bind(("0.0.0.0", 0))
        reg.listen(self.numServers)
        # short accept timeout so the loop can notice a dead barrier
        # job between connections; overall deadline enforced below
        reg.settimeout(2.0)
        self._reg_sock = reg
        run = _serve_partition(self.handler, driver_host,
                               reg.getsockname()[1], self._admin_token)
        n, name = self.numServers, self.name
        self._launch_error: Exception | None = None

        def launch():
            # job group scoped to this thread: stop() can cancel the
            # resident job if a server misses the graceful shutdown
            sc.setJobGroup(name, "distributed HTTP serving fleet",
                           interruptOnCancel=True)
            try:
                sc.parallelize(range(n), n).barrier().mapPartitions(
                    run).collect()
            except Exception as e:
                # cancellation via stop() lands here too (expected);
                # a genuine submit/startup failure (e.g. barrier needs
                # more slots than the cluster has) is recorded so
                # start() can fail fast with the root cause instead of
                # a misleading registration timeout
                self._launch_error = e

        self._thread = threading.Thread(target=launch, daemon=True)
        self._thread.start()
        got: dict[int, str] = {}
        deadline = time.monotonic() + timeout
        try:
            while len(got) < n:
                if self._launch_error is not None:
                    err = self._launch_error
                    self.stop()
                    raise RuntimeError(
                        f"serving fleet failed to launch: {err}") from err
                if time.monotonic() > deadline:
                    self.stop()
                    raise TimeoutError(
                        f"{len(got)}/{n} servers registered "
                        f"within {timeout}s")
                try:
                    conn, _ = reg.accept()
                except socket.timeout:
                    continue
                with conn:
                    # accepted sockets come back BLOCKING regardless of
                    # the listener's timeout — a half-open client that
                    # sends nothing would wedge recv() forever and with
                    # it the whole start() deadline
                    conn.settimeout(2.0)
                    line = b""
                    try:
                        while not line.endswith(b"\n") and len(line) < 512:
                            chunk = conn.recv(256)
                            if not chunk:
                                break
                            line += chunk
                    except socket.timeout:
                        continue
                # tolerate stray connections (port scans, LB probes,
                # half-open registrations): skip anything that does not
                # parse as "<pid> <host:port>" with a pid inside the
                # fleet and a numeric port; first registration per pid
                # wins (a duplicate/forged line must not overwrite a
                # healthy server's address or inflate the quota)
                try:
                    pid_s, addr = line.decode().strip().split(" ", 1)
                    pid = int(pid_s)
                    host, port_s = addr.rsplit(":", 1)
                    int(port_s)
                except (ValueError, UnicodeDecodeError):
                    continue
                if 0 <= pid < n and host and pid not in got:
                    got[pid] = addr
        finally:
            reg.close()
            self._reg_sock = None
        self.addresses = [got[i] for i in sorted(got)]
        return self.addresses

    def stop(self, timeout: float = 10.0):
        for addr in self.addresses:
            try:
                urllib.request.urlopen(urllib.request.Request(
                    f"http://{addr}{_ADMIN_STOP}", data=b"{}",
                    headers={"X-Admin-Token": self._admin_token},
                    method="POST"), timeout=5).read()
            except Exception:
                pass  # cancel below is the backstop
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                self.spark.sparkContext.cancelJobGroup(self.name)
                self._thread.join(timeout)
            self._thread = None
        self.addresses = []
