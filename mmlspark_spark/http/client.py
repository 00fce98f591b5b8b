"""Per-worker shared HTTP client with retry/backoff.

Parity: reference ``io/http/HTTPClients.scala:65-157`` (AdvancedHTTPHandling:
retry on 429/5xx/connection failure with a backoff schedule) and
``io/http/SharedVariable.scala`` (per-JVM shared client → here a
module-level session cache per python worker process, reused across
Arrow batches and tasks that land on the same worker).
"""

from __future__ import annotations

import threading
import time

# per-THREAD sessions: requests.Session is not thread-safe (concurrent
# cookie-jar mutation races), and HTTPTransformer fans requests out
# over a ThreadPoolExecutor — each worker thread gets its own pooled
# session instead of sharing one
_SESSIONS = threading.local()

RETRYABLE_STATUSES = frozenset({429} | set(range(500, 600)))


def get_session():
    """One requests.Session per worker THREAD (connection pooling)."""
    import requests

    s = getattr(_SESSIONS, "session", None)
    if s is None:
        s = requests.Session()
        adapter = requests.adapters.HTTPAdapter(pool_connections=32,
                                                pool_maxsize=32)
        s.mount("http://", adapter)
        s.mount("https://", adapter)
        _SESSIONS.session = s
    return s


def send_with_retries(row: dict, timeout: float,
                      backoffs=(0.1, 0.5, 1.0)) -> dict:
    """Send one request dict -> response dict (HTTP_RESPONSE_SCHEMA shape).

    Connection-level failures surface as statusCode -1 with the error
    text in reasonPhrase so downstream error columns can capture them
    (reference SimpleHTTPTransformer ``errorCol`` pattern).
    """
    import requests

    if row is None:
        # a conditionally-built request column yields null structs; the
        # contract is an error row, never a task-killing AttributeError
        return {"statusCode": -1, "reasonPhrase": "null request row",
                "headers": [], "entity": None}
    session = get_session()
    headers = {h["name"]: h["value"] for h in (row.get("headers") or [])}
    attempts = [None] + list(backoffs)
    last_err = None
    last_resp = None
    for backoff in attempts:
        if backoff:
            time.sleep(backoff)
        try:
            resp = session.request(
                row.get("method") or "GET", row["url"],
                data=bytes(row["entity"]) if row.get("entity") is not None else None,
                headers=headers, timeout=timeout,
            )
        except requests.RequestException as e:  # connection-level failure
            last_err = str(e)
            continue
        if resp.status_code in RETRYABLE_STATUSES:
            last_err = f"HTTP {resp.status_code}"
            last_resp = resp
            continue
        return {
            "statusCode": int(resp.status_code),
            "reasonPhrase": resp.reason or "",
            "headers": [{"name": k, "value": v} for k, v in resp.headers.items()],
            "entity": resp.content,
        }
    if last_resp is not None:
        # retries exhausted on a real HTTP status: return THAT response
        # (status, Retry-After headers, error body) so throttling is
        # distinguishable from a connection failure — -1 is reserved
        # for connection-level errors (the reference's
        # AdvancedHTTPHandling contract)
        return {
            "statusCode": int(last_resp.status_code),
            "reasonPhrase": last_resp.reason or "",
            "headers": [{"name": k, "value": v}
                        for k, v in last_resp.headers.items()],
            "entity": last_resp.content,
        }
    return {"statusCode": -1, "reasonPhrase": last_err or "request failed",
            "headers": [], "entity": None}
