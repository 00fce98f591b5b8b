"""End-to-end HTTP serving (reference io/split2/HTTPv2Suite strategy:
start the serving query, POST to it, assert the reply)."""

import json

import pytest
import requests
from pyspark.sql import functions as F

from mmlspark_spark.streaming import (
    make_reply,
    register_serving_source,
    serving_sink,
)
from mmlspark_spark.streaming.serving import (
    start_serving_server,
    stop_server,
)


def test_http_serving_round_trip(spark, tmp_path):
    register_serving_source(spark)
    name = "t_serve"
    port = start_serving_server(name)
    from mmlspark_spark.streaming.serving import get_server_token

    req = (spark.readStream.format("http_serving")
           .option("port", str(port))
           .option("drainToken", get_server_token(name)).load())
    # logic: uppercase the "text" field of the JSON body
    logic = req.select(
        "id",
        make_reply(
            F.upper(F.get_json_object(F.col("body").cast("string"), "$.text"))
        ).alias("reply"),
    )
    query = serving_sink(logic, name, checkpoint=str(tmp_path / "ckpt"))
    try:
        url = f"http://127.0.0.1:{port}/score"
        resp = requests.post(url, json={"text": "hello"}, timeout=30)
        assert resp.status_code == 200
        assert json.loads(resp.content)["value"] == "HELLO"
        # a second request exercises offset advance + trim
        resp2 = requests.post(url, json={"text": "again"}, timeout=30)
        assert json.loads(resp2.content)["value"] == "AGAIN"
    finally:
        query.stop()
        stop_server(name)


def test_windowed_agg_on_stream(spark, tmp_path):
    """Watermarked tumbling window over a rate source."""
    from mmlspark_spark.streaming.stateful import windowed_agg

    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", "50").load())
    # short watermark: append mode only emits a window once the
    # watermark passes its end
    agg = windowed_agg(rate, "timestamp", "1 second",
                       {"n": F.count("*"), "sum_v": F.sum("value")},
                       watermark="1 second")
    q = (agg.writeStream.format("memory").queryName("win_agg")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck1")).start())
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM win_agg").count() >= 1:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM win_agg").collect()
        assert len(rows) >= 1
        assert all(r.n > 0 for r in rows)
        assert {"window_start", "window_end", "n", "sum_v"} <= set(
            spark.sql("SELECT * FROM win_agg").columns)
    finally:
        q.stop()


def test_running_counter_stateful(spark, tmp_path):
    """applyInPandasWithState across micro-batches: state accumulates."""
    from mmlspark_spark.streaming.stateful import RunningCounter

    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", "100").load())
    keyed = rate.select(
        (F.col("value") % 2).cast("string").alias("key"),
        F.col("value").cast("double").alias("value"))
    out = RunningCounter(keyCol="key", valueCol="value").apply(keyed)
    q = (out.writeStream.format("memory").queryName("counter")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        import time

        deadline = time.time() + 40
        last = 0
        grew = False
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT key, max(count) AS c FROM counter GROUP BY key"
            ).collect()
            total = sum(r.c for r in rows)
            if rows and total > last > 0:
                grew = True  # state accumulated across micro-batches
                break
            last = max(last, total)
            time.sleep(1.0)
        assert grew
    finally:
        q.stop()


def test_distributed_http_serving_fleet(spark):
    """DistributedHTTPSource analog: per-executor barrier-hosted
    servers answer requests in place — no micro-batch boundary. Checks
    fleet bring-up, round-robin scoring on every server, error
    isolation, health probe, latency class, and clean teardown."""
    import json
    import time
    import urllib.request

    from mmlspark_spark.streaming.distributed_serving import (
        DistributedHTTPServer)

    fleet = DistributedHTTPServer(
        spark, lambda req: {"doubled": req["x"] * 2}, numServers=2,
        name="test-dserving")
    try:
        addrs = fleet.start(timeout=60)
        assert len(addrs) == 2 and all(":" in a for a in addrs)

        def post(addr, obj, path="/score"):
            r = urllib.request.urlopen(urllib.request.Request(
                f"http://{addr}{path}", data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
                method="POST"), timeout=10)
            return json.loads(r.read())

        lat = []
        for i in range(40):
            t0 = time.perf_counter()
            out = post(addrs[i % 2], {"x": i})
            lat.append(time.perf_counter() - t0)
            assert out["doubled"] == i * 2
        # direct in-place handling: median far below one micro-batch
        # trigger (~150 ms measured through the streaming source);
        # generous bound for shared-CI noise
        assert sorted(lat)[len(lat) // 2] < 0.05

        # handler error -> 500 on that request, fleet stays up
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://{addrs[0]}/score", data=b'{"y": 1}',
                method="POST"), timeout=10)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        assert post(addrs[0], {"x": 7})["doubled"] == 14

        # health probe
        r = urllib.request.urlopen(f"http://{addrs[1]}/", timeout=10)
        assert json.loads(r.read())["status"] == "ok"

        # admin stop requires the per-fleet token: unauthenticated
        # shutdown is rejected and the fleet keeps serving
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://{addrs[0]}/__admin__/stop", data=b"{}",
                method="POST"), timeout=10)
            raise AssertionError("expected HTTP 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        assert post(addrs[0], {"x": 3})["doubled"] == 6
    finally:
        fleet.stop()
    assert fleet.addresses == []


def test_streaming_dedup_drops_copies(spark, tmp_path):
    """streaming_dedup: first arrival of each content key passes,
    later copies drop — across micro-batches, with hashed state keys."""
    import json as _json

    from mmlspark_spark.streaming import streaming_dedup

    src = tmp_path / "sd_src"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(_json.dumps(r) for r in [
        {"ts": "2026-01-01T00:00:00", "text": "alpha"},
        {"ts": "2026-01-01T00:00:01", "text": "beta"},
        {"ts": "2026-01-01T00:00:02", "text": "alpha"},   # in-batch dup
    ]))
    stream = (spark.readStream.schema("ts timestamp, text string")
              .json(str(src)))
    out = streaming_dedup(stream, "text", "ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sd_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sd_ck"))
         .start())
    try:
        q.processAllAvailable()
        (src / "f2.json").write_text("\n".join(_json.dumps(r) for r in [
            {"ts": "2026-01-01T00:00:03", "text": "beta"},  # cross-batch dup
            {"ts": "2026-01-01T00:00:04", "text": "gamma"},
        ]))
        q.processAllAvailable()
        got = sorted(r.text for r in
                     spark.sql("SELECT * FROM sd_out").collect())
        assert got == ["alpha", "beta", "gamma"]
        # hashed state keys never leak into the output schema
        assert spark.sql("SELECT * FROM sd_out").columns == ["ts", "text"]
    finally:
        q.stop()


def test_streaming_dedup_null_key_no_collision(spark, tmp_path):
    """('a', NULL) and (NULL, 'a') are DISTINCT keys: the hashed state
    key uses the null-safe length-prefixed serialization, not multi-arg
    xxhash64 (which skips null children and would collide them)."""
    import json as _json

    from mmlspark_spark.streaming import streaming_dedup

    src = tmp_path / "sdn_src"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(_json.dumps(r) for r in [
        {"ts": "2026-01-01T00:00:00", "k1": "a", "k2": None},
        {"ts": "2026-01-01T00:00:01", "k1": None, "k2": "a"},
        {"ts": "2026-01-01T00:00:02", "k1": "a", "k2": None},  # true dup
    ]))
    stream = (spark.readStream
              .schema("ts timestamp, k1 string, k2 string")
              .json(str(src)))
    out = streaming_dedup(stream, ["k1", "k2"], "ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sdn_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sdn_ck"))
         .start())
    try:
        q.processAllAvailable()
        got = sorted(
            ((r.k1, r.k2)
             for r in spark.sql("SELECT k1, k2 FROM sdn_out").collect()),
            key=str)
        assert got == sorted([(None, "a"), ("a", None)], key=str)
    finally:
        q.stop()


def test_streaming_dedup_against_registry(spark, tmp_path):
    """Stream-static anti join: rows whose text exists in the static
    registry never emit, regardless of watermark horizons; fresh rows
    pass. No state store involved."""
    import json as _json

    from mmlspark_spark.streaming import streaming_dedup_against_registry

    registry = spark.createDataFrame(
        [(1, "already ingested"), (2, "also known")], ["doc_id", "text"])
    src = tmp_path / "sr_src"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(_json.dumps(r) for r in [
        {"ts": "2026-01-01T00:00:00", "text": "already ingested"},
        {"ts": "2026-01-01T00:00:01", "text": "brand new"},
        {"ts": "2026-01-01T00:00:02", "text": "also known"},
        {"ts": "2026-01-01T00:00:03", "text": "another new"},
    ]))
    stream = (spark.readStream.schema("ts timestamp, text string")
              .json(str(src)))
    out = streaming_dedup_against_registry(stream, registry, "text")
    q = (out.writeStream.format("memory").queryName("sr_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sr_ck"))
         .start())
    try:
        q.processAllAvailable()
        got = sorted(r.text for r in
                     spark.sql("SELECT text FROM sr_out").collect())
        assert got == ["another new", "brand new"]
        assert spark.sql("SELECT * FROM sr_out").columns == ["ts", "text"]
    finally:
        q.stop()


def test_pure_expression_stages_work_on_streams(spark, tmp_path):
    """Batch/stream unification: the map-only curation stages
    (MarkupStripper, PIIRedactor, QualityFilter) are pure Catalyst
    expression chains, so the SAME transformer instance applies to a
    streaming frame unchanged — no collect, no state, no rewrite."""
    import json as _json

    from mmlspark_spark.llm import MarkupStripper, PIIRedactor, QualityFilter

    src = tmp_path / "pe_src"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(_json.dumps(r) for r in [
        {"doc_id": 1,
         "text": "<p>contact a.b@example.com for the "
                 + "long enough body of text " * 20 + "</p>"},
        {"doc_id": 2, "text": "<b>short</b>"},
    ]))
    stream = (spark.readStream.schema("doc_id long, text string")
              .json(str(src)))
    cleaned = MarkupStripper(textCol="text", outputCol="text2") \
        .transform(stream)
    redacted = PIIRedactor(textCol="text2", outputCol="scrubbed") \
        .transform(cleaned)
    flagged = QualityFilter(textCol="scrubbed", minChars=50,
                            minTokens=10).transform(redacted)
    filtered = flagged.filter("keep")
    q = (filtered.writeStream.format("memory").queryName("pe_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "pe_ck"))
         .start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM pe_out").collect()
        assert [r.doc_id for r in rows] == [1]     # short doc filtered
        assert "<EMAIL>" in rows[0].scrubbed       # PII redacted
        assert "<p>" not in rows[0].scrubbed       # markup stripped
    finally:
        q.stop()


def test_streaming_incremental_neardup_screen(spark, tmp_path):
    """Round-12 stretch: the stored-index match lanes composed with
    Structured Streaming. Three micro-batches flow through
    neardup_screen_foreach_batch over a MinHash index: batch 1
    bootstraps the index; batch 2's planted near-copy of a batch-1
    doc is FLAGGED against the index and withheld from the append
    while its fresh docs survive in; batch 3's near-copy of a
    batch-2 SURVIVOR is flagged too — proof the append happened.
    Dedup memory lives in the artifact, not a state store."""
    import json as _json

    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    base = ("the quick brown fox jumps over the lazy dog and then "
            "naps in the warm afternoon sun for hours ")
    fresh2 = ("completely different content about distributed query "
              "engines and columnar storage formats at scale ")
    src = tmp_path / "nd_src"
    src.mkdir()
    batches = [
        [{"doc_id": 1, "text": base * 2},
         {"doc_id": 2, "text": "unrelated first-batch text " * 6}],
        [{"doc_id": 10, "text": (base * 2).replace("quick", "rapid")},
         {"doc_id": 11, "text": fresh2 * 2}],
        [{"doc_id": 20, "text": (fresh2 * 2).replace("columnar",
                                                     "vectorized")}],
    ]

    dd = MinHashLSHDeduplicator(idCol="doc_id", textCol="text",
                                shingleSize=3, numHashes=16, bands=8,
                                threshold=0.3, maxBucketSize=None)
    seen: dict[int, dict] = {}

    def on_batch(bid, pairs, survivors):
        seen[bid] = {
            "pairs": {(r[0], r[1]) for r in pairs.collect()},
            "survivors": {r.doc_id for r in survivors.collect()},
        }

    screen = neardup_screen_foreach_batch(
        dd, str(tmp_path / "nd_idx"), "doc_id", on_batch=on_batch)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    import os as _os
    import time as _time

    now = _time.time()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(_json.dumps(r) for r in rows))
        # the file source orders batches by MODIFICATION TIME, and
        # same-tick writes tie-break nondeterministically — pin
        # strictly increasing mtimes so batch order is the test's
        _os.utime(f, (now + i, now + i))
    q = (stream.writeStream.foreachBatch(screen)
         .option("checkpointLocation", str(tmp_path / "nd_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 3
    # batch 0 bootstraps: nothing flagged, everything survives
    assert seen[0]["pairs"] == set()
    assert seen[0]["survivors"] == {1, 2}
    # batch 1: planted dup of doc 1 flagged, fresh doc survives
    assert {a for a, _ in seen[1]["pairs"]} == {10}
    assert (10, 1) in seen[1]["pairs"]
    assert seen[1]["survivors"] == {11}
    # batch 2: near-copy of batch-1 SURVIVOR 11 flagged — the
    # survivors append actually grew the index
    assert {(a, b) for a, b in seen[2]["pairs"]} == {(20, 11)}
    assert seen[2]["survivors"] == set()
    # flagged doc 10 is NOT in the index (only survivors append)
    sigs = spark.read.parquet(str(tmp_path / "nd_idx" / "signatures"))
    assert {r["__id"] for r in sigs.select("__id").collect()} \
        == {1, 2, 11}


def test_streaming_bm25_ingest_equals_batch_build(spark, tmp_path):
    """bm25_ingest_foreach_batch: three micro-batches stream into a
    BM25 index (batch 1 bootstraps, 2-3 append) — searching the
    stream-built index must be BIT-identical to a fresh batch build
    over everything ingested (append_to_index's exact-stats contract,
    now pinned end-to-end through Structured Streaming)."""
    import json as _json
    import os as _os
    import time as _time

    from mmlspark_spark.llm import BM25Retriever
    from mmlspark_spark.streaming import bm25_ingest_foreach_batch

    src = tmp_path / "bi_src"
    src.mkdir()
    batches = [
        [{"doc_id": i, "text": f"apple banana w{i % 5} cherry"}
         for i in range(10)],
        [{"doc_id": 10 + i, "text": f"banana date w{i % 3} apple"}
         for i in range(8)],
        [{"doc_id": 20 + i, "text": f"cherry elderberry w{i % 2}"}
         for i in range(6)],
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(_json.dumps(r) for r in rows))
        _os.utime(f, (now + i, now + i))

    bm = BM25Retriever(k=5)
    seen = []
    ingest = bm25_ingest_foreach_batch(
        bm, str(tmp_path / "bi_idx"), positions=True,
        on_batch=lambda bid, n: seen.append((bid, n)))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = (stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", str(tmp_path / "bi_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == [(0, 10), (1, 8), (2, 6)]

    queries = spark.createDataFrame(
        [(0, "apple cherry"), (1, "banana date")],
        "query_id long, query string")
    phrases = spark.createDataFrame(
        [(0, "apple banana")], "query_id long, query string")
    idx = bm.load_index(spark, str(tmp_path / "bi_idx"))
    streamed = sorted(map(tuple,
                          bm.search_with_index(idx, queries).collect()))
    streamed_ph = sorted(map(tuple, bm.phrase_search_with_index(
        idx, phrases).collect()))

    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for rows in batches for r in rows],
        "doc_id long, text string")
    assert streamed == sorted(map(tuple,
                                  bm.search(all_docs, queries)
                                  .collect()))
    assert streamed_ph == sorted(map(tuple, bm.phrase_search(
        all_docs, phrases).collect()))


def test_streaming_bm25_ingest_survives_torn_append(
        spark, tmp_path, monkeypatch):
    """Crash-replay drill for the BM25 ingest topology (foreachBatch
    callables take plain DataFrames, so this drives the callable
    directly, batch ids included): batch 1's first attempt is killed
    between the postings commit and the dfreq swap; the REPLAY of
    batch 1 (at-least-once contract — the torn attempt never reached
    the checkpoint) repairs the torn store and re-appends; a further
    replay of the now-committed batch no-ops. The final index is
    bit-identical to a batch build. A second drill tears the
    BOOTSTRAP (manifest write killed) and shows the replay rebuilds
    from nothing."""
    import os

    import pytest as _pytest

    import mmlspark_spark.llm.export as export_mod
    import mmlspark_spark.llm.retrieval as retrieval_mod
    from mmlspark_spark.llm import BM25Retriever
    from mmlspark_spark.streaming import bm25_ingest_foreach_batch

    b0 = spark.createDataFrame(
        [(i, f"apple banana w{i % 5} cherry") for i in range(10)],
        "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(10 + i, f"banana date w{i % 3} apple") for i in range(8)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "apple cherry"), (1, "banana date")],
        "query_id long, query string")
    bm = BM25Retriever(k=5)
    p = str(tmp_path / "torn_ingest_idx")
    seen = []
    ingest = bm25_ingest_foreach_batch(
        bm, p, on_batch=lambda bid, n: seen.append((bid, n)))

    ingest(b0, 0)
    real_swap = retrieval_mod._replace_flat_store

    def killed(df, store_path):
        raise RuntimeError("injected crash before the dfreq swap")

    monkeypatch.setattr(retrieval_mod, "_replace_flat_store", killed)
    with _pytest.raises(RuntimeError, match="injected crash"):
        ingest(b1, 1)
    monkeypatch.setattr(retrieval_mod, "_replace_flat_store",
                        real_swap)
    assert os.path.exists(os.path.join(p, "_append_pending.json"))

    ingest(b1, 1)  # replay: repairs the torn store, re-appends
    ingest(b1, 1)  # replay of the committed batch: no-op growth
    assert seen == [(0, 10), (1, 8), (1, 8)]
    assert os.path.exists(os.path.join(p, "_append_committed_1.json"))

    streamed = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, p), queries).collect()))
    fresh = sorted(map(tuple,
                       bm.search(b0.unionByName(b1),
                                 queries).collect()))
    assert streamed == fresh and len(streamed) > 0

    # --- torn-bootstrap drill: save_index's manifest write (its
    # last step) is killed, so batch 0 leaves a pending bootstrap
    # marker and half an artifact; the replay deletes it wholesale
    # and re-bootstraps
    p2 = str(tmp_path / "torn_bootstrap_idx")
    ingest2 = bm25_ingest_foreach_batch(bm, p2)
    real_write = export_mod._fs_write_text

    def kill_manifest(spark_, path_, content):
        if path_.endswith("_bm25_manifest.json"):
            raise RuntimeError("injected crash during bootstrap")
        return real_write(spark_, path_, content)

    monkeypatch.setattr(export_mod, "_fs_write_text", kill_manifest)
    with _pytest.raises(RuntimeError, match="during bootstrap"):
        ingest2(b0, 0)
    monkeypatch.setattr(export_mod, "_fs_write_text", real_write)
    assert os.path.exists(os.path.join(p2, "_append_pending.json"))
    assert not os.path.exists(
        os.path.join(p2, "_bm25_manifest.json"))

    ingest2(b0, 0)  # replay: wipes the half-bootstrap, rebuilds
    ingest2(b1, 1)
    streamed2 = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, p2), queries).collect()))
    assert streamed2 == fresh


def test_neardup_screen_generic_over_embedding_family(spark, tmp_path):
    """The screen callable is family-generic: the embedding dedup
    names its pair columns (id_a, id_b), not (doc_a, doc_b) — the
    wrapper flags by the FIRST pair column, whatever the family calls
    it. foreachBatch callables take plain DataFrames, so this drives
    the callable directly (no stream needed): batch 1 bootstraps,
    batch 2's planted duplicate vector is flagged and withheld."""
    import numpy as np

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    rng = np.random.default_rng(97)
    x = rng.normal(size=(10, 8))
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    def df(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    b1 = df([(i, [float(v) for v in x[i]]) for i in range(5)])
    b2 = df([(100, [float(v) for v in x[2]]),          # dup of id 2
             (101, [float(v) for v in x[7]])])          # fresh
    seen = {}

    def on_batch(bid, pairs, survivors):
        seen[bid] = ({tuple(r)[:2] for r in pairs.collect()},
                     {r.vec_id for r in survivors.collect()})

    screen = neardup_screen_foreach_batch(
        EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                              threshold=0.9, method="lsh",
                              numPlanes=16, bands=8,
                              maxBucketSize=None),
        str(tmp_path / "emb_screen"), "vec_id", on_batch=on_batch)
    screen(b1, 0)
    screen(b2, 1)
    assert seen[0] == (set(), {0, 1, 2, 3, 4})
    assert {a for a, _ in seen[1][0]} == {100}
    assert (100, 2) in seen[1][0]
    assert seen[1][1] == {101}
    # survivor appended: a third batch matches it
    b3 = df([(200, [float(v) for v in x[7]])])
    screen(b3, 2)
    assert (200, 101) in seen[2][0]


def test_neardup_screen_exact_family(spark, tmp_path):
    """The EXACT registry family drives the SAME generic screen
    wrapper (save/append/load/match + MATCH_BATCH_COL + match_schema
    — no family-specific code): batch 1 bootstraps the content-hash
    registry, batch 2's verbatim re-crawl is flagged and withheld,
    its fresh row is appended, and batch 3 matches the appended
    row."""
    from mmlspark_spark.llm.dedup import IncrementalDeduplicator
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    seen = {}

    def on_batch(bid, pairs, survivors):
        seen[bid] = ({tuple(r) for r in pairs.collect()},
                     {r.doc_id for r in survivors.collect()})

    screen = neardup_screen_foreach_batch(
        IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                bloomBits=1 << 12),
        str(tmp_path / "exact_screen"), "doc_id", on_batch=on_batch)
    screen(df([(0, "alpha"), (1, "beta")]), 0)
    screen(df([(10, "alpha"), (11, "gamma")]), 1)
    screen(df([(20, "gamma")]), 2)
    assert seen[0] == (set(), {0, 1})
    assert seen[0][0] == set()
    assert seen[1][0] == {(10, 0)} and seen[1][1] == {11}
    assert seen[2][0] == {(20, 11)} and seen[2][1] == set()


def test_neardup_bootstrap_pairs_schema_matches_later_batches(
        spark, tmp_path):
    """A verifyExact MinHash dedup's transform schema carries a
    'jaccard' column match_against_index never emits — the
    bootstrap batch's empty pairs frame must use the MATCH schema
    (match_schema), or a schema-pinned sink sees a different pairs
    shape on batch 0 than on every later batch."""
    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    base = ("the quick brown fox jumps over the lazy dog and naps "
            "in the warm afternoon sun for hours on end ")
    b1 = spark.createDataFrame(
        [(1, base * 2), (2, "unrelated first-batch text " * 6)],
        "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(10, (base * 2).replace("quick", "rapid"))],
        "doc_id long, text string")

    dd = MinHashLSHDeduplicator(idCol="doc_id", textCol="text",
                                shingleSize=3, numHashes=16, bands=8,
                                threshold=0.3, verifyExact=True,
                                maxBucketSize=None)
    schemas = {}

    def on_batch(bid, pairs, survivors):
        schemas[bid] = pairs.schema

    screen = neardup_screen_foreach_batch(
        dd, str(tmp_path / "ve_idx"), "doc_id", on_batch=on_batch)
    screen(b1, 0)
    screen(b2, 1)
    assert schemas[0] == schemas[1]
    assert "jaccard" not in schemas[0].fieldNames()
    assert schemas[0].fieldNames() == ["doc_a", "doc_b", "est_jaccard"]
    # and match_schema itself is transform_schema minus the verify col
    assert dd.match_schema(b1.schema).fieldNames() \
        == ["doc_a", "doc_b", "est_jaccard"]
    assert dd.transform_schema(b1.schema).fieldNames() \
        == ["doc_a", "doc_b", "est_jaccard", "jaccard"]


def test_bm25_ingest_refuses_maxdfratio_at_construction(spark):
    """The docstring promise, enforced at the right time: a
    maxDfRatio retriever must be refused when the wrapper is BUILT —
    before the first micro-batch writes a pruned bootstrap index the
    stream would only crash on (inside append_to_index) at batch 2."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever
    from mmlspark_spark.streaming import bm25_ingest_foreach_batch

    with _pytest.raises(ValueError, match="maxDfRatio"):
        bm25_ingest_foreach_batch(
            BM25Retriever(k=5, maxDfRatio=0.5), "/tmp/never_written")


def test_match_batch_col_declared_across_families(spark):
    """Every family the screen wrapper supports declares
    MATCH_BATCH_COL — the batch-side id column of
    match_against_index pairs — and it agrees with the first field
    of the family's pair schema (the old positional convention the
    attribute replaces). A family rename of its pair columns now
    breaks THIS test instead of silently mis-flagging survivors."""
    from mmlspark_spark.llm.dedup import (
        EmbeddingDeduplicator,
        IncrementalDeduplicator,
        MinHashLSHDeduplicator,
        SimHashDeduplicator,
    )
    from mmlspark_spark.llm.multimodal_dedup import (
        AudioFingerprintDeduplicator,
        ImageDHashDeduplicator,
        VideoDHashDeduplicator,
    )

    text_schema = spark.createDataFrame(
        [], "doc_id long, text string").schema
    cases = [
        (MinHashLSHDeduplicator(), "doc_a",
         lambda d: d.match_schema(text_schema)),
        (IncrementalDeduplicator(), "doc_a",
         lambda d: d.match_schema(text_schema)),
        (SimHashDeduplicator(), "doc_a",
         lambda d: d.transform_schema(text_schema)),
        (EmbeddingDeduplicator(), "id_a",
         lambda d: d.transform_schema(spark.createDataFrame(
             [], "vec_id long, embedding array<double>").schema)),
        (VideoDHashDeduplicator(), "doc_a", None),
        (ImageDHashDeduplicator(), "doc_a", None),
        (AudioFingerprintDeduplicator(), "doc_a", None),
    ]
    for dedup, expect, schema_fn in cases:
        assert getattr(dedup, "MATCH_BATCH_COL", None) == expect, \
            type(dedup).__name__
        if schema_fn is not None:
            assert schema_fn(dedup).fieldNames()[0] == expect, \
                type(dedup).__name__


def test_streaming_registry_ingest_drop_semantics(spark, tmp_path):
    """registry_ingest_foreach_batch — strict registry-mode streaming
    ingest (round-13 verdict item 4): batch 1 bootstraps the exact
    registry; batch 2's VERBATIM re-crawls of batch-1 docs never land
    anywhere while its fresh docs append; batch 3 proves batch-2
    survivors joined the registry. Within-batch copies collapse to
    the lowest id. No pair frame exists in this topology — duplicates
    simply vanish."""
    import json as _json
    import os as _os
    import time as _time

    from mmlspark_spark.llm.dedup import IncrementalDeduplicator
    from mmlspark_spark.streaming import registry_ingest_foreach_batch

    src = tmp_path / "reg_src"
    src.mkdir()
    batches = [
        [{"doc_id": 1, "text": "alpha document"},
         {"doc_id": 2, "text": "beta document"},
         {"doc_id": 3, "text": "alpha document"}],   # in-batch copy
        [{"doc_id": 10, "text": "alpha document"},   # re-crawl of 1
         {"doc_id": 11, "text": "gamma document"}],  # fresh
        [{"doc_id": 20, "text": "gamma document"},   # re-crawl of 11
         {"doc_id": 21, "text": "delta document"}],
    ]
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 10, prefixBits=3)
    p = str(tmp_path / "reg_idx")
    landed: dict[int, set] = {}
    ingest = registry_ingest_foreach_batch(
        dd, p,
        on_batch=lambda bid, ok: landed.__setitem__(
            bid, {r.doc_id for r in ok.collect()}))

    now = _time.time()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(_json.dumps(r) for r in rows))
        _os.utime(f, (now + i, now + i))
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = (stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", str(tmp_path / "reg_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert landed == {0: {1, 2}, 1: {11}, 2: {21}}
    reg = spark.read.parquet(f"{p}/hashes")
    assert {r["__id"] for r in reg.select("__id").collect()} \
        == {1, 2, 11, 21}

    # flag-mode deduplicators are refused up front: this topology IS
    # drop semantics
    import pytest as _pytest
    with _pytest.raises(ValueError, match="drop"):
        registry_ingest_foreach_batch(
            IncrementalDeduplicator(keyCols=("text",), mode="flag"), p)


def test_streaming_registry_ingest_replay_is_idempotent(spark,
                                                        tmp_path):
    """foreachBatch replays a micro-batch after a failure
    (at-least-once): a re-run of a batch the registry already
    absorbed must drop everything and append nothing — same registry
    rows, no duplicate hash entries."""
    from mmlspark_spark.llm.dedup import IncrementalDeduplicator
    from mmlspark_spark.llm.index_common import _parquet_row_count
    from mmlspark_spark.streaming import registry_ingest_foreach_batch

    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 10, prefixBits=3)
    p = str(tmp_path / "reg_idx")
    ingest = registry_ingest_foreach_batch(dd, p)

    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], "doc_id long, text string")
    ingest(b0, 0)
    ingest(b1, 1)
    assert _parquet_row_count(spark, f"{p}/hashes") == 3
    ingest(b1, 1)  # crash-replay of the same micro-batch
    assert _parquet_row_count(spark, f"{p}/hashes") == 3
    reg = spark.read.parquet(f"{p}/hashes")
    assert {r["__id"] for r in reg.select("__id").collect()} \
        == {1, 2, 11}


def test_streaming_registry_ingest_empty_first_batch_defers_bootstrap(
        spark, tmp_path):
    """An EMPTY first micro-batch must not bootstrap the registry
    (it would write an empty artifact and push every later batch onto
    the append path); the next non-empty batch bootstraps instead —
    symmetric with the empty-survivors append skip."""
    import os

    from mmlspark_spark.llm.dedup import IncrementalDeduplicator
    from mmlspark_spark.llm.index_common import _parquet_row_count
    from mmlspark_spark.streaming import registry_ingest_foreach_batch

    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 10, prefixBits=3)
    p = str(tmp_path / "reg_idx_empty")
    seen = []
    ingest = registry_ingest_foreach_batch(
        dd, p, on_batch=lambda bid, ok: seen.append((bid, ok.count())))

    empty = spark.createDataFrame([], "doc_id long, text string")
    ingest(empty, 0)
    assert not os.path.exists(p)  # nothing bootstrapped
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    ingest(b1, 1)  # THIS bootstraps
    assert _parquet_row_count(spark, f"{p}/hashes") == 2
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], "doc_id long, text string")
    ingest(b2, 2)  # append path works after the deferred bootstrap
    assert _parquet_row_count(spark, f"{p}/hashes") == 3
    assert seen == [(0, 0), (1, 2), (2, 1)]


def test_streaming_neardup_screen_survives_torn_append(
        spark, tmp_path, monkeypatch):
    """Crash-replay drill for the near-dup screen topology (the
    generic file-append protocol): batch 1's first attempt is killed
    between the signatures and buckets writes; the REPLAY repairs the
    torn store bit-exactly and re-screens + re-appends; a further
    replay of the committed batch re-screens read-only (no index
    growth). A second drill tears the BOOTSTRAP save and shows the
    replay rebuilds from nothing."""
    import os

    import pytest as _pytest

    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    b0 = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog "
             f"variant {i % 3} " * 3) for i in range(10)],
        "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(100, "a wholly new document about streams " * 4),
         (101, "another new document about markers " * 4)],
        "doc_id long, text string")

    dd = MinHashLSHDeduplicator(shingleSize=3, numHashes=16, bands=8,
                                threshold=0.3, maxBucketSize=None)
    p = str(tmp_path / "screen_torn_idx")
    seen = []
    screen = neardup_screen_foreach_batch(
        dd, p, "doc_id",
        on_batch=lambda bid, pairs, ok: seen.append(
            (bid, pairs.count(), ok.count())))

    screen(b0, 0)
    real = MinHashLSHDeduplicator._banded

    # the screen's read-only MATCH also bands the batch (call 1);
    # the kill must land inside the APPEND, after the signatures
    # write (call 2) — the exact between-stores crash window
    calls = {"n": 0}

    def killed(self, sigs):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected crash between store writes")
        return real(self, sigs)

    monkeypatch.setattr(MinHashLSHDeduplicator, "_banded", killed)
    with _pytest.raises(RuntimeError, match="injected crash"):
        screen(b1, 1)
    monkeypatch.setattr(MinHashLSHDeduplicator, "_banded", real)
    assert os.path.exists(os.path.join(p, "_append_pending.json"))

    screen(b1, 1)  # replay: repairs, re-screens, re-appends
    sig_files = sorted(os.listdir(os.path.join(p, "signatures")))
    screen(b1, 1)  # replay of committed batch: read-only re-screen
    assert sorted(os.listdir(os.path.join(p, "signatures"))) \
        == sig_files
    assert os.path.exists(os.path.join(p, "_append_committed_1.json"))
    # both novel docs survived each screen of batch 1; the committed
    # replay re-screens against the grown index where they only
    # self-pair (excluded), so counts repeat
    assert seen == [(0, 0, 10), (1, 0, 2), (1, 0, 2)]
    idx = dd.load_index(spark, p)
    assert {r["__id"] for r in
            idx["signatures"].select("__id").collect()} \
        == set(range(10)) | {100, 101}

    # --- torn-bootstrap drill: the manifest write (save's last step)
    # is killed; the replay wipes the half-bootstrap and rebuilds
    import mmlspark_spark.llm.export as export_mod

    p2 = str(tmp_path / "screen_torn_boot")
    screen2 = neardup_screen_foreach_batch(dd, p2, "doc_id")
    real_write = export_mod._fs_write_text

    def kill_manifest(spark_, path_, content):
        if path_.endswith("_minhash_manifest.json"):
            raise RuntimeError("injected crash during bootstrap")
        return real_write(spark_, path_, content)

    monkeypatch.setattr(export_mod, "_fs_write_text", kill_manifest)
    with _pytest.raises(RuntimeError, match="during bootstrap"):
        screen2(b0, 0)
    monkeypatch.setattr(export_mod, "_fs_write_text", real_write)
    assert os.path.exists(os.path.join(p2, "_append_pending.json"))

    screen2(b0, 0)  # replay: wipes the half-bootstrap, re-saves
    screen2(b1, 1)
    idx2 = dd.load_index(spark, p2)
    assert {r["__id"] for r in
            idx2["signatures"].select("__id").collect()} \
        == set(range(10)) | {100, 101}


def test_streaming_screen_and_bm25_empty_first_batch_defers(
        spark, tmp_path):
    """The same empty-first-batch deferral for the OTHER two ingest
    topologies (round-15 advice): an empty batch 0 must not bootstrap
    the near-dup screen index (the embedding family's save_index
    would crash inferring the vector dim from a first row an empty
    frame lacks) nor the BM25 index (zero-doc stats) — the next
    non-empty batch bootstraps instead."""
    import os

    from mmlspark_spark.llm import BM25Retriever
    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator
    from mmlspark_spark.streaming import (
        bm25_ingest_foreach_batch,
        neardup_screen_foreach_batch,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string")

    # near-dup screen topology
    p = str(tmp_path / "screen_idx_empty")
    seen = []
    screen = neardup_screen_foreach_batch(
        MinHashLSHDeduplicator(idCol="doc_id", textCol="text"), p,
        "doc_id",
        on_batch=lambda bid, pairs, ok: seen.append(
            (bid, pairs.count(), ok.count())))
    screen(empty, 0)
    assert not os.path.exists(p)  # nothing bootstrapped
    screen(b1, 1)  # THIS bootstraps
    assert os.path.exists(p)
    assert seen == [(0, 0, 0), (1, 0, 2)]

    # BM25 ingest topology
    p2 = str(tmp_path / "bm25_idx_empty")
    seen2 = []
    ingest = bm25_ingest_foreach_batch(
        BM25Retriever(k=5), p2,
        on_batch=lambda bid, n: seen2.append((bid, n)))
    ingest(empty, 0)
    assert not os.path.exists(os.path.join(p2, "_bm25_manifest.json"))
    ingest(b1, 1)  # THIS bootstraps
    assert os.path.exists(os.path.join(p2, "_bm25_manifest.json"))
    assert seen2 == [(0, 0), (1, 2)]


def test_streaming_crawl_to_index_pipeline(spark, tmp_path):
    """The complete crawl-to-index streaming topology, end to end:
    WARC segments land in a directory -> read_warc_stream parses
    records per micro-batch -> neardup_screen_foreach_batch screens
    each batch against the persisted MinHash index and appends only
    survivors. Segment 2 carries a verbatim re-crawl of a segment-1
    page (flagged, quarantined) plus a fresh page (survives) — the
    index ends holding exactly the three distinct pages."""
    import gzip
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator
    from mmlspark_spark.sources import read_warc_stream
    from mmlspark_spark.streaming import neardup_screen_foreach_batch

    def rec(uri, body: bytes):
        hdr = (f"WARC/1.0\r\nWARC-Type: resource\r\n"
               f"WARC-Target-URI: {uri}\r\n"
               f"Content-Type: application/octet-stream\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode()
        return gzip.compress(hdr + body + b"\r\n\r\n")

    page1 = b"the quick brown fox jumps over the lazy dog " * 4
    page2 = b"pack my box with five dozen liquor jugs today " * 4
    page3 = b"sphinx of black quartz judge my vow tonight ok " * 4

    src = tmp_path / "crawl"
    src.mkdir()
    now = _time.time()
    f0 = src / "seg-00000.warc.gz"
    f0.write_bytes(rec("http://x.example/1", page1)
                   + rec("http://x.example/2", page2))
    _os.utime(f0, (now, now))
    f1 = src / "seg-00001.warc.gz"
    f1.write_bytes(rec("http://mirror.example/1", page1)  # re-crawl
                   + rec("http://x.example/3", page3))
    _os.utime(f1, (now + 1, now + 1))

    dd = MinHashLSHDeduplicator(idCol="doc_id", textCol="text",
                                shingleSize=3, numHashes=32, bands=16,
                                threshold=0.5)
    idx_path = str(tmp_path / "crawl_idx")
    seen = {}

    def on_batch(bid, pairs, survivors):
        seen[bid] = {"flagged": {r[0] for r in pairs.collect()},
                     "kept": {r.uri for r in
                              survivors.select("uri").collect()}}

    screen = neardup_screen_foreach_batch(dd, idx_path, "doc_id",
                                          on_batch=on_batch)
    recs = read_warc_stream(spark, str(src), payloadAsText=True,
                            maxFilesPerTrigger=1)
    docs = recs.select(
        F.xxhash64("target_uri").alias("doc_id"),
        F.col("target_uri").alias("uri"), "text")
    q = (docs.writeStream.foreachBatch(screen)
         .option("checkpointLocation", str(tmp_path / "crawl_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 2
    assert seen[0]["flagged"] == set()
    assert seen[0]["kept"] == {"http://x.example/1",
                               "http://x.example/2"}
    # the re-crawl of page1 is flagged against the STORED index;
    # only the fresh page survives and appends
    assert len(seen[1]["flagged"]) == 1
    assert seen[1]["kept"] == {"http://x.example/3"}
    sigs = spark.read.parquet(f"{idx_path}/signatures")
    assert sigs.select("__id").distinct().count() == 3


def _ann_vecs(n, dim=8, seed=7, start=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [(start + i, [float(x) for x in rng.normal(size=dim)])
            for i in range(n)]


def test_streaming_ann_ingest_equals_batch_build(spark, tmp_path):
    """ann_ingest_foreach_batch (IVF, bring-your-own quantizer):
    three micro-batches of vectors stream into a cell-partitioned
    IVF store through a real Structured Streaming foreachBatch run —
    batch 0 bootstraps (save_index with the passed centroids),
    batches 1-2 append (assign against the STORED centroids, new
    files only) — then searching the stream-built artifact must
    equal a fresh batch build over everything ingested with the same
    quantizer (the append contract, pinned end-to-end through the
    topology wrapper)."""
    import json as _json
    import os as _os
    import time as _time

    from mmlspark_spark.llm.similarity import IVFKNN
    from mmlspark_spark.streaming import ann_ingest_foreach_batch

    dim = 8
    all_rows = _ann_vecs(30, dim=dim)
    batches = [all_rows[:12], all_rows[12:22], all_rows[22:]]
    src = tmp_path / "ann_src"
    src.mkdir()
    now = _time.time()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(
            _json.dumps({"vec_id": vid, "embedding": v})
            for vid, v in rows))
        _os.utime(f, (now + i, now + i))

    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=5,
                 nlist=4, nProbe=2)
    cent = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(all_rows[:4])],
        "cell int, cvec array<double>")
    p = str(tmp_path / "ann_idx")
    seen = []
    ingest = ann_ingest_foreach_batch(
        ivf, p, centroids=cent,
        on_batch=lambda bid, n: seen.append((bid, n)))
    stream = (spark.readStream
              .schema("vec_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = (stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", str(tmp_path / "ann_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == [(0, 12), (1, 10), (2, 8)]

    queries = spark.createDataFrame(all_rows[:3],
                                    "vec_id long, embedding array<double>")
    streamed = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), queries).collect()))

    p2 = str(tmp_path / "ann_fresh")
    union = spark.createDataFrame(all_rows,
                                  "vec_id long, embedding array<double>")
    ivf.save_index(union, cent, p2)
    fresh = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p2), queries).collect()))
    assert streamed == fresh and len(streamed) > 0


def test_streaming_ann_ingest_lsh_and_first_batch_fit(spark, tmp_path):
    """The wrapper's other two bootstrap shapes, driven directly
    (foreachBatch callables take plain DataFrames): (a) LSHKNN — no
    centroids, the plane grid is fixed by seed+dim, stream-built ==
    fresh; (b) IVF with centroids=None — the coarse quantizer is fit
    ON THE FIRST BATCH (fit_centroids_df) and frozen, so the fresh
    comparison uses the first batch's quantizer too. An empty FIRST
    batch defers the bootstrap (no artifact, no crash on vector-dim
    inference) and the next non-empty batch bootstraps; an empty
    APPEND batch is skipped the same way."""
    from mmlspark_spark.llm.similarity import IVFKNN, LSHKNN
    from mmlspark_spark.streaming import ann_ingest_foreach_batch

    dim = 8
    all_rows = _ann_vecs(24, dim=dim)
    schema = "vec_id long, embedding array<double>"
    b = [spark.createDataFrame(all_rows[:10], schema),
         spark.createDataFrame(all_rows[10:18], schema),
         spark.createDataFrame(all_rows[18:], schema)]
    union = spark.createDataFrame(all_rows, schema)
    queries = spark.createDataFrame(all_rows[:3], schema)
    empty = spark.createDataFrame([], schema)

    # (a) LSH: flat save_index(batch, path) branch
    lsh = LSHKNN(idCol="vec_id", vecCol="embedding", k=5,
                 numPlanes=8, bands=4, seed=11)
    p = str(tmp_path / "lsh_stream")
    seen = []
    ingest = ann_ingest_foreach_batch(
        lsh, p, on_batch=lambda bid, n: seen.append((bid, n)))
    ingest(empty, 0)          # empty first batch: bootstrap deferred
    import os
    assert not os.path.exists(p)
    ingest(b[0], 1)
    ingest(empty, 2)          # empty APPEND batch: skipped, no
    #                           vector-dim inference crash
    ingest(b[1], 3)
    ingest(b[2], 4)
    assert seen == [(0, 0), (1, 10), (2, 0), (3, 8), (4, 6)]
    p2 = str(tmp_path / "lsh_fresh")
    lsh.save_index(union, p2)
    assert (sorted(map(tuple, lsh.search_with_index(
                lsh.load_index(spark, p), queries).collect()))
            == sorted(map(tuple, lsh.search_with_index(
                lsh.load_index(spark, p2), queries).collect())))

    # (b) IVF, centroids=None: quantizer fit on the FIRST batch
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=5,
                 nlist=4, nProbe=2)
    p3 = str(tmp_path / "ivf_fit_stream")
    ingest3 = ann_ingest_foreach_batch(ivf, p3)
    for i, batch in enumerate(b):
        ingest3(batch, i)
    p4 = str(tmp_path / "ivf_fit_fresh")
    ivf.save_index(union, ivf.fit_centroids_df(b[0]), p4)
    got = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p3), queries).collect()))
    assert got == sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p4), queries).collect()))
    assert len(got) > 0


def test_streaming_ann_ingest_survives_torn_append(
        spark, tmp_path, monkeypatch):
    """Crash-replay drill for the ANN ingest topology (same shape as
    the BM25/near-dup drills): batch 1's first attempt is killed
    AFTER its cell files are written but before the commit rename —
    the replay repairs the torn store (deletes every file the
    snapshot never saw, cell directories included) and re-appends; a
    further replay of the committed batch no-ops inside
    append_to_index. A second drill kills the BOOTSTRAP's manifest
    write and shows the replay wipes the half-artifact wholesale and
    re-bootstraps. Final index == fresh build both times."""
    import os

    import pytest as _pytest

    import mmlspark_spark.llm.export as export_mod
    import mmlspark_spark.llm.similarity as sim_mod
    from mmlspark_spark.llm.similarity import IVFKNN
    from mmlspark_spark.streaming import ann_ingest_foreach_batch

    dim = 8
    all_rows = _ann_vecs(20, dim=dim)
    schema = "vec_id long, embedding array<double>"
    b0 = spark.createDataFrame(all_rows[:12], schema)
    b1 = spark.createDataFrame(all_rows[12:], schema)
    union = spark.createDataFrame(all_rows, schema)
    queries = spark.createDataFrame(all_rows[:3], schema)
    cent = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(all_rows[:4])],
        "cell int, cvec array<double>")
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=5,
                 nlist=4, nProbe=2)

    # --- torn APPEND drill
    p = str(tmp_path / "ann_torn_idx")
    ingest = ann_ingest_foreach_batch(ivf, p, centroids=cent)
    ingest(b0, 0)
    real_commit = sim_mod._commit_file_append

    def killed(spark_, path_, batchId=None):
        raise RuntimeError("injected crash before the append commit")

    monkeypatch.setattr(sim_mod, "_commit_file_append", killed)
    with _pytest.raises(RuntimeError, match="injected crash"):
        ingest(b1, 1)
    monkeypatch.setattr(sim_mod, "_commit_file_append", real_commit)
    assert os.path.exists(os.path.join(p, "_append_pending.json"))

    ingest(b1, 1)  # replay: repairs the torn store, re-appends
    ingest(b1, 1)  # replay of the committed batch: no-op growth
    assert os.path.exists(os.path.join(p, "_append_committed_1.json"))

    p2 = str(tmp_path / "ann_torn_fresh")
    ivf.save_index(union, cent, p2)
    streamed = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), queries).collect()))
    assert streamed == sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p2), queries).collect()))
    assert len(streamed) > 0

    # --- torn BOOTSTRAP drill: the manifest write (save_index's
    # last step before tombstone clearing) is killed; the pending
    # BOOTSTRAP marker survives, the replay wipes and re-bootstraps
    p3 = str(tmp_path / "ann_torn_boot")
    ingest3 = ann_ingest_foreach_batch(ivf, p3, centroids=cent)
    real_write = export_mod._fs_write_text

    def kill_manifest(spark_, path_, content):
        if "_ivf_manifest" in path_:
            raise RuntimeError("injected crash in bootstrap")
        return real_write(spark_, path_, content)

    monkeypatch.setattr(export_mod, "_fs_write_text", kill_manifest)
    with _pytest.raises(RuntimeError, match="injected crash"):
        ingest3(b0, 0)
    monkeypatch.setattr(export_mod, "_fs_write_text", real_write)
    assert os.path.exists(os.path.join(p3, "_append_pending.json"))

    ingest3(b0, 0)  # replay: wipes the half-bootstrap, rebuilds
    ingest3(b1, 1)
    p4 = str(tmp_path / "ann_boot_fresh")
    ivf.save_index(union, cent, p4)
    got = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p3), queries).collect()))
    assert got == sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p4), queries).collect()))
