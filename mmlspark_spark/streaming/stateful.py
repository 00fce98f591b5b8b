"""Streaming transformation helpers: watermarked windows + custom
stateful operators.

Parity: reference docs ``docs/mmlspark-serving.md:106-110`` — the
reference delegates windowing/stateful logic to Spark's built-ins when
users compose serving pipelines; SURVEY §2.9 maps that surface to
``withWatermark`` + ``F.window``/``F.session_window`` +
``applyInPandasWithState``. These helpers package the idioms (and the
LLM-pipeline streaming aggregations) as reusable operators.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mmlspark_spark.functions.keys import content_hash128


def windowed_agg(df: DataFrame, timeCol: str, window: str,
                 aggs: dict, watermark: str = "10 minutes",
                 slide: str | None = None, keys: tuple = ()) -> DataFrame:
    """Tumbling/sliding window aggregation with late-data watermark.

    ``aggs``: {output_name: Column aggregate}. Works on batch AND
    streaming frames (watermark applied only when streaming).
    """
    if df.isStreaming:
        df = df.withWatermark(timeCol, watermark)
    win = (F.window(timeCol, window, slide) if slide
           else F.window(timeCol, window))
    exprs = [v.alias(k) for k, v in aggs.items()]
    return (df.groupBy(win.alias("window"), *keys)
            .agg(*exprs)
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *keys, *aggs.keys()))


def sessionized_agg(df: DataFrame, timeCol: str, gap: str, aggs: dict,
                    watermark: str = "10 minutes", keys: tuple = ()) -> DataFrame:
    """Session-window aggregation (gap-based), watermarked when streaming."""
    if df.isStreaming:
        df = df.withWatermark(timeCol, watermark)
    exprs = [v.alias(k) for k, v in aggs.items()]
    return (df.groupBy(F.session_window(timeCol, gap).alias("session"), *keys)
            .agg(*exprs)
            .select(F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    *keys, *aggs.keys()))


class RunningCounter:
    """Custom stateful operator: per-key running count + sum maintained
    across micro-batches via ``applyInPandasWithState`` — the PySpark
    surface for the reference's "custom stateful operators" slot
    (SURVEY §2.9; state lives in Spark's state store, so it scales with
    the key space and survives restarts via checkpointing).
    """

    STATE_SCHEMA = "count LONG, total DOUBLE"
    OUTPUT_SCHEMA = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def __init__(self, keyCol: str = "key", valueCol: str = "value"):
        self.keyCol, self.valueCol = keyCol, valueCol

    def apply(self, df: DataFrame) -> DataFrame:
        value_col = self.valueCol

        def update(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            if state.exists:
                count, total = state.get
            else:
                count, total = 0, 0.0
            for pdf in pdfs:
                count += len(pdf)
                total += float(pdf[value_col].sum())
            state.update((count, total))
            yield pd.DataFrame({"key": [key[0]], "count": [count],
                                "total": [total]})

        return (df.groupBy(self.keyCol)
                .applyInPandasWithState(
                    update, outputStructType=self.OUTPUT_SCHEMA,
                    stateStructType=self.STATE_SCHEMA,
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_dedup(df: DataFrame, keyCols, timeCol: str,
                    watermark: str = "10 minutes",
                    hashKeys: bool = True) -> DataFrame:
    """Exact deduplication over a stream: first arrival of each key
    within the watermark horizon passes, later copies drop. The
    streaming face of ``llm.ExactDeduplicator`` — an always-on
    ingestion pipeline dedups as documents arrive instead of in a
    nightly batch.

    State-store discipline (what makes this run forever): the
    watermark bounds how long a key is remembered, so state is
    O(distinct keys per horizon), not O(stream); and with ``hashKeys``
    (default) the state key is a 128-bit content hash over the
    null-safe length-prefixed key serialization shared with
    ``ExactDeduplicator`` (functions/keys.py — multi-arg xxhash64
    would skip null children and collide ('a', NULL) with
    (NULL, 'a')), so each entry costs ~24 B however large the
    document is. Raw multi-KB text as a state key is how streaming
    dedup OOMs at scale.

    Duplicates separated by more than the watermark re-emit (their
    state has been reclaimed) — the horizon is the dedup guarantee,
    choose it per pipeline.
    """
    keys = [keyCols] if isinstance(keyCols, str) else list(keyCols)
    d = df.withWatermark(timeCol, watermark)
    if not hashKeys:
        return d.dropDuplicatesWithinWatermark(keys)
    h1, h2 = content_hash128(keys)
    d = d.withColumn("__dk1", h1).withColumn("__dk2", h2)
    return (d.dropDuplicatesWithinWatermark(["__dk1", "__dk2"])
            .drop("__dk1", "__dk2"))


def streaming_dedup_against_registry(df: DataFrame, registry: DataFrame,
                                     keyCols) -> DataFrame:
    """Drop stream rows whose key already exists in a STATIC registry
    (the historical-corpus face of ``streaming_dedup``, which only
    remembers keys within its own watermark horizon; batch sibling:
    ``llm.IncrementalDeduplicator``). Compose the two for full
    coverage: registry anti-join for everything ingested before the
    stream started, then watermark dedup for in-stream copies.

    Implementation is a stream-static LEFT ANTI join on the 128-bit
    null-safe content hash — Structured Streaming supports
    stream-static equi-joins with no state store AT ALL (the static
    side is re-scannable per micro-batch; persist() it so each batch
    reads the reduced hash frame, not the raw registry). Keys hash
    through functions/keys.py so ('a', NULL) vs (NULL, 'a') never
    collide and the join carries 24 B/row however large the document.
    """
    keys = [keyCols] if isinstance(keyCols, str) else list(keyCols)
    h1, h2 = content_hash128(keys)
    reg = (registry
           .select(h1.alias("__rk1"), h2.alias("__rk2")).distinct())
    d = df.withColumn("__sk1", h1).withColumn("__sk2", h2)
    return (d.join(reg, (F.col("__sk1") == F.col("__rk1"))
                   & (F.col("__sk2") == F.col("__rk2")), "left_anti")
            .drop("__sk1", "__sk2"))


def neardup_screen_foreach_batch(dedup, path: str, idCol: str,
                                 on_batch=None,
                                 appendSurvivors: bool = True):
    """The production ingest topology the stored-index match lanes
    were built for, as ONE ``foreachBatch`` callable: each micro-batch
    is screened against the persisted near-dup index at ``path``
    (MinHash, SimHash/fingerprint, embedding or video — any family
    exposing ``save_index / append_to_index / load_index /
    match_against_index``), and the survivors (rows matching nothing
    already indexed) are appended so LATER batches screen against
    them. The first NON-EMPTY batch bootstraps the index with
    ``save_index`` (empty early batches defer the bootstrap, like the
    registry topology).

    Per batch, ``on_batch(batch_id, pairs, survivors)`` receives the
    flagged (new, indexed) pair frame and the surviving rows — route
    them to quarantine/ingest sinks there. Pairs are eagerly
    materialized (``localCheckpoint``) BEFORE the survivors append
    mutates the store a lazy plan would otherwise re-read — the
    read-from-own-write hazard every compaction lane in this engine
    guards against.

    State discipline at scale: there is NO Spark state store here —
    dedup memory lives in the index artifact (signatures /
    fingerprints / vectors on object storage, grown incrementally),
    so the stream's footprint is one batch at a time however large
    the screened history gets; the batch fingerprints only itself
    (match-lane contract) and deletes/compaction run out-of-band via
    the index's tombstone lanes.

    Use with ``df.writeStream.foreachBatch(...)``::

        screen = neardup_screen_foreach_batch(
            MinHashLSHDeduplicator(...), "/idx/minhash", "doc_id",
            on_batch=lambda bid, pairs, ok: ok.write...)
        stream.writeStream.foreachBatch(screen).start()
    """
    from mmlspark_spark.core.cache import release_intermediates
    from mmlspark_spark.llm.index_common import (
        _begin_file_append,
        _commit_file_append,
        _file_append_committed,
        _hadoop_fs,
        repair_file_append,
    )

    def _bootstrapped(fs, P) -> bool:
        # "index exists" must survive a rolled-back bootstrap (the
        # repair leaves the directory holding only append markers)
        if not fs.exists(P(path)):
            return False
        return any(not st.getPath().getName().startswith("_append_")
                   for st in fs.listStatus(P(path)))

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, P = _hadoop_fs(spark, path)
        # a pending marker means the PREVIOUS attempt at this very
        # batch tore mid-append or mid-bootstrap (single-writer
        # contract; foreachBatch replays the batch whose commit never
        # reached the checkpoint): roll the artifact back bit-exactly
        # and let the replay re-screen + re-append. Combined with the
        # committed-marker skip below, at-least-once delivery becomes
        # exactly-once index growth. A replayed FULLY-committed batch
        # re-screens read-only against the grown index: its own rows
        # only self-pair (excluded by every family), so re-delivered
        # pairs may only ADD near-dup pairs BETWEEN same-batch
        # survivors — the conservative direction for a dedup sink.
        if fs.exists(P(f"{path}/_append_pending.json")):
            repair_file_append(spark, path)
        if not _bootstrapped(fs, P):
            # an EMPTY first batch must not bootstrap (mirrors the
            # registry topology): it would write an empty index and
            # flip all later batches onto the append path — and the
            # embedding family's save_index infers the vector dim
            # from the first row, which an empty frame cannot provide
            if not batch_df.limit(1).count():
                if on_batch is not None:
                    schema = (dedup.match_schema(batch_df.schema)
                              if hasattr(dedup, "match_schema")
                              else dedup.transform_schema(batch_df.schema))
                    on_batch(batch_id,
                             spark.createDataFrame([], schema), batch_df)
                return
            # bracket the bootstrap like an append: a crash mid-save
            # leaves the marker, repair wipes the half-bootstrap, the
            # replayed batch re-bootstraps from nothing
            _begin_file_append(spark, path, batch_id, bootstrap=True)
            dedup.save_index(batch_df, path)
            _commit_file_append(spark, path, batch_id)
            if on_batch is not None:
                # the bootstrap's empty pairs frame must carry the
                # MATCH schema, not transform's: a verifyExact
                # MinHash dedup's transform adds a 'jaccard' column
                # match_against_index never emits, and a
                # schema-pinned sink would break on batch 1
                schema = (dedup.match_schema(batch_df.schema)
                          if hasattr(dedup, "match_schema")
                          else dedup.transform_schema(batch_df.schema))
                on_batch(batch_id,
                         spark.createDataFrame([], schema), batch_df)
            return
        idx = dedup.load_index(spark, path)
        raw = dedup.match_against_index(idx, batch_df)
        pairs = raw.localCheckpoint()  # eager: see docstring
        release_intermediates(raw)
        # the batch side of the pair frame is the family's DECLARED
        # MATCH_BATCH_COL (doc_a for text/video, id_a for
        # embeddings); the positional first-column convention stays
        # only as the fallback for third-party families that predate
        # the attribute
        batch_col = getattr(dedup, "MATCH_BATCH_COL",
                            pairs.columns[0])
        flagged = (pairs.select(F.col(batch_col).alias(idCol))
                   .distinct())
        survivors = batch_df.join(flagged, idCol, "left_anti")
        # a batch that is ALL duplicates appends nothing — and must
        # not reach the appender at all (the embedding family infers
        # its vector dim from the first row, which an empty frame
        # cannot provide); a replayed COMMITTED batch never re-appends
        if (appendSurvivors
                and not _file_append_committed(spark, path, batch_id)
                and survivors.limit(1).count()):
            dedup.append_to_index(survivors, path, batchId=batch_id)
        if on_batch is not None:
            on_batch(batch_id, pairs, survivors)

    return screen


def registry_ingest_foreach_batch(dedup, path: str, on_batch=None,
                                  dedupWithinBatch: bool = True):
    """Strict registry-mode streaming ingest for the EXACT-dedup
    family, as one ``foreachBatch`` callable: each micro-batch is
    screened against the persisted content-hash registry at ``path``
    (``llm.IncrementalDeduplicator`` save/load/transform_with_index/
    append lifecycle) with DROP semantics — rows whose key already
    exists in the registry never land anywhere; novel rows append to
    the registry so later batches (and later days) screen against
    them. No pair frame is emitted: this is the production crawl
    pipeline's "only ever ingest a document once" topology, where
    :func:`neardup_screen_foreach_batch` is the flag-and-quarantine
    one.

    ``dedupWithinBatch`` (default) first collapses copies INSIDE the
    batch (``llm.ExactDeduplicator`` on the same key columns — lowest
    id survives), so a batch carrying the same document twice
    registers it once; the registry then holds one row per distinct
    key however the batches arrived. ``on_batch(batch_id, survivors)``
    receives the rows that actually ingested — route them to the
    corpus sink there.

    Restart safety: a replayed micro-batch (foreachBatch's at-least-
    once contract after a failure) re-screens against the registry
    its first attempt already updated, drops everything it already
    appended, and appends nothing — idempotent. A crash between the
    append's two physical writes leaves a superset bloom and no hash
    rows (append_to_index orders the sidecar first precisely so the
    replay re-appends cleanly). The survivors frame is materialized
    (``localCheckpoint``) BEFORE the append mutates the store it was
    computed from — the read-from-own-write discipline every
    lifecycle consumer follows.

    Use with ``df.writeStream.foreachBatch(...)``::

        ingest = registry_ingest_foreach_batch(
            IncrementalDeduplicator(keyCols=("text",), idCol="doc_id"),
            "/idx/registry",
            on_batch=lambda bid, ok: ok.write...)
        stream.writeStream.foreachBatch(ingest).start()
    """
    from mmlspark_spark.core.cache import release_intermediates
    from mmlspark_spark.llm.dedup import ExactDeduplicator
    from mmlspark_spark.llm.index_common import _hadoop_fs

    if getattr(dedup, "mode", "drop") != "drop":
        raise ValueError(
            "registry_ingest_foreach_batch is drop-semantics by "
            "definition (novel rows ingest, duplicates vanish) — "
            "construct the deduplicator with mode='drop', or use "
            "neardup_screen_foreach_batch for flag topologies")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df
        if dedupWithinBatch:
            batch = ExactDeduplicator(keyCols=dedup.keyCols,
                                      idCol=dedup.idCol).transform(batch)
        fs, P = _hadoop_fs(spark, path)
        if not fs.exists(P(f"{path}/_exact_manifest.json")):
            # an EMPTY first batch must not bootstrap: it would write
            # an empty registry and flip every later batch onto the
            # append path for no reason — symmetric with the
            # empty-survivors skip below (the next non-empty batch
            # bootstraps instead)
            if not batch.limit(1).count():
                if on_batch is not None:
                    on_batch(batch_id, batch)
                return
            dedup.save_index(batch, path)
            survivors = batch
        else:
            raw = dedup.transform_with_index(
                dedup.load_index(spark, path), batch)
            survivors = raw.localCheckpoint()  # eager: see docstring
            release_intermediates(raw)
            if survivors.limit(1).count():
                # batchId stamps the committed replay-guard marker —
                # a replayed committed batch then skips the append
                # without re-paying the registry screen's writes (the
                # re-screen already made replays CORRECT; the marker
                # makes them cheap)
                dedup.append_to_index(survivors, path,
                                      batchId=batch_id)
        if on_batch is not None:
            on_batch(batch_id, survivors)

    return ingest


def bm25_ingest_foreach_batch(retriever, path: str,
                              positions: bool = False,
                              on_batch=None):
    """Streaming BM25 ingest as one ``foreachBatch`` callable: the
    first micro-batch bootstraps the index
    (``BM25Retriever.save_index``), every later batch appends
    incrementally (``append_to_index`` — new docs tokenize alone,
    the new postings' per-term doc counts full-outer-merge into the
    stored dfreq by integer addition, and the stats extend over the
    exact stored token sum, so the stream-built index is
    BIT-identical to a batch build over everything ingested; pinned
    in tests). ``on_batch(batch_id, n_docs)`` reports progress.

    Per-batch cost discipline: the append is O(batch + dfreq) — it
    tokenizes exactly the new documents map-side, appends postings /
    positions as new files, and NEVER re-reads the postings store
    (the dfreq merge joins the batch's vocabulary delta against the
    stored vocabulary frame) — so B micro-batches cost O(B·(batch +
    vocabulary)), not O(B·index). maxDfRatio retrievers refuse (the
    stopword cut is a whole-corpus decision; build those nightly).

    Restart safety (exactly-once index growth over foreachBatch's
    at-least-once delivery, single writer per index path): every
    append brackets its four mutations with the index's pending
    marker and commits by renaming it to the batch's committed
    marker. On replay, a batch whose previous attempt TORE is rolled
    back bit-exactly (``BM25Retriever.repair_index``) and
    re-appended; a batch whose previous attempt fully committed
    no-ops on its committed marker. The stream-built index therefore
    stays bit-identical to a batch build regardless of where a crash
    lands (pinned in tests).

    Compose with :func:`neardup_screen_foreach_batch` upstream to
    index only dedup survivors.
    """
    from mmlspark_spark.llm.index_common import _hadoop_fs

    # refuse HERE, not at batch 2: save_index accepts maxDfRatio, so
    # without this check the first micro-batch would build a pruned
    # index and the stream would only crash inside append_to_index
    # one batch later, leaving a bootstrap-only artifact behind
    if getattr(retriever, "maxDfRatio", None) is not None:
        raise ValueError(
            "bm25_ingest_foreach_batch: maxDfRatio retrievers cannot "
            "ingest incrementally (the stopword cut is a whole-corpus "
            "decision append_to_index refuses) — build those nightly "
            "with save_index, or stream with maxDfRatio=None")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, P = _hadoop_fs(spark, path)
        # a pending marker here means the PREVIOUS attempt at this
        # very batch tore mid-append (foreachBatch replays the batch
        # whose commit never reached the checkpoint — single-writer
        # contract): roll the artifact back to the pre-append state
        # and let the replay re-append. Combined with the committed
        # marker (a replay of a FULLY committed batch no-ops inside
        # append_to_index), at-least-once delivery becomes
        # exactly-once index growth.
        if fs.exists(P(f"{path}/_append_pending.json")):
            retriever.repair_index(spark, path)
        if not fs.exists(P(f"{path}/_bm25_manifest.json")):
            # defer bootstrap past an empty first batch (mirrors the
            # registry/near-dup topologies): an empty save would pin
            # avgdl/N stats on zero docs and flip later batches onto
            # the append path for no reason
            if not batch_df.limit(1).count():
                if on_batch is not None:
                    on_batch(batch_id, 0)
                return
            # bracket the bootstrap like an append: a crash mid-save
            # leaves the marker, repair deletes the half-written
            # artifact wholesale, and the replayed batch re-bootstraps
            retriever._begin_append(spark, path, batch_id,
                                    bootstrap=True)
            retriever.save_index(batch_df, path, positions=positions)
            retriever._commit_append(spark, path, batch_id)
        else:
            retriever.append_to_index(batch_df, path, batchId=batch_id)
        if on_batch is not None:
            on_batch(batch_id, batch_df.count())

    return ingest


def ann_ingest_foreach_batch(knn, path: str, centroids=None,
                             on_batch=None):
    """Streaming VECTOR-INDEX ingest as one ``foreachBatch``
    callable — the similarity-family sibling of
    :func:`bm25_ingest_foreach_batch`, completing the ingest-topology
    matrix (exact registry / near-dup screen / BM25 / ANN): the first
    non-empty micro-batch bootstraps the stored index
    (``save_index``), every later batch appends incrementally
    (``append_to_index`` — new vectors band or cell-assign map-side
    against the FROZEN grid/quantizer; the existing corpus is never
    re-read), so searching the stream-built artifact equals a fresh
    build over everything ingested exactly (the families' pinned
    append contract, here pinned end-to-end through the wrapper).

    Works with any family exposing ``save_index / append_to_index /
    load_index`` over a single artifact directory:

    - :class:`~mmlspark_spark.llm.similarity.IVFKNN` — pass
      ``centroids`` (a ``(cell, cvec)`` frame) for the
      bring-your-own-quantizer production shape, or leave it None to
      fit the coarse quantizer ON THE FIRST BATCH
      (``fit_centroids_df`` — deterministic hash-ranked seeding).
      Either way the quantizer is fixed at bootstrap, the faiss
      operating model: inverted lists grow, the quantizer never
      drifts mid-stream.
    - :class:`~mmlspark_spark.llm.similarity.LSHKNN` — no centroids
      (the plane grid is fixed by seed+dim); grid/dim mismatches are
      refused by the family's own manifest check.

    ``on_batch(batch_id, n_vectors)`` reports progress.

    Restart safety (exactly-once index growth over foreachBatch's
    at-least-once delivery, single writer per index path): appends
    bracket themselves with the family's pending/committed markers —
    a replayed batch whose previous attempt TORE is rolled back
    bit-exactly (``repair_file_append``) and re-appended, one whose
    previous attempt fully committed no-ops; the bootstrap is
    bracketed the same way, so a crash mid-save is wiped wholesale
    and rebuilt on replay (crash drills pinned in tests, same shape
    as the BM25/near-dup topologies).

    Per-batch cost: O(batch) assignment + new files in the store —
    never a function of index size (the 100x append probes; for the
    streaming wrappers themselves, the sf1 topology anchor).
    Compose with :func:`neardup_screen_foreach_batch` upstream to
    index only dedup survivors; deletes/compaction run out-of-band
    via the family's tombstone lanes.
    """
    from mmlspark_spark.llm.index_common import (
        _begin_file_append,
        _commit_file_append,
        _hadoop_fs,
        repair_file_append,
    )

    def _bootstrapped(fs, P) -> bool:
        # "index exists" must survive a rolled-back bootstrap (the
        # repair leaves only append markers behind)
        if not fs.exists(P(path)):
            return False
        return any(not st.getPath().getName().startswith("_append_")
                   for st in fs.listStatus(P(path)))

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, P = _hadoop_fs(spark, path)
        # pending marker == the PREVIOUS attempt at this very batch
        # tore mid-append or mid-bootstrap (single-writer contract):
        # roll back bit-exactly, let the replay redo the batch
        if fs.exists(P(f"{path}/_append_pending.json")):
            repair_file_append(spark, path)
        if not _bootstrapped(fs, P):
            # defer bootstrap past an empty first batch (all four
            # topologies share this): an empty save would crash
            # vector-dim inference from the first row, and a
            # first-batch centroid fit over zero vectors is undefined
            if not batch_df.limit(1).count():
                if on_batch is not None:
                    on_batch(batch_id, 0)
                return
            _begin_file_append(spark, path, batch_id, bootstrap=True)
            if centroids is not None:
                knn.save_index(batch_df, centroids, path)
            elif hasattr(knn, "fit_centroids_df"):
                knn.save_index(batch_df,
                               knn.fit_centroids_df(batch_df), path)
            else:
                knn.save_index(batch_df, path)
            _commit_file_append(spark, path, batch_id)
        else:
            # an EMPTY append batch must not reach the appender: the
            # LSH family infers the vector dim from the first row,
            # which an empty frame cannot provide (the near-dup
            # screen wrapper's survivors guard, same reason) — and
            # skipping before any marker write keeps the no-op
            # replayable for free
            if not batch_df.limit(1).count():
                if on_batch is not None:
                    on_batch(batch_id, 0)
                return
            # append_to_index brackets itself and no-ops on the
            # batch's committed marker (replay of a committed batch)
            knn.append_to_index(batch_df, path, batchId=batch_id)
        if on_batch is not None:
            on_batch(batch_id, batch_df.count())

    return ingest
