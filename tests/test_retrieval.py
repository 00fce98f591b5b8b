"""BM25 + reciprocal-rank-fusion semantics, hand-computed."""

import math

import pytest
from pyspark.sql import functions as F


def _bm25_part(tf, df, dl, N, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    """Scores must equal the Okapi/Lucene formula computed by hand:
    idf = ln(1 + (N−df+0.5)/(df+0.5)), tf saturation with k1=1.2,
    b=0.75 length normalization."""
    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(0, "apple banana apple"),
         (1, "banana cherry"),
         (2, "cherry cherry cherry durian"),
         (3, None)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "apple cherry")], "query_id long, query string")
    out = {r.doc_id: (r.score, r.rank)
           for r in BM25Retriever(k=10).search(docs, queries).collect()}

    N, avgdl = 3, (3 + 2 + 4) / 3
    exp0 = _bm25_part(2, 1, 3, N, avgdl)           # apple in doc 0
    exp1 = _bm25_part(1, 2, 2, N, avgdl)           # cherry in doc 1
    exp2 = _bm25_part(3, 2, 4, N, avgdl)           # cherry in doc 2
    assert set(out) == {0, 1, 2}
    assert out[0][0] == pytest.approx(exp0, abs=1e-6)
    assert out[1][0] == pytest.approx(exp1, abs=1e-6)
    assert out[2][0] == pytest.approx(exp2, abs=1e-6)
    # rare 'apple' (df=1) outweighs frequent 'cherry' (df=2)
    assert out[0][1] == 1


def test_bm25_stopword_pruning(spark):
    """maxDfRatio drops corpus-wide terms from the index: a query of
    ONLY the stopword matches nothing, and mixed-query scores lose
    exactly the stopword contribution."""
    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"the unique{i}") for i in range(10)],
        "doc_id long, text string")
    q = spark.createDataFrame(
        [(1, "the"), (2, "the unique3")], "query_id long, query string")
    out = BM25Retriever(k=10, maxDfRatio=0.5).search(docs, q).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    assert 1 not in by_q                 # stopword-only query: no hits
    assert by_q[2] == [3]                # rare term still retrieves


def test_rrf_fusion_hand_computed(spark):
    """RRF: doc in both lists beats docs in one; absent source
    contributes 0; 1/(60+rank) exactly."""
    from mmlspark_spark.llm import reciprocal_rank_fusion

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank int")
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank int")
    rows = {r.doc_id: (r.rrf_score, r.rank)
            for r in reciprocal_rank_fusion([a, b]).collect()}
    assert rows[11][0] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert rows[10][0] == pytest.approx(1 / 61, abs=1e-6)
    assert rows[12][0] == pytest.approx(1 / 62, abs=1e-6)
    assert rows[11][1] == 1 and rows[10][1] == 2 and rows[12][1] == 3

    with pytest.raises(ValueError, match="non-empty"):
        reciprocal_rank_fusion([])


def test_rrf_topk_trims_per_query(spark):
    from mmlspark_spark.llm import reciprocal_rank_fusion

    a = spark.createDataFrame(
        [(1, d, d) for d in range(1, 6)] + [(2, 7, 1)],
        "query_id long, doc_id long, rank int")
    out = reciprocal_rank_fusion([a], topK=2).collect()
    got = sorted((r.query_id, r.doc_id) for r in out)
    assert got == [(1, 1), (1, 2), (2, 7)]


def test_bm25_index_roundtrip(spark, tmp_path):
    """save_index → load_index → search_with_index must return the
    EXACT rows search() returns on the source corpus (scores are
    rounded to 6dp pre-rank, so equality is strict), and the stored
    postings must be term-complete."""
    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"apple banana w{i % 7} cherry w{i % 3}") for i in range(40)]
        + [(99, None)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "apple w2"), (1, "cherry banana w5")],
        "query_id long, query string")
    bm = BM25Retriever(k=5)
    path = str(tmp_path / "bm25_idx")
    bm.save_index(docs, path)
    direct = sorted(map(tuple, bm.search(docs, queries).collect()))
    via_idx = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, path), queries).collect()))
    assert direct == via_idx and len(direct) > 0


def test_bm25_index_prunes_stopwords_and_pins_ratio(spark, tmp_path):
    """With maxDfRatio the stopword cut is baked into the STORED
    postings (the cut terms are physically absent), and a retriever
    configured with a different ratio must refuse to load."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"the common{i % 2} rare{i}") for i in range(10)],
        "doc_id long, text string")
    bm = BM25Retriever(k=5, maxDfRatio=0.6)
    path = str(tmp_path / "bm25_pruned")
    bm.save_index(docs, path)
    stored_terms = {r["__t"] for r in
                    spark.read.parquet(f"{path}/postings")
                    .select("__t").distinct().collect()}
    assert "the" not in stored_terms          # df=10 > 0.6·10
    assert any(t.startswith("rare") for t in stored_terms)

    queries = spark.createDataFrame(
        [(0, "the rare3")], "query_id long, query string")
    direct = sorted(map(tuple, bm.search(docs, queries).collect()))
    via_idx = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, path), queries).collect()))
    assert direct == via_idx

    with _pytest.raises(ValueError, match="maxDfRatio"):
        BM25Retriever(k=5, maxDfRatio=0.9).load_index(spark, path)
    with _pytest.raises(ValueError, match="maxDfRatio"):
        BM25Retriever(k=5).load_index(spark, path)


def test_phrase_search_hand_computed(spark):
    """Exact-phrase semantics by hand: consecutive tokens only, all
    occurrences counted, repeated-token phrases handled (each slot
    shifts its own occurrence list), single-token phrase = plain tf,
    absent term = no row."""
    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(0, "big cat sat on the big cat mat"),
         (1, "big dog cat sat"),          # 'big','cat' present, not adjacent
         (2, "the big cat big cat runs"),
         (3, None)],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(100, "big cat"), (200, "cat"), (300, "unicorn horn"),
         (400, "big cat mat")],
        "query_id long, query string")
    out = {(r.query_id, r.doc_id): (r.phrase_tf, r.rank)
           for r in BM25Retriever(k=10).phrase_search(
               docs, phrases).collect()}

    # 'big cat': doc0 at 0 and 5 → tf 2; doc2 at 1 and 3 → tf 2;
    # doc1 has both words, never adjacent → absent
    assert out[(100, 0)] == (2, 1)       # tf ties → doc ASC
    assert out[(100, 2)] == (2, 2)
    assert (100, 1) not in out
    # single token = plain occurrence count
    assert out[(200, 0)] == (2, 1)
    assert out[(200, 1)][0] == 1 and out[(200, 2)][0] == 2
    # absent terms → no rows at all
    assert not any(q == 300 for q, _ in out)
    # 3-token phrase 'big cat mat': only doc0 pos 5 → tf 1
    assert out[(400, 0)] == (1, 1)
    assert not any(q == 400 and d != 0 for q, d in out)


def test_phrase_search_matches_python_reference_on_random_corpora(spark):
    """Property check: on a randomized small-alphabet corpus (alphabet
    size 4 → dense n-gram collisions), phrase_search must equal a
    brute-force pure-Python scan for every (phrase, doc): same member
    set, same phrase_tf."""
    import numpy as np

    from mmlspark_spark.llm import BM25Retriever

    rng = np.random.default_rng(53)
    alpha = ["aa", "bb", "cc", "dd"]
    docs_py = {i: [alpha[j] for j in rng.integers(0, 4, size=rng.integers(3, 20))]
               for i in range(30)}
    phrases_py = {}
    for pid in range(8):
        ln = int(rng.integers(1, 4))
        phrases_py[pid] = [alpha[j] for j in rng.integers(0, 4, size=ln)]

    def count_occurrences(doc, ph):
        return sum(1 for s in range(len(doc) - len(ph) + 1)
                   if doc[s:s + len(ph)] == ph)

    want = {}
    for pid, ph in phrases_py.items():
        for did, doc in docs_py.items():
            tf = count_occurrences(doc, ph)
            if tf > 0:
                want[(pid, did)] = tf

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs_py.items()],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(p, " ".join(t)) for p, t in phrases_py.items()],
        "query_id long, query string")
    got = {(r.query_id, r.doc_id): r.phrase_tf
           for r in BM25Retriever(k=1000).phrase_search(
               docs, phrases).collect()}
    assert got == want


def test_phrase_index_roundtrip(spark, tmp_path):
    """save_index(positions=True) → load_index →
    phrase_search_with_index must return the EXACT rows
    phrase_search returns on the source corpus (positions are
    deterministic integers), the tf-postings derived from positions
    must equal the direct build (search round-trips too), and an
    index saved WITHOUT positions must refuse phrase search."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} alpha beta gamma w{i % 3}")
         for i in range(30)] + [(99, None)],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (2, "gamma alpha")],
        "query_id long, query string")
    bm = BM25Retriever(k=50)
    path = str(tmp_path / "bm25_pos_idx")
    bm.save_index(docs, path, positions=True)

    direct = sorted(map(tuple,
                        bm.phrase_search(docs, phrases).collect()))
    idx = bm.load_index(spark, path)
    via_idx = sorted(map(tuple, bm.phrase_search_with_index(
        idx, phrases).collect()))
    assert direct == via_idx and len(direct) > 0

    # tf postings derived from positions == direct postings build
    queries = spark.createDataFrame(
        [(0, "alpha w2"), (1, "gamma beta w4")],
        "query_id long, query string")
    s_direct = sorted(map(tuple, bm.search(docs, queries).collect()))
    s_idx = sorted(map(tuple,
                       bm.search_with_index(idx, queries).collect()))
    assert s_direct == s_idx and len(s_direct) > 0

    # positions-less artifact refuses phrase search
    path2 = str(tmp_path / "bm25_tf_only")
    bm.save_index(docs, path2)
    with _pytest.raises(ValueError, match="positions=True"):
        bm.phrase_search_with_index(bm.load_index(spark, path2),
                                    phrases)


def test_phrase_index_positions_unpruned_under_maxdfratio(spark, tmp_path):
    """With maxDfRatio the tf postings are pruned but the stored
    POSITIONS keep every term — a phrase containing a stopword must
    still match from the artifact (phrase semantics need all
    tokens)."""
    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"the rare{i} thing") for i in range(10)],
        "doc_id long, text string")
    bm = BM25Retriever(k=5, maxDfRatio=0.5)
    path = str(tmp_path / "bm25_pos_pruned")
    bm.save_index(docs, path, positions=True)
    stored_tf_terms = {r["__t"] for r in
                       spark.read.parquet(f"{path}/postings")
                       .select("__t").distinct().collect()}
    assert "the" not in stored_tf_terms  # df=10 > 0.5*10
    phrases = spark.createDataFrame(
        [(0, "the rare3")], "query_id long, query string")
    got = bm.phrase_search_with_index(
        bm.load_index(spark, path), phrases).collect()
    assert [(r.query_id, r.doc_id, r.phrase_tf) for r in got] \
        == [(0, 3, 1)]


def test_bm25_append_to_index_matches_fresh_union(spark, tmp_path):
    """append_to_index tokenizes only the new docs, appends postings
    (+positions), merges the batch's per-term doc counts into the
    stored dfreq (integer addition — same integers the merged-table
    re-aggregation would produce) and extends the stats over the
    exact stored token sum — searching the appended index must be
    bit-identical to a fresh build over the unioned corpus (scores
    round to 6dp pre-rank, so equality is strict), for BM25 and
    phrase search alike. maxDfRatio artifacts refuse (the cut
    discarded postings under the old N)."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever

    base = spark.createDataFrame(
        [(i, f"apple banana w{i % 7} cherry w{i % 3}") for i in range(30)]
        + [(98, None)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(100 + i, f"banana date w{i % 5} apple") for i in range(15)]
        + [(199, None)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "apple w2"), (1, "cherry banana date")],
        "query_id long, query string")
    phrases = spark.createDataFrame(
        [(0, "apple banana"), (1, "banana date")],
        "query_id long, query string")

    bm = BM25Retriever(k=8)
    p = str(tmp_path / "bm25_grow")
    bm.save_index(base, p, positions=True)
    bm.append_to_index(extra, p)
    idx = bm.load_index(spark, p)
    grown = sorted(map(tuple,
                       bm.search_with_index(idx, queries).collect()))
    grown_ph = sorted(map(tuple, bm.phrase_search_with_index(
        idx, phrases).collect()))

    union = base.unionByName(extra)
    fresh = sorted(map(tuple, bm.search(union, queries).collect()))
    fresh_ph = sorted(map(tuple,
                          bm.phrase_search(union, phrases).collect()))
    assert grown == fresh and len(grown) > 0
    assert grown_ph == fresh_ph and len(grown_ph) > 0
    # new docs actually present in results
    assert any(t[1] >= 100 for t in grown)

    p2 = str(tmp_path / "bm25_pruned_grow")
    bm2 = BM25Retriever(k=8, maxDfRatio=0.6)
    bm2.save_index(base, p2)
    with _pytest.raises(ValueError, match="maxDfRatio"):
        bm2.append_to_index(extra, p2)


def test_bm25_append_never_reads_postings_store(spark, tmp_path):
    """The append cost contract (round 15): append_to_index is
    O(batch + dfreq) — it appends new postings files and merges the
    batch's vocabulary delta into the stored dfreq, but NEVER scans
    the existing postings store (under a micro-batch stream, a
    merged-table re-aggregation would cost O(B·index) across B
    batches). Pinned mechanically: every pre-existing postings part
    file is replaced with garbage bytes between save and append — an
    implementation that read the store would throw, while the delta
    merge must succeed and leave dfreq exactly at old + delta."""
    import glob
    import os

    from mmlspark_spark.llm import BM25Retriever

    base = spark.createDataFrame(
        [(i, f"apple banana w{i % 7} cherry") for i in range(20)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(100 + i, f"banana date w{i % 5}") for i in range(10)],
        "doc_id long, text string")
    bm = BM25Retriever(k=8)
    p = str(tmp_path / "bm25_blind_grow")
    bm.save_index(base, p)
    old_df = {r["__t"]: r["__df"] for r in
              spark.read.parquet(f"{p}/dfreq").collect()}
    expected_delta = {
        r["__t"]: r["d"] for r in
        bm.postings(extra).groupBy("__t")
        .agg(F.count("*").alias("d")).collect()}

    parts = glob.glob(os.path.join(p, "postings", "*.parquet"))
    assert parts, "expected parquet part files in the postings store"
    for f in parts:
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")

    bm.append_to_index(extra, p)  # must not touch the garbage files

    got = {r["__t"]: r["__df"] for r in
           spark.read.parquet(f"{p}/dfreq").collect()}
    want = dict(old_df)
    for t, d in expected_delta.items():
        want[t] = want.get(t, 0) + d
    assert got == want


def test_bm25_torn_append_refused_then_repaired_bit_exact(
        spark, tmp_path, monkeypatch):
    """The append crash-ordering contract (round-16): kill the append
    BETWEEN the postings commit and the dfreq swap — the pending
    marker survives, so load/append/compact REFUSE the store instead
    of silently scoring the half-appended docs with stale statistics;
    repair_index rolls the artifact back to the pre-append state
    bit-exactly (the torn batch's part files drop, dfreq
    re-aggregates to the same integers, stats restore from the
    stashed row), and re-appending the same batch then equals a
    fresh build over the union."""
    import os

    import pytest as _pytest

    import mmlspark_spark.llm.retrieval as retrieval_mod
    from mmlspark_spark.llm import BM25Retriever

    base = spark.createDataFrame(
        [(i, f"apple banana w{i % 7} cherry w{i % 3}") for i in range(25)]
        + [(98, None)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(100 + i, f"banana date w{i % 5} apple") for i in range(12)],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "apple w2"), (1, "cherry banana date")],
        "query_id long, query string")

    bm = BM25Retriever(k=8)
    p = str(tmp_path / "bm25_torn")
    bm.save_index(base, p)
    pre_search = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, p), queries).collect()))
    pre_files = {
        store: sorted(os.listdir(os.path.join(p, store)))
        for store in ("postings", "doclens")}
    pre_dfreq = sorted(map(tuple,
                           spark.read.parquet(f"{p}/dfreq").collect()))
    pre_stats = sorted(map(tuple,
                           spark.read.parquet(f"{p}/stats").collect()))

    real_swap = retrieval_mod._replace_flat_store

    def killed(df, store_path):
        raise RuntimeError("injected crash before the dfreq swap")

    monkeypatch.setattr(retrieval_mod, "_replace_flat_store", killed)
    with _pytest.raises(RuntimeError, match="injected crash"):
        bm.append_to_index(extra, p)
    monkeypatch.setattr(retrieval_mod, "_replace_flat_store",
                        real_swap)

    # the tear is real: postings gained the batch's files, dfreq did
    # not see it, and the pending marker survives
    assert os.path.exists(os.path.join(p, "_append_pending.json"))
    assert sorted(os.listdir(os.path.join(p, "postings"))) \
        != pre_files["postings"]
    assert sorted(map(tuple,
                      spark.read.parquet(f"{p}/dfreq").collect())) \
        == pre_dfreq

    # every reader/mutator refuses the torn store
    for op in (lambda: bm.load_index(spark, p),
               lambda: bm.append_to_index(extra, p),
               lambda: bm.compact_index(spark, p)):
        with _pytest.raises(ValueError, match="torn append"):
            op()

    out = bm.repair_index(spark, p)
    assert out["repaired"] and out["files_removed"] > 0
    # bit-exact rollback: per-doc stores by file inventory, globals
    # by content, search by results
    for store, want in pre_files.items():
        assert sorted(os.listdir(os.path.join(p, store))) == want
    assert sorted(map(tuple,
                      spark.read.parquet(f"{p}/dfreq").collect())) \
        == pre_dfreq
    assert sorted(map(tuple,
                      spark.read.parquet(f"{p}/stats").collect())) \
        == pre_stats
    assert sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, p), queries).collect())) == pre_search

    # the batch simply re-appends, and the grown index equals a
    # fresh build over the union (the exact-append contract holds
    # across the crash/repair cycle)
    bm.append_to_index(extra, p)
    assert not os.path.exists(os.path.join(p, "_append_pending.json"))
    grown = sorted(map(tuple, bm.search_with_index(
        bm.load_index(spark, p), queries).collect()))
    fresh = sorted(map(tuple,
                       bm.search(base.unionByName(extra),
                                 queries).collect()))
    assert grown == fresh and any(t[1] >= 100 for t in grown)

    # repair on a healthy store is a no-op
    assert bm.repair_index(spark, p) == {
        "repaired": False, "files_removed": 0, "batch_id": None}


def test_bm25_append_batch_replay_is_noop(spark, tmp_path):
    """With batchId set (the streaming-ingest path) a fully committed
    append leaves _append_committed_<id>.json, and a REPLAY of the
    same batch (foreachBatch at-least-once delivery) is a no-op — no
    double-counted dfreq, no duplicate postings files."""
    import os

    from mmlspark_spark.llm import BM25Retriever

    base = spark.createDataFrame(
        [(i, f"apple banana w{i % 4}") for i in range(12)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(100 + i, f"banana date w{i % 3}") for i in range(6)],
        "doc_id long, text string")
    bm = BM25Retriever(k=5)
    p = str(tmp_path / "bm25_replay")
    bm.save_index(base, p)

    bm.append_to_index(extra, p, batchId=7)
    assert os.path.exists(
        os.path.join(p, "_append_committed_7.json"))
    files = sorted(os.listdir(os.path.join(p, "postings")))
    dfreq = sorted(map(tuple,
                       spark.read.parquet(f"{p}/dfreq").collect()))
    stats = sorted(map(tuple,
                       spark.read.parquet(f"{p}/stats").collect()))

    bm.append_to_index(extra, p, batchId=7)  # replayed micro-batch
    assert sorted(os.listdir(os.path.join(p, "postings"))) == files
    assert sorted(map(tuple,
                      spark.read.parquet(f"{p}/dfreq").collect())) \
        == dfreq
    assert sorted(map(tuple,
                      spark.read.parquet(f"{p}/stats").collect())) \
        == stats

    # the NEXT batch appends normally and supersedes the marker
    more = spark.createDataFrame(
        [(200, "cherry elderberry")], "doc_id long, text string")
    bm.append_to_index(more, p, batchId=8)
    assert os.path.exists(
        os.path.join(p, "_append_committed_8.json"))
    assert not os.path.exists(
        os.path.join(p, "_append_committed_7.json"))


def test_hybrid_rrf_from_stored_artifacts(spark, tmp_path):
    """The full production hybrid stack composed FROM ARTIFACTS: a
    persisted BM25 index and a persisted IVFPQ index each serve their
    top-k, RRF fuses the rankings — and the fused result equals the
    all-in-memory composition exactly (both stored lanes are pinned
    round-trip-identical, so fusion must be too). This is the
    index-once/search-many shape a retrieval service runs."""
    import numpy as np

    from mmlspark_spark.llm.retrieval import (
        BM25Retriever,
        reciprocal_rank_fusion,
    )
    from mmlspark_spark.llm.similarity import IVFKNN, PQKNN

    rng = np.random.default_rng(67)
    x = rng.normal(size=(80, 16))
    docs = spark.createDataFrame(
        [(i, f"topic{i % 9} body w{i % 4} tail{i % 7}")
         for i in range(80)],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(80)],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(3, "topic3 w3"), (7, "topic7 tail0")],
        "query_id long, query string")
    qvecs = emb.filter("vec_id in (3, 7)")

    bm = BM25Retriever(k=10)
    bp = str(tmp_path / "bm")
    bm.save_index(docs, bp)
    pq = PQKNN(k=10, M=4, K=8)
    cent = IVFKNN(nlist=4).fit_centroids_df(emb)
    cb = pq.fit_codebooks(emb)
    pp = str(tmp_path / "pq")
    pq.save_ivfpq_index(emb, cent, cb, pp)

    sparse_idx = bm.search_with_index(bm.load_index(spark, bp), queries)
    dense_idx = (pq.search_ivfpq_with_index(
        pq.load_ivfpq_index(spark, pp), qvecs, nProbe=2)
        .select("query_id", F.col("neighbor_id").alias("doc_id"),
                "rank"))
    fused_idx = sorted(map(tuple, reciprocal_rank_fusion(
        [sparse_idx.select("query_id", "doc_id", "rank"), dense_idx],
        k=60, topK=10).collect()))

    sparse_mem = bm.search(docs, queries)
    dense_mem = (pq.search_ivfpq(emb, qvecs, cent, cb, nProbe=2)
                 .select("query_id",
                         F.col("neighbor_id").alias("doc_id"), "rank"))
    fused_mem = sorted(map(tuple, reciprocal_rank_fusion(
        [sparse_mem.select("query_id", "doc_id", "rank"), dense_mem],
        k=60, topK=10).collect()))
    assert fused_idx == fused_mem and len(fused_idx) == 2 * 10


def test_bm25_delete_and_compact(spark, tmp_path):
    """BM25 delete lifecycle (the Lucene deleted-docs model): a
    tombstoned doc never surfaces from either search lane; appending
    a tombstoned id refuses; compact_index rewrites postings /
    positions / doclens minus the dead docs, re-aggregates df from
    the compacted postings and subtracts the dead docs' exact
    (count, sum-dl) from stats — after which BOTH lanes are
    bit-identical to a fresh build over the surviving corpus
    (zero-token docs included: they have no postings but do count
    toward N/avgdl, which only the doclens ledger can subtract).
    maxDfRatio artifacts refuse compaction."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame(
        [(i, f"apple banana w{i % 7} cherry w{i % 3}")
         for i in range(30)]
        + [(97, "")] + [(98, None)],   # zero-token + null docs
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "apple w2"), (1, "cherry banana")],
        "query_id long, query string")
    phrases = spark.createDataFrame(
        [(0, "apple banana")], "query_id long, query string")

    bm = BM25Retriever(k=8)
    p = str(tmp_path / "bm25_del")
    bm.save_index(docs, p, positions=True)

    dead_ids = [3, 7, 97]  # includes the zero-token doc
    dead = spark.createDataFrame([(i,) for i in dead_ids],
                                 "doc_id long")
    bm.delete_from_index(dead, p)
    idx = bm.load_index(spark, p)
    masked = bm.search_with_index(idx, queries).collect()
    masked_ph = bm.phrase_search_with_index(idx, phrases).collect()
    assert masked and masked_ph
    assert all(r.doc_id not in dead_ids for r in masked)
    assert all(r.doc_id not in dead_ids for r in masked_ph)

    with _pytest.raises(ValueError, match="tombstone"):
        bm.append_to_index(
            spark.createDataFrame([(3, "apple")],
                                  "doc_id long, text string"), p)

    # compact == fresh build over the survivors, bit-for-bit
    assert bm.compact_index(spark, p) == 3
    idx2 = bm.load_index(spark, p)
    assert idx2["tombstones"] is None
    compacted = sorted(map(tuple,
                           bm.search_with_index(idx2, queries)
                           .collect()))
    compacted_ph = sorted(map(tuple, bm.phrase_search_with_index(
        idx2, phrases).collect()))
    surv = docs.filter(~F.col("doc_id").isin(dead_ids))
    assert compacted == sorted(map(tuple,
                                   bm.search(surv, queries).collect()))
    assert compacted_ph == sorted(map(tuple, bm.phrase_search(
        surv, phrases).collect()))
    # stats subtracted exactly: N counts the null-text doc out, the
    # zero-token doc's removal changed N but not sum-dl
    st = spark.read.parquet(f"{p}/stats").first()
    assert st["__N"] == 28 and st["__avgdl"] == st["__sumdl"] / 28
    # after compaction the ids are free to re-append (kumquat is
    # unique to the re-appended doc, so it MUST surface)
    bm.append_to_index(
        spark.createDataFrame([(3, "kumquat apple")],
                              "doc_id long, text string"), p)
    again = bm.search_with_index(
        bm.load_index(spark, p),
        spark.createDataFrame([(2, "kumquat")],
                              "query_id long, query string"))
    assert [r.doc_id for r in again.collect()] == [3]

    # idempotent / empty cases: compacting with no tombstones is 0
    assert bm.compact_index(spark, p) == 0
    # tombstones naming only unknown ids clear without a rewrite
    bm.delete_from_index(
        spark.createDataFrame([(9999,)], "doc_id long"), p)
    assert bm.compact_index(spark, p) == 0
    assert bm.load_index(spark, p)["tombstones"] is None

    # maxDfRatio artifacts refuse compaction (the cut already
    # discarded postings under the old corpus size)
    p2 = str(tmp_path / "bm25_pruned_del")
    bm2 = BM25Retriever(k=8, maxDfRatio=0.6)
    bm2.save_index(docs, p2)
    bm2.delete_from_index(dead, p2)
    with _pytest.raises(ValueError, match="maxDfRatio"):
        bm2.compact_index(spark, p2)


def test_bm25_save_mode_append_refused(spark, tmp_path):
    """save_index(mode='append') would double-count every shared
    term's df and leave two stats rows — refused with a pointer to
    append_to_index, like every sibling index family."""
    import pytest as _pytest

    from mmlspark_spark.llm import BM25Retriever

    docs = spark.createDataFrame([(1, "a b c")],
                                 "doc_id long, text string")
    bm = BM25Retriever(k=3)
    p = str(tmp_path / "bm25_noappend")
    bm.save_index(docs, p)
    with _pytest.raises(ValueError, match="append_to_index"):
        bm.save_index(docs, p, mode="append")
