"""Hot-key caps in the dedup pair-generation paths.

The 100 TB failure mode: one boilerplate shingle (or LSH bucket) shared
by L docs expands to L² pairs — inside a single row's array for
ngram_jaccard (AQE cannot split a row), or as an L² self-join blow-up
for the banded LSH paths. These tests plant exactly that pathology and
assert the caps neutralize it while rare-key (true-similarity) pairs
survive.
"""

import pytest
from pyspark.sql import functions as F

BOILER = "the quick brown fox jumps"          # one 5-gram shingle
RARE = "zeta omega kappa sigma lambda"        # shared by exactly 2 docs


def _hot_corpus(spark, n_docs):
    """n_docs docs sharing only BOILER's shingles, plus 2 docs sharing
    RARE. Per-doc unique tokens keep boundary-crossing shingles unique."""
    rows = [(i, f"{BOILER} u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(n_docs)]
    rows += [(90001, f"{RARE} r1a r1b r1c r1d r1e"),
             (90002, f"{RARE} r2a r2b r2c r2d r2e")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_jaccard_hot_shingle_cap(spark):
    from mmlspark_spark.llm.dedup import ngram_jaccard_pairs

    docs = _hot_corpus(spark, 1000)
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=5,
                              maxDocsPerShingle=50).collect()
    got = {(r.doc_a, r.doc_b) for r in out}
    # The 1000-doc boilerplate shingle is dropped: no pair among the hot
    # docs (C(1000,2)=499500 would otherwise materialize in one row).
    assert got == {(90001, 90002)}
    # Jaccard over the reduced shingle universe: the rare pair shares
    # exactly its RARE shingle; each doc has 5 surviving shingles... the
    # boundary shingles are unique-per-doc, so 1 shared of (6+6-1)=11.
    (pair,) = out
    assert abs(pair.jaccard - 1 / 11) < 1e-9


def test_ngram_jaccard_uncapped_matches_exact(spark):
    from mmlspark_spark.llm.dedup import ngram_jaccard_pairs

    docs = _hot_corpus(spark, 40)
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=5).collect()
    # Without a cap the hot shingle really does emit every pair.
    assert len(out) == 40 * 39 // 2 + 1


@pytest.mark.parametrize("cap,expect_hot", [(100, False), (None, True)])
def test_minhash_bucket_cap(spark, cap, expect_hot):
    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator

    n = 300 if cap else 80   # keep the uncapped quadratic case small
    rows = [(i, BOILER + " shared body text for every member here")
            for i in range(n)]
    rows += [(90001, f"{RARE} extra tail one two three four five six"),
             (90002, f"{RARE} extra tail one two three four five seven")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    stage = MinHashLSHDeduplicator(idCol="doc_id", textCol="text",
                                   shingleSize=3, numHashes=16, bands=8,
                                   threshold=0.2, maxBucketSize=cap)
    got = {(r.doc_a, r.doc_b) for r in stage.transform(docs).collect()}
    hot_pairs = {p for p in got if p[0] < 90000 and p[1] < 90000}
    assert bool(hot_pairs) == expect_hot
    if not expect_hot:
        # the identical-doc flood is bounded out, the rare near-dup stays
        assert got == {(90001, 90002)}


def test_simhash_bucket_cap(spark):
    from mmlspark_spark.llm.dedup import SimHashDeduplicator

    rows = [(i, BOILER + " shared body text for every member here")
            for i in range(300)]
    rows += [(90001, f"{RARE} tail common words one two three four"),
             (90002, f"{RARE} tail common words one two three five")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    stage = SimHashDeduplicator(idCol="doc_id", textCol="text", bands=4,
                                maxHammingDistance=16, maxBucketSize=100)
    got = {(r.doc_a, r.doc_b) for r in stage.transform(docs).collect()}
    assert (90001, 90002) in got
    assert not {p for p in got if p[0] < 90000 and p[1] < 90000}


def test_embedding_lsh_bucket_cap(spark):
    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    # 200 identical vectors (one hot bucket) + one planted near-dup pair
    # pointing the other way.
    hot = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(200)]
    rare = [(90001, [0.0, 1.0, 0.0, 0.0]), (90002, [0.0, 0.999, 0.01, 0.0])]
    df = spark.createDataFrame(hot + rare, ["vec_id", "embedding"])
    stage = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                                  threshold=0.9, method="lsh",
                                  numPlanes=8, bands=4, maxBucketSize=50)
    got = {(r.id_a, r.id_b) for r in stage.transform(df).collect()}
    assert (90001, 90002) in got
    assert not {p for p in got if p[0] < 90000 and p[1] < 90000}


def test_drop_metric_observed(spark):
    """The dropped-bucket count is a real NAMED observed metric on the
    executed plan (QueryExecutionListener-visible), emitted by the
    bucket groupBy that also applies the cap."""
    from mmlspark_spark.llm.dedup import MinHashLSHDeduplicator

    docs = [(i, "flood flood text identical every time " * 4)
            for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=3, numHashes=16,
        bands=4, threshold=0.1, maxBucketSize=10).transform(df)
    assert out.collect() == []  # every bucket exceeds the cap → dropped
    # the drop counter is a named CollectMetrics node in the plan —
    # exactly what a QueryExecutionListener receives per execution
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "minhash_hot_bucket_drops" in plan
    assert "dropped_buckets" in plan


def test_connected_components_both_paths(spark):
    """Union-find (driver path) and min-label propagation (distributed
    path) must agree with each other and with the hand-computed
    components: {1,2,3,4} chained, {10,11}, {20} self-loop."""
    from mmlspark_spark.llm import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11), (20, 20)],
        ["doc_a", "doc_b"])
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}

    small = {r.node: r.component
             for r in connected_components(edges).collect()}
    assert small == expected
    # force the distributed path with a zero threshold
    big = {r.node: r.component
           for r in connected_components(
               edges, driverCollectThreshold=0).collect()}
    assert big == expected


def test_resolve_duplicate_clusters(spark):
    """One survivor (min id) per cluster; non-survivors dropped."""
    from mmlspark_spark.llm import resolve_duplicate_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (30, 31)], ["doc_a", "doc_b"])
    rows = {r.doc_id: r for r in
            resolve_duplicate_clusters(pairs).collect()}
    assert {d: r.component for d, r in rows.items()} == \
        {5: 5, 7: 5, 9: 5, 30: 30, 31: 30}
    assert {d for d, r in rows.items() if r.is_kept} == {5, 30}


def test_connected_components_nonconvergence_raises(spark):
    """The distributed path must raise on maxIter exhaustion, not
    return silently-wrong labels (a 5-chain needs >1 round)."""
    import pytest as _pytest

    from mmlspark_spark.llm import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9, 0, -1)], ["doc_a", "doc_b"])
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, maxIter=1, driverCollectThreshold=0)
    # and succeed with enough rounds — every node labeled 1
    ok = connected_components(chain, maxIter=15, driverCollectThreshold=0)
    assert {r.component for r in ok.collect()} == {1}


def test_quality_filter_rules_and_reasons(spark):
    """Each rule fires on its crafted document, in order; clean text
    keeps with a NULL reason; reason audit is a groupBy away."""
    from pyspark.sql import functions as F

    from mmlspark_spark.llm import QualityFilter

    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field of tall green grass today ") * 3
    docs = [
        (1, good),
        (2, "tiny"),                                  # too_short
        (3, "word " * 8),                             # too_few_tokens
        (4, "!!! ??? *** " * 12),                     # punct_heavy
        (5, ("same line of text here\n" * 10)),       # repetitious
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = QualityFilter(minChars=30, minTokens=10, maxPunctRatio=0.2,
                        maxDupLineFraction=0.5).transform(df)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].keep and rows[1].reason is None
    assert rows[2].reason == "too_short"
    assert rows[3].reason == "too_few_tokens"
    assert rows[4].reason == "punct_heavy"
    assert rows[5].reason == "repetitious"
    assert all(not rows[i].keep for i in (2, 3, 4, 5))
    audit = {r.reason: r["count"] for r in
             out.groupBy("reason").count().collect()}
    assert audit == {None: 1, "too_short": 1, "too_few_tokens": 1,
                     "punct_heavy": 1, "repetitious": 1}


def test_duplicated_substring_spans_planted(spark):
    """Planted copies: a 60-char block shared by two docs must come
    back as one maximal span in EACH doc at the exact 1-based
    positions; unique text yields nothing; crossDocOnly excludes a
    doc's internal self-repeat."""
    from mmlspark_spark.llm.dedup import duplicated_substring_spans

    block = "X" * 25 + "shared boilerplate body " + "Y" * 11  # 60 chars
    assert len(block) == 60
    uniq1 = "a quiet unrelated sentence with its own words only here"
    uniq2 = "completely different filler content nothing repeats twice"
    docs = [
        (1, uniq1 + block + uniq1.upper()),          # block at 56..115
        (2, block + uniq2),                          # block at 1..60
        (3, "standalone text that appears in no other corpus document"),
        (4, "Z" * 45 + "Z" * 45),                    # self-repeat only
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    rows = duplicated_substring_spans(df, k=40, crossDocOnly=True).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert spans[1] == [(len(uniq1) + 1, len(uniq1) + 60)]
    assert spans[2] == [(1, 60)]
    assert 3 not in spans
    assert 4 not in spans  # self-repeat excluded by crossDocOnly

    # default (any repeat) also marks doc 4's internal repetition
    all_spans = {r.doc_id for r in
                 duplicated_substring_spans(df, k=40).collect()}
    assert 4 in all_spans and 3 not in all_spans


def test_exact_dedup_null_and_separator_safety(spark):
    """Key serialization must not collapse distinct keys: ('a', NULL)
    vs (NULL, 'a') and separator-straddling values are all distinct;
    true duplicates still dedup."""
    from pyspark.sql import types as T

    from mmlspark_spark.llm import ExactDeduplicator

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("c1", T.StringType()),
        T.StructField("c2", T.StringType())])
    rows = [
        (1, "a", None), (2, None, "a"),          # null-position pair
        (3, "x\x1fy", "z"), (4, "x", "y\x1fz"),  # separator straddle
        (5, "dup", "dup"), (6, "dup", "dup"),    # a real duplicate
        (7, None, None), (8, "", ""),            # null vs empty
    ]
    df = spark.createDataFrame(rows, schema)
    kept = sorted(r.doc_id for r in
                  ExactDeduplicator(keyCols=["c1", "c2"], idCol="doc_id")
                  .transform(df).collect())
    assert kept == [1, 2, 3, 4, 5, 7, 8]  # only the real dup dropped


def test_minhash_verify_exact_is_candidate_bounded(spark):
    """verifyExact computes true Jaccard for the LSH candidates and
    filters on it — values must agree with the full exact operator."""
    from mmlspark_spark.llm import MinHashLSHDeduplicator, ngram_jaccard_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    docs = [(1, base), (2, base + " exactly"), (3, "completely different "
            "words that share no shingles with anything here at all "
            "ever in any way shape or form truly")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = MinHashLSHDeduplicator(
        numHashes=32, bands=16, threshold=0.3, verifyExact=True,
        shingleSize=5).transform(df)
    rows = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    assert (1, 2) in rows
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(
        df, n=5, minJaccard=0.0).collect()}
    assert rows[(1, 2)] == pytest.approx(exact[(1, 2)])
    assert all(j >= 0.3 for j in rows.values())


def test_simhash_non_divisor_bands(spark):
    """bands that do not divide 64 must still bucket ALL fingerprint
    bits: identical docs collide at hamming 0 and the operator runs
    without silently ignoring the top bits."""
    from mmlspark_spark.llm import SimHashDeduplicator

    text = ("some reasonably long sentence with enough words to give "
            "the fingerprint plenty of token votes today")
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "another unrelated piece of prose "
          "entirely about different things altogether")],
        ["doc_id", "text"])
    out = SimHashDeduplicator(bands=5, maxHammingDistance=3).transform(df)
    rows = {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}
    assert rows.get((1, 2)) == 0


def test_incremental_dedup_exactness_and_nulls(spark):
    """Bloom-routed two-phase result must be byte-identical to the
    plain anti join (bloomBits=0), including NULL keys and at a
    deliberately tiny bloom (high FP rate -> confirm join does real
    work)."""
    from mmlspark_spark.llm import IncrementalDeduplicator

    ref = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(0, 200, 3)] + [(999, None)],
        "doc_id long, text string")
    inc = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(80)] + [(500, None), (501, "new")],
        "doc_id long, text string")
    for bits in (0, 64 * 4, 1 << 12):   # none / tiny (FP-heavy) / normal
        out = IncrementalDeduplicator(
            referenceDf=ref, keyCols=["text"], mode="drop",
            bloomBits=bits).transform(inc)
        got = sorted(r.doc_id for r in out.collect())
        expect = sorted([i for i in range(80) if i % 3 != 0] + [501])
        assert got == expect, bits
    flagged = IncrementalDeduplicator(
        referenceDf=ref, keyCols=["text"], mode="flag",
        bloomBits=1 << 12).transform(inc)
    assert flagged.columns == ["doc_id", "text", "is_duplicate"]
    dup_ids = sorted(r.doc_id for r in
                     flagged.filter("is_duplicate").collect())
    assert dup_ids == [i for i in range(80) if i % 3 == 0] + [500]


def test_incremental_dedup_bloom_negatives_skip_the_join(spark):
    """The scale contract: rows the bloom rejects must never reach a
    KEY join against the reference — the only LeftAnti (confirm)
    join hangs under the candidate branch. The bitset itself attaches
    as a ONE-ROW Cross join per union branch (the broadcast ratio-row
    pattern — a single comparison per probe row, no shuffle), which
    is exactly what the plan should show instead of an equi-join."""
    from mmlspark_spark.llm import IncrementalDeduplicator

    ref = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    inc = spark.createDataFrame([(1, "a"), (2, "b")],
                                "doc_id long, text string")
    out = IncrementalDeduplicator(
        referenceDf=ref, keyCols=["text"], mode="drop",
        bloomBits=1 << 10).transform(inc)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one union of (map-only filter branch, confirm-join branch):
    # exactly ONE key join (the confirm anti join); every other Join
    # node is the one-row bitset Cross attach
    assert plan.count("Join LeftAnti") == 1
    assert plan.count("Join") == plan.count("Join LeftAnti") \
        + plan.count("Join Cross")
    assert "Union" in plan
    assert sorted(r.doc_id for r in out.collect()) == [2]


def test_incremental_dedup_validation(spark):
    from mmlspark_spark.llm import IncrementalDeduplicator

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mode"):
        IncrementalDeduplicator(mode="purge")
    with _pytest.raises(ValueError, match="multiple of 64"):
        IncrementalDeduplicator(bloomBits=100)


def test_heavy_hitters_exact_topk(spark):
    """Hand-computed frequencies, tie-break by value, minCount gate,
    and the no-global-sort plan (TakeOrderedAndProject)."""
    from mmlspark_spark.operators import HeavyHitters

    df = spark.createDataFrame(
        [("a a a b b c",), ("b c d",), ("a e",)], ["text"])
    out = HeavyHitters(inputCol="text", k=3, tokenize=True).transform(df)
    assert [(r.value, r.cnt) for r in out.collect()] == [
        ("a", 4), ("b", 3), ("c", 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")
    gated = HeavyHitters(inputCol="text", k=10, tokenize=True,
                         minCount=2).transform(df)
    assert {r.value for r in gated.collect()} == {"a", "b", "c"}
    # untokenized mode counts whole values
    vals = spark.createDataFrame([("x",), ("x",), ("y",)], ["text"])
    out2 = HeavyHitters(inputCol="text", k=1).transform(vals)
    assert [(r.value, r.cnt) for r in out2.collect()] == [("x", 2)]


def test_line_dedup_removes_boilerplate_preserves_order(spark):
    """Footer present in >maxDocFrequency docs is removed everywhere;
    per-doc lines keep their original order; all-boilerplate docs drop
    (or survive empty with dropEmpty=False); normalize=True folds
    case/whitespace for the frequency count but rewrites originals."""
    from mmlspark_spark.llm import LineDeduplicator

    rows = [(i, f"FOOTER\nbody {i}\nmid {i % 3}") for i in range(10)]
    rows.append((99, "FOOTER"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = LineDeduplicator(maxDocFrequency=4).transform(df)
    got = {r.doc_id: r.text for r in out.collect()}
    assert 99 not in got                       # all lines were boilerplate
    assert got[0] == "body 0\nmid 0"           # order kept, footer gone
    assert len(got) == 10

    kept = LineDeduplicator(maxDocFrequency=4,
                            dropEmpty=False).transform(df)
    g2 = {r.doc_id: r.text for r in kept.collect()}
    assert g2[99] == ""
    assert kept.columns == df.columns

    norm_df = spark.createDataFrame(
        [(i, f"  footer  \nbody {i}") for i in range(5)]
        + [(50, "FOOTER\nbody x")], "doc_id long, text string")
    gn = {r.doc_id: r.text for r in
          LineDeduplicator(maxDocFrequency=4,
                           normalize=True).transform(norm_df).collect()}
    assert gn[50] == "body x"                  # folded into the hot key
    assert gn[0] == "body 0"


def test_line_dedup_hot_join_is_broadcast_anti(spark):
    """The removal join must be a broadcast anti join (hot set is
    bounded by lines/threshold) — never a shuffle of the line frame
    against itself."""
    from mmlspark_spark.llm import LineDeduplicator

    df = spark.createDataFrame(
        [(i, f"a\nb {i}") for i in range(8)], "doc_id long, text string")
    out = LineDeduplicator(maxDocFrequency=3).transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exact_dedup_survivorship_tiebreak(spark):
    """Normalized-key dedup keeps the chosen survivor: longest doc per
    URL (tieBreakDesc on a length column), nulls never win, id breaks
    remaining ties deterministically."""
    from mmlspark_spark.llm import ExactDeduplicator

    df = spark.createDataFrame(
        [(1, "u1", "short", 5), (2, "u1", "longer doc", 10),
         (3, "u1", None, None), (4, "u2", "only", 4),
         (5, "u3", "a", 1), (6, "u3", "b", 1)],
        "doc_id long, url string, text string, n_chars int")
    out = ExactDeduplicator(keyCols=["url"], idCol="doc_id",
                            tieBreakCol="n_chars",
                            tieBreakDesc=True).transform(df)
    got = {r.url: r.doc_id for r in out.collect()}
    assert got == {"u1": 2, "u2": 4, "u3": 5}  # longest; null last; min id
    # default policy unchanged: lowest id
    out2 = ExactDeduplicator(keyCols=["url"],
                             idCol="doc_id").transform(df)
    assert {r.url: r.doc_id for r in out2.collect()} == {
        "u1": 1, "u2": 4, "u3": 5}


def test_exact_dedup_tiebreak_nan_never_wins(spark):
    """Spark sorts NaN greater than every double — without folding to
    NULL, a NaN-scored row would win desc survivorship."""
    from mmlspark_spark.llm import ExactDeduplicator

    df = spark.createDataFrame(
        [(1, "u1", 0.9), (2, "u1", float("nan")), (3, "u1", None)],
        "doc_id long, url string, score double")
    out = ExactDeduplicator(keyCols=["url"], idCol="doc_id",
                            tieBreakCol="score",
                            tieBreakDesc=True).transform(df)
    assert [r.doc_id for r in out.collect()] == [1]


def test_image_dhash_struct_and_grid_lanes_agree(spark):
    """ImageDHashDeduplicator's two fingerprint lanes — numpy over an
    ImageSchema struct (luma + bilinear resize + bit rule) and pure
    Catalyst over a pre-sized 8×9 grid — must produce the SAME 64-bit
    fingerprint when the struct's pixels are exactly the pre-resized
    grid (resize 8×9 → 8×9 is the identity: with src == dst, ys/xs hit
    integer coordinates so bilinear collapses to a copy)."""
    import numpy as np

    from mmlspark_spark.llm import ImageDHashDeduplicator

    rng = np.random.default_rng(3)
    grids = [rng.integers(0, 256, size=(8, 9)).astype(np.uint8)
             for _ in range(6)]
    struct_rows = [
        (i, ("mem", 8, 9, 1, 0, g.tobytes()))
        for i, g in enumerate(grids)]
    sdf = spark.createDataFrame(
        struct_rows,
        "doc_id long, image struct<origin:string,height:int,width:int,"
        "nChannels:int,mode:int,data:binary>")
    gdf = spark.createDataFrame(
        [(i, [[int(x) for x in row] for row in g])
         for i, g in enumerate(grids)],
        "doc_id long, image array<array<int>>")
    dd = ImageDHashDeduplicator(idCol="doc_id", imageCol="image")
    via_struct = {r["__id"]: r["__sh"]
                  for r in dd.fingerprints(sdf).collect()}
    via_grid = {r["__id"]: r["__sh"]
                for r in dd.fingerprints(gdf).collect()}
    assert via_struct == via_grid and len(via_struct) == 6


def test_image_dhash_brightness_invariance_and_pairs(spark):
    """The perceptual contract: a uniformly brightness-shifted copy
    (no clipping) fingerprints IDENTICALLY (Hamming 0 — only pixel
    ORDER matters to dHash), an unrelated image never pairs under a
    tight threshold, and a corrupt struct row is skipped instead of
    failing the job (PatchedImageFileFormat's fault-tolerant
    contract)."""
    import numpy as np

    from mmlspark_spark.llm import ImageDHashDeduplicator

    rng = np.random.default_rng(7)
    base = rng.integers(10, 200, size=(16, 20, 3)).astype(np.uint8)
    bright = np.clip(base.astype(int) + 20, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)
    corrupt = (3, ("mem", 16, 20, 3, 16, b"\x00\x01"))  # wrong size
    rows = [(0, ("mem", 16, 20, 3, 16, base.tobytes())),
            (1, ("mem", 16, 20, 3, 16, bright.tobytes())),
            (2, ("mem", 16, 20, 3, 16, other.tobytes())),
            corrupt]
    df = spark.createDataFrame(
        rows,
        "doc_id long, image struct<origin:string,height:int,width:int,"
        "nChannels:int,mode:int,data:binary>")
    out = ImageDHashDeduplicator(
        idCol="doc_id", imageCol="image", bands=4,
        maxHammingDistance=2).transform(df).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get((0, 1)) == 0          # uniform shift → identical
    assert all(2 not in p for p in pairs)  # unrelated never pairs
    assert all(3 not in p for p in pairs)  # corrupt row skipped


def _pcm_struct(doc_id, x, rate=8000):
    import numpy as np

    pcm = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    return (doc_id, ("mem", rate, 1, len(pcm), pcm.tobytes()))


def test_audio_fp_grid_and_struct_lanes(spark):
    """Grid lane must equal the numpy bit rule on the same energies;
    struct lane: a gain-scaled copy (x0.4) fingerprints at Hamming
    ~0 (Haitsma-Kalker signs are scale-invariant), unrelated noise
    never pairs under a tight threshold, and short / torn-payload
    rows are skipped instead of failing."""
    import numpy as np

    from mmlspark_spark.llm import AudioFingerprintDeduplicator
    from mmlspark_spark.llm.multimodal_dedup import _afp_np

    rng = np.random.default_rng(11)
    grids = [rng.uniform(-40, 0, size=(9, 9)) for _ in range(4)]
    gdf = spark.createDataFrame(
        [(i, [[float(c) for c in row] for row in g])
         for i, g in enumerate(grids)],
        "doc_id long, energy array<array<double>>")
    dd = AudioFingerprintDeduplicator(idCol="doc_id", audioCol="energy")
    via_grid = {r["__id"]: r["__sh"]
                for r in dd.fingerprints(gdf).collect()}
    assert via_grid == {i: _afp_np(g) for i, g in enumerate(grids)}

    t = np.arange(16000) / 8000.0
    chirp = 0.35 * np.sin(2 * np.pi * (300 + 400 * t) * t)
    chirp += 0.2 * np.sin(2 * np.pi * 1100 * t)
    noise = 0.3 * rng.standard_normal(16000)
    rows = [_pcm_struct(0, chirp),
            _pcm_struct(1, 0.4 * chirp),          # gain-scaled copy
            _pcm_struct(2, noise),                # unrelated
            (3, ("mem", 8000, 1, 100, b"\x00" * 200)),   # < 9 frames
            (4, ("mem", 8000, 1, 16000, b"\x01"))]       # torn PCM16
    sdf = spark.createDataFrame(
        rows, "doc_id long, audio struct<origin:string,sampleRate:int,"
        "channels:int,numSamples:bigint,data:binary>")
    out = AudioFingerprintDeduplicator(
        idCol="doc_id", audioCol="audio", bands=8,
        maxHammingDistance=6).transform(sdf).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    # gain scaling leaves the signs of strong-band differences alone;
    # the residual few bits are int16 quantization noise in bands at
    # the log floor (bands=8 pigeonholes any Hamming <= 7 candidate)
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    assert all(2 not in p and 3 not in p and 4 not in p for p in pairs)


def test_video_dhash_struct_lane_containment(spark):
    """VIDEO_FRAMES_SCHEMA lane: a clip containing 3 of the long
    video's 4 distinct frames scores containment 3/3 = 1.0 (clip
    denominator = its own size — the clipping-dup contract); an
    unrelated video never pairs; corrupt frames are skipped and a
    video with only corrupt frames drops entirely."""
    import numpy as np

    from mmlspark_spark.llm import VideoDHashDeduplicator

    rng = np.random.default_rng(5)
    f = [rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)
         for _ in range(6)]

    def img(a):
        return ("mem", 16, 20, 3, 16, a.tobytes())

    def vid(frames, extra=()):
        return ("mem", 20, 16, len(frames) + len(extra),
                [img(a) for a in frames] + list(extra))

    corrupt = ("mem", 16, 20, 3, 16, b"\x00")
    rows = [(0, vid(f[0:4])),                       # full video
            (1, vid(f[1:4], extra=[corrupt])),      # clip + bad frame
            (2, vid(f[4:6])),                       # unrelated
            (3, vid([], extra=[corrupt, corrupt]))]  # all corrupt
    schema = ("doc_id long, video struct<origin:string,width:int,"
              "height:int,numFrames:int,frames:array<struct<"
              "origin:string,height:int,width:int,nChannels:int,"
              "mode:int,data:binary>>>")
    df = spark.createDataFrame(rows, schema)
    out = VideoDHashDeduplicator(
        idCol="doc_id", videoCol="video",
        minOverlap=0.9).transform(df).collect()
    pairs = {(r.doc_a, r.doc_b): (r.matches, r.overlap) for r in out}
    assert pairs == {(0, 1): (3, 1.0)}


def test_video_dhash_hot_frame_cap_and_precomputed_lane(spark):
    """array<long> pass-through lane; a frame hash shared by more
    docs than maxDocsPerFrameHash is dropped from candidate
    generation (title-card/black-frame guard), so docs related ONLY
    through the hot frame never pair, while pairs sharing rare
    frames survive with the hot frame excluded from their counts."""
    from mmlspark_spark.llm import VideoDHashDeduplicator

    hot = 999
    rows = ([(i, [hot, 100 + i]) for i in range(6)]
            + [(10, [hot, 7, 8]), (11, [hot, 7, 8])])
    df = spark.createDataFrame(rows, "doc_id long, clip array<bigint>")
    out = VideoDHashDeduplicator(
        idCol="doc_id", videoCol="clip", minOverlap=0.5,
        maxDocsPerFrameHash=4).transform(df).collect()
    pairs = {(r.doc_a, r.doc_b): r.matches for r in out}
    # only the rare-frame pair survives; matches excludes the hot
    # frame but the denominator still counts it (2/3 >= 0.5)
    assert pairs == {(10, 11): 2}
    uncapped = VideoDHashDeduplicator(
        idCol="doc_id", videoCol="clip", minOverlap=0.5,
        maxDocsPerFrameHash=None).transform(df).count()
    assert uncapped > 1  # without the cap the hot frame links everyone


def test_grid_lanes_null_and_undersized_rows_drop(spark):
    """Review-fix pins: NULL or undersized grids must fingerprint to
    NULL and DROP — never to 0, which would ghost-bucket them with
    each other and with genuinely flat images/silence — and must not
    throw INVALID_ARRAY_INDEX under ANSI mode."""
    from mmlspark_spark.llm import (
        AudioFingerprintDeduplicator,
        ImageDHashDeduplicator,
        VideoDHashDeduplicator,
    )

    flat = [[5] * 9] * 8                       # legit all-flat: hash 0
    short = [[5] * 9] * 7                      # 7 rows: undersized
    ragged = [[5] * 9] * 7 + [[5] * 4]         # 8 rows, one too narrow
    img = spark.createDataFrame(
        [(0, flat), (1, None), (2, short), (3, ragged), (4, flat)],
        "doc_id long, image array<array<int>>")
    dd = ImageDHashDeduplicator(idCol="doc_id", imageCol="image")
    fps = {r["__id"]: r["__sh"] for r in dd.fingerprints(img).collect()}
    assert set(fps) == {0, 4} and fps[0] == 0   # only real flats remain
    pairs = {(r.doc_a, r.doc_b)
             for r in dd.transform(img).collect()}
    assert pairs == {(0, 4)}

    silence = [[0.0] * 9] * 9
    aud = spark.createDataFrame(
        [(0, silence), (1, None), (2, [[0.0] * 9] * 5), (3, silence)],
        "doc_id long, energy array<array<double>>")
    add = AudioFingerprintDeduplicator(idCol="doc_id", audioCol="energy")
    apairs = {(r.doc_a, r.doc_b) for r in add.transform(aud).collect()}
    assert apairs == {(0, 3)}

    # video grid lane: a NULL/corrupt frame inside the clip is
    # dropped, not hashed to a shared ghost frame
    f1 = [[int(7 * r + c) for c in range(9)] for r in range(8)]
    vid = spark.createDataFrame(
        [(0, [f1, None]), (1, [None, [[1] * 9] * 3]), (2, [f1])],
        "doc_id long, clip array<array<array<int>>>")
    vdd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                 minOverlap=0.5)
    vpairs = {(r.doc_a, r.doc_b): r.matches
              for r in vdd.transform(vid).collect()}
    assert vpairs == {(0, 2): 1}   # doc 1 has zero valid frames


def test_audio_struct_lane_torn_stereo_payload_skipped(spark):
    """A stereo payload whose int16 count is odd passes a naive %2
    byte check but crashes the channel reshape — must be skipped."""
    import numpy as np

    from mmlspark_spark.llm import AudioFingerprintDeduplicator

    rng = np.random.default_rng(3)
    good = np.clip(np.round(
        0.4 * rng.standard_normal(16000) * 32767), -32768, 32767
    ).astype(np.int16)
    torn = b"\x01\x02" * 4001            # 4001 samples, 2 channels
    rows = [(0, ("m", 8000, 1, 16000, good.tobytes())),
            (1, ("m", 8000, 2, 2000, torn)),
            (2, ("m", 8000, 0, 0, b"\x00\x00")),     # zero channels
            (3, ("m", None, 1, 10, b"\x00\x00"))]    # null rate
    df = spark.createDataFrame(
        rows, "doc_id long, audio struct<origin:string,sampleRate:int,"
        "channels:int,numSamples:bigint,data:binary>")
    fps = (AudioFingerprintDeduplicator(idCol="doc_id",
                                        audioCol="audio")
           .fingerprints(df).collect())
    assert [r["__id"] for r in fps] == [0]
