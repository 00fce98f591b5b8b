"""Property-based tests (hypothesis) for the text-analysis expression
library — invariants that must hold for ANY input text, mirroring the
reference's generative fuzzing layer."""

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=200,
)


@pytest.fixture(scope="module")
def run_expr(spark):
    def _run(text: str, col):
        return spark.createDataFrame([(text,)], ["text"]).select(
            col.alias("out")).collect()[0].out

    return _run


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_tokens_never_empty_strings(run_expr_holder, text):
    from mmlspark_spark.functions.text_quality import tokens

    out = run_expr_holder(text, tokens(F.col("text")))
    assert all(t != "" for t in out)
    # token count == split on JAVA's \s class ([ \t\n\x0B\f\r]) — note
    # python's str.split() differs (it also treats \x1c-\x1f as space)
    expected = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text) if t]
    assert len(out) == len(expected)


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_shingles_bounded_and_distinct(run_expr_holder, text):
    from mmlspark_spark.functions.text_quality import word_shingles

    out = run_expr_holder(text, word_shingles(F.col("text"), 3))
    n_tok = len(text.split())
    assert len(out) <= max(n_tok - 2, 0)
    assert len(out) == len(set(out))  # distinct


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_fingerprint_in_modulus_range(run_expr_holder, text):
    from mmlspark_spark.functions.text_quality import (
        _FP_MOD,
        doc_fingerprint,
    )

    out = run_expr_holder(text, doc_fingerprint(F.col("text")))
    assert 0 <= out < _FP_MOD


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_lang_id_always_valid(run_expr_holder, text):
    from mmlspark_spark.functions.text_quality import _LANG_PROFILES, lang_id

    out = run_expr_holder(text, lang_id(F.col("text")))
    assert out in set(_LANG_PROFILES) | {"und"}


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_punct_ratio_bounded(run_expr_holder, text):
    from mmlspark_spark.functions.text_quality import punct_ratio

    out = run_expr_holder(text, punct_ratio(F.col("text")))
    assert 0.0 <= out <= 1.0


@pytest.fixture(scope="module")
def run_expr_holder(run_expr):
    return run_expr


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abcde ", min_size=0, max_size=40),
                min_size=1, max_size=8))
def test_exact_dedup_idempotent_and_lossless(dedup_spark_holder, texts):
    """Dedup twice == dedup once; distinct key set is preserved."""
    from mmlspark_spark.llm.dedup import ExactDeduplicator

    spark = dedup_spark_holder
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    stage = ExactDeduplicator(keyCols=["text"], idCol="doc_id")
    once = stage.transform(df)
    twice = stage.transform(once)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b  # idempotent
    assert {r.text for r in once.collect()} == set(texts)  # lossless keys
    # winner is always the minimum id per key
    by_key = {}
    for i, t in enumerate(texts):
        by_key.setdefault(t, i)
    assert {r.doc_id for r in once.collect()} == set(by_key.values())


@pytest.fixture(scope="module")
def dedup_spark_holder(spark):
    return spark


def test_repetition_metrics_hand_checked(spark):
    from mmlspark_spark.functions.text_quality import (
        dup_line_fraction,
        dup_ngram_fraction,
    )

    df = spark.createDataFrame([
        (1, "a b\na b\nc d"),            # 3 lines, one dup -> 1/3
        (2, "x y z w v u t s"),          # unique lines/grams -> 0
        (3, "p q p q p q p q p q"),      # heavy 2-gram repetition
        (4, "short"),                    # no 5-grams -> 0
    ], ["id", "text"])
    got = {r.id: r for r in df.select(
        "id",
        dup_line_fraction("text").alias("dl"),
        dup_ngram_fraction("text", 2).alias("d2"),
    ).collect()}
    assert abs(got[1].dl - 1 / 3) < 1e-9
    assert got[2].dl == 0.0 and got[2].d2 == 0.0
    # "p q p q ...": 9 bigrams, 2 distinct -> 7/9 duplicated
    assert abs(got[3].d2 - 7 / 9) < 1e-9
    assert got[4].d2 == 0.0


PAIRS = st.tuples(st.none() | TEXTS, st.none() | TEXTS)


@settings(max_examples=25, deadline=None)
@given(PAIRS, PAIRS)
def test_null_safe_key_injective_on_tuples(dedup_spark_holder, a, b):
    """null_safe_key(t1) == null_safe_key(t2) IFF t1 == t2 — the
    property concat_ws and multi-arg hash both violate (they skip
    nulls, colliding ('x', None) with (None, 'x'))."""
    from mmlspark_spark.functions.keys import null_safe_key

    spark = dedup_spark_holder
    df = spark.createDataFrame(
        [(a[0], a[1], b[0], b[1])],
        "a1 string, a2 string, b1 string, b2 string")
    row = df.select(
        null_safe_key([F.col("a1"), F.col("a2")]).alias("ka"),
        null_safe_key([F.col("b1"), F.col("b2")]).alias("kb")).collect()[0]
    assert (row.ka == row.kb) == (a == b), (a, b)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.none() | st.text(alphabet="abΩ ", max_size=6),
                min_size=1, max_size=8),
       st.lists(st.none() | st.text(alphabet="abΩ ", max_size=6),
                min_size=1, max_size=5))
def test_exact_registry_match_equals_truth(dedup_spark_holder,
                                           stored_texts, batch_texts):
    """The stored exact registry's match equals the python-computed
    null-safe truth on arbitrary corpora (nulls, unicode, duplicate
    keys), and tombstoning a stored id removes exactly its pairs —
    the randomized counterpart of the hand-built lifecycle test."""
    import tempfile

    from mmlspark_spark.core.cache import release_intermediates
    from mmlspark_spark.llm.dedup import IncrementalDeduplicator

    spark = dedup_spark_holder
    stored = spark.createDataFrame(
        list(enumerate(stored_texts)), "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string")
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 10, prefixBits=3)
    path = tempfile.mkdtemp(prefix="exact_prop_")
    dd.save_index(stored, path)
    idx = dd.load_index(spark, path)
    got_df = dd.match_against_index(idx, batch)
    got = {tuple(r) for r in got_df.collect()}
    release_intermediates(got_df)
    truth = {(100 + i, j)
             for i, bt in enumerate(batch_texts)
             for j, s in enumerate(stored_texts)
             if bt == s or (bt is None and s is None)}
    assert got == truth
    # tombstone the first stored doc: exactly its pairs disappear
    dd.delete_from_index(
        spark.createDataFrame([(0,)], "doc_id long"), path)
    got2_df = dd.match_against_index(dd.load_index(spark, path), batch)
    got2 = {tuple(r) for r in got2_df.collect()}
    release_intermediates(got2_df)
    assert got2 == {p for p in truth if p[1] != 0}


@given(payloads=st.lists(st.binary(min_size=0, max_size=400),
                         min_size=1, max_size=8),
       gz=st.booleans())
@settings(max_examples=25, deadline=None)
def test_warc_record_roundtrip_arbitrary_bytes(payloads, gz):
    """The WARC record codec (pure python, no Spark needed) round-
    trips ARBITRARY payload bytes — including payloads that contain
    'WARC/1.0', CRLF-CRLF boundaries, or gzip magic — because records
    are length-prefixed, never delimiter-scanned. Gzip mode packs one
    member per record (the Common Crawl convention)."""
    import gzip as _gzip

    from mmlspark_spark.sources.warc import (
        _gunzip_members,
        _iter_warc_records,
    )

    recs = []
    for i, payload in enumerate(payloads):
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Target-URI: http://x.example/{i}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode()
        rec = hdr + payload + b"\r\n\r\n"
        recs.append(_gzip.compress(rec) if gz else rec)
    data = b"".join(recs)
    if gz:
        data = _gunzip_members(data)
    got = list(_iter_warc_records(data))
    assert [b for _, b in got] == payloads
    assert [h["warc-target-uri"] for h, _ in got] \
        == [f"http://x.example/{i}" for i in range(len(payloads))]


@given(payload=st.binary(min_size=1, max_size=200),
       cut=st.integers(min_value=1, max_value=50))
@settings(max_examples=25, deadline=None)
def test_warc_truncated_tail_never_raises(payload, cut):
    """A stream cut anywhere inside the FINAL record yields every
    complete record before it and never raises — the fault-tolerant
    contract for truncated crawl segments."""
    from mmlspark_spark.sources.warc import _iter_warc_records

    hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode()
    full = hdr + payload + b"\r\n\r\n"
    data = full + full[:max(0, len(full) - cut)]  # torn second copy
    got = list(_iter_warc_records(data))
    assert len(got) >= 1
    assert got[0][1] == payload


@given(payloads=st.lists(st.binary(min_size=0, max_size=300),
                         min_size=1, max_size=6),
       data=st.data())
@settings(max_examples=25, deadline=None)
def test_warc_stream_parse_chunk_invariant(payloads, data):
    """_iter_warc_stream yields the SAME records regardless of how
    the byte stream is chunked (records may span gzip-member/chunk
    boundaries — the carry buffer stitches them), matching the
    whole-buffer parse bit for bit."""
    from mmlspark_spark.sources.warc import (
        _iter_warc_records,
        _iter_warc_stream,
    )

    recs = []
    for i, payload in enumerate(payloads):
        hdr = (f"WARC/1.0\r\nWARC-Type: resource\r\n"
               f"WARC-Target-URI: http://x.example/{i}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode()
        recs.append(hdr + payload + b"\r\n\r\n")
    stream = b"".join(recs)
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=len(stream)), max_size=8)))
    bounds = [0] + cuts + [len(stream)]
    chunks = [stream[a:b] for a, b in zip(bounds, bounds[1:])]
    got = list(_iter_warc_stream(iter(chunks)))
    assert got == list(_iter_warc_records(stream))
    assert [b for _, b in got] == payloads


def test_warc_gzip_member_streaming_is_peak_bounded():
    """Decoding a multi-member .warc.gz segment is bounded by
    max(member), not the decompressed segment size: 60 members of
    ~400 KB each (24 MB total decompressed) must parse with a python
    allocation peak well under the whole-segment size — the 100 TB
    sizing contract from the module docstring (a real segment is
    ~4-5 GB decompressed; materializing 32 of them concurrently
    would blow past the executor)."""
    import gzip as _gzip
    import tracemalloc

    from mmlspark_spark.sources.warc import (
        _iter_gzip_members,
        _iter_warc_stream,
    )

    member_payload = 400_000
    n_members = 60
    recs = []
    for i in range(n_members):
        payload = bytes([i % 251]) * member_payload
        hdr = (f"WARC/1.0\r\nWARC-Type: resource\r\n"
               f"WARC-Target-URI: http://x.example/{i}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode()
        recs.append(_gzip.compress(hdr + payload + b"\r\n\r\n"))
    data = b"".join(recs)

    tracemalloc.start()
    tracemalloc.reset_peak()
    count = 0
    for h, block in _iter_warc_stream(_iter_gzip_members(data)):
        assert len(block) == member_payload
        count += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n_members
    total_decompressed = n_members * member_payload
    # peak holds one member + carry + one feed chunk, far below the
    # 24 MB whole-segment materialization the old path paid
    assert peak < total_decompressed // 3, (
        f"peak {peak} bytes suggests whole-segment materialization "
        f"(total decompressed {total_decompressed})")
