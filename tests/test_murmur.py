"""MurmurHash3 parity suite (reference
VowpalWabbitMurmurWithPrefix.scala:1-77, VowpalWabbitFeaturizer.scala).

Three independent evidence sources for the same function:
1. public smhasher/Wikipedia golden vectors (fixed bytes → fixed hash);
2. Spark's JVM Murmur3_x86_32.hashUnsafeBytes2 via HashingTF.indexOf
   (seed 42) — a second implementation we don't control;
3. internal consistency: the cached-prefix state must equal the
   one-shot hash for every (prefix % 4, suffix % 4) remainder class.
"""

import random

import pytest

from mmlspark_spark.functions.murmur import (
    Murmur3PrefixState,
    murmur3_x86_32,
    vw_hash_string,
)

# Public MurmurHash3_x86_32 test vectors (smhasher / Wikipedia).
GOLDEN = [
    (b"", 0x00000000, 0x00000000),
    (b"", 0x00000001, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"\xff\xff\xff\xff", 0x00000000, 0x76293B50),
    (b"\x21\x43\x65\x87", 0x00000000, 0xF55B516B),
    (b"\x21\x43\x65\x87", 0x5082EDEE, 0x2362F9DE),
    (b"\x21\x43\x65", 0x00000000, 0x7E4A8634),
    (b"\x21\x43", 0x00000000, 0xA0F7B07A),
    (b"\x21", 0x00000000, 0x72661CF4),
    (b"\x00\x00\x00\x00", 0x00000000, 0x2362F9DE),
    (b"\x00\x00\x00", 0x00000000, 0x85F0B427),
    (b"\x00\x00", 0x00000000, 0x30F4C306),
    (b"\x00", 0x00000000, 0x514E28B7),
    (b"aaaa", 0x9747B28C, 0x5A97808A),
    (b"aaa", 0x9747B28C, 0x283E0130),
    (b"aa", 0x9747B28C, 0x5D211726),
    (b"a", 0x9747B28C, 0x7FA09EA6),
    (b"abcd", 0x9747B28C, 0xF0478627),
    (b"abc", 0x9747B28C, 0xC84A62DD),
    (b"ab", 0x9747B28C, 0x74875592),
    (b"Hello, world!", 0x9747B28C, 0x24884CBA),
    (b"The quick brown fox jumps over the lazy dog",
     0x9747B28C, 0x2FA826CD),
]


@pytest.mark.parametrize("data,seed,expected", GOLDEN)
def test_murmur3_golden_vectors(data, seed, expected):
    assert murmur3_x86_32(data, seed) == expected


def test_murmur3_matches_spark_jvm(spark):
    """Spark's HashingTF uses Murmur3_x86_32.hashUnsafeBytes2 with
    seed 42 — the standard-compliant murmur3 — and maps a term to
    nonNegativeMod(signed_hash, numFeatures). Agreement across many
    terms (incl. multi-byte UTF-8) pins this implementation to the
    JVM's, independent of the golden fixture."""
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(numFeatures=1 << 20)
    terms = ["", "a", "ab", "abc", "abcd", "lineitem", "Hello, world!",
             "côté", "ππππ", "0", "42", "x" * 100,
             "the quick brown fox"] + [f"feat_{i}" for i in range(50)]
    for term in terms:
        signed = murmur3_x86_32(term, 42)
        if signed >= 1 << 31:
            signed -= 1 << 32
        expected = ((signed % (1 << 20)) + (1 << 20)) % (1 << 20)
        assert tf.indexOf(term) == expected, term


def test_prefix_state_equals_full_hash():
    rng = random.Random(7)
    for plen in range(9):
        for slen in range(9):
            p = bytes(rng.randrange(256) for _ in range(plen))
            s = bytes(rng.randrange(256) for _ in range(slen))
            seed = rng.randrange(1 << 32)
            assert (Murmur3PrefixState(p, seed).hash(s)
                    == murmur3_x86_32(p + s, seed)), (p, s, seed)


def test_prefix_state_is_reusable():
    st = Murmur3PrefixState("price", 0)
    a, b = st.hash("=1"), st.hash("=2")
    assert a == murmur3_x86_32("price=1", 0)
    assert b == murmur3_x86_32("price=2", 0)
    assert a != b


def test_vw_hash_string_numeric_passthrough():
    # VW's hashstring: all-digit names are indices, offset by the seed.
    assert vw_hash_string("15", 0) == 15
    assert vw_hash_string("15", 100) == 115
    assert vw_hash_string("007", 0) == 7
    # anything non-digit murmurs
    assert vw_hash_string("15a", 3) == murmur3_x86_32("15a", 3)
    assert vw_hash_string("-1", 0) == murmur3_x86_32("-1", 0)
    assert vw_hash_string("", 9) == murmur3_x86_32("", 9)


def test_vw_featurizer_hash_parity(spark):
    """useVWHashing=True: indices must be exactly
    murmur(colname+value) & mask for strings and murmur(colname) & mask
    for numerics, with the numeric's value carried."""
    from mmlspark_spark.ml.vw import VowpalWabbitFeaturizer

    df = spark.createDataFrame(
        [("cat", 2.5), ("dog", 0.0), (None, 4.0)],
        ["animal", "weight"])
    out = VowpalWabbitFeaturizer(
        inputCols=["animal", "weight"], outputCol="features",
        numBits=15, useVWHashing=True).transform(df)
    rows = out.orderBy("weight").collect()
    mask = (1 << 15) - 1
    w_idx = murmur3_x86_32("weight", 0) & mask

    # ("dog", 0.0): zero numeric dropped, only the string feature
    vec = [r for r in rows if r.animal == "dog"][0].features
    assert dict(zip(vec.indices, vec.values)) == {
        murmur3_x86_32("animaldog", 0) & mask: 1.0}
    # ("cat", 2.5): both features
    vec = [r for r in rows if r.animal == "cat"][0].features
    assert dict(zip(vec.indices, vec.values)) == {
        murmur3_x86_32("animalcat", 0) & mask: 1.0, w_idx: 2.5}
    # (None, 4.0): null string skipped
    vec = [r for r in rows if r.animal is None][0].features
    assert dict(zip(vec.indices, vec.values)) == {w_idx: 4.0}
    assert vec.size == 1 << 15


def test_vw_featurizer_digit_named_column(spark):
    """A digit-named string column exercises VW's full hashstring
    passthrough: an all-digit feature string is its integer value plus
    the seed, not a murmur."""
    from mmlspark_spark.ml.vw import VowpalWabbitFeaturizer

    df = spark.createDataFrame([("7",), ("x",)], ["123"])
    out = VowpalWabbitFeaturizer(
        inputCols=["123"], outputCol="features", numBits=15,
        useVWHashing=True).transform(df)
    rows = {r["123"]: r.features for r in out.collect()}
    mask = (1 << 15) - 1
    # "123" + "7" = "1237", all digits -> index 1237
    assert dict(zip(rows["7"].indices, rows["7"].values)) == {1237 & mask: 1.0}
    # "123" + "x" is not numeric -> murmur
    assert dict(zip(rows["x"].indices, rows["x"].values)) == {
        murmur3_x86_32("123x", 0) & mask: 1.0}


def test_word_shingles_null_text_contract(spark):
    """NULL text yields [] (not NULL) from both shingle variants."""
    from pyspark.sql import functions as F

    from mmlspark_spark.functions.text_quality import (
        raw_word_ngrams,
        word_shingles,
    )

    df = spark.createDataFrame(
        [("a b c d e f",), (None,)], ["text"])
    rows = df.select(
        word_shingles("text", 5).alias("sh"),
        word_shingles("text", 5, hashed=True).alias("shh"),
        raw_word_ngrams("text", 5).alias("raw")).collect()
    assert len(rows[0].sh) == 2 and len(rows[0].raw) == 2
    assert rows[1].sh == [] and rows[1].shh == [] and rows[1].raw == []
    # size() contract external callers rely on: 0, never -1
    sizes = df.select(F.size(word_shingles("text", 5)).alias("n")).collect()
    assert sorted(r.n for r in sizes) == [0, 2]
