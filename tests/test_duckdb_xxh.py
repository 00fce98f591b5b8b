"""plans/duckdb_xxh — bit-exact replay of Spark's xxhash64 in DuckDB.

Three layers, each checked against the layer above:
Spark ``F.xxhash64`` (ground truth) ⇆ pure-Python reference
(hash_int/hash_long/hash_bytes) ⇆ generated DuckDB SQL expressions
(xxh64_long/xxh64_str). String cases cover every tail-length class of
``XXH64.hashUnsafeBytes`` (empty, <4, 4-7, 8-31, exactly 32, stripes +
every word/4-byte/byte-tail combination, multi-byte UTF-8).
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from mmlspark_spark.plans.duckdb_xxh import (M64, hash_bytes, hash_int,
                                             hash_long, to_s64, to_u64,
                                             xxh64_long, xxh64_str)


def _signed(x):
    return x - M64 if x >= (1 << 63) else x


STRS = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "123456789012", "x" * 31, "y" * 32, "z" * 33, "w" * 39, "v" * 40,
        "u" * 44, "t" * 47, "s" * 63, "r" * 64, "q" * 65, "p" * 100,
        "héllo wörld ünïcode ẞ ∀x∈ℝ", "tab\tnew\nline", "vt\x0bvt"]
_rng = random.Random(11)
STRS += ["".join(_rng.choice("abcdef ghiãéZ09")
                 for _ in range(_rng.randint(0, 130))) for _ in range(20)]

LONGS = [0, 1, -1, 42, -42, 123456789123456789, -987654321987654321,
         (1 << 63) - 1, -(1 << 63)]
LONGS += [_rng.randint(-2 ** 63, 2 ** 63 - 1) for _ in range(20)]
INTS = [0, 1, -1, 7, 2 ** 31 - 1, -2 ** 31, 123456]


def test_python_reference_matches_spark(spark):
    """hash_int / hash_long / hash_bytes == Spark xxhash64, including
    the multi-argument seed chaining."""
    df = spark.createDataFrame([(s,) for s in STRS], ["s"])
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [_signed(hash_bytes(s.encode("utf-8"), 42)) for s in STRS]
    assert got == want

    df = spark.createDataFrame([(x,) for x in LONGS], "l long")
    got = [r[0] for r in df.select(F.xxhash64("l")).collect()]
    want = [_signed(hash_long(x & (M64 - 1), 42)) for x in LONGS]
    assert got == want

    df = spark.createDataFrame([(x,) for x in INTS], "i int")
    got = [r[0] for r in df.select(F.xxhash64("i")).collect()]
    want = [_signed(hash_int(x & 0xFFFFFFFF, 42)) for x in INTS]
    assert got == want

    # chained args: xxhash64(int, long, str) — each value's hash seeds
    # the next (how slot/band seeds fold to constants in the oracles)
    df = spark.createDataFrame([(3, 99, "abc")], "i int, l long, s string")
    got = df.select(F.xxhash64("i", "l", "s")).collect()[0][0]
    want = _signed(hash_bytes(b"abc", hash_long(99, hash_int(3, 42))))
    assert got == want


def test_sql_long_matches_reference():
    con = duckdb.connect()
    for seed in (42, 0, 7, hash_int(5, 42)):
        expr = to_s64(xxh64_long(to_u64("x"), f"{seed}::HUGEINT"))
        rows = con.execute(
            f"SELECT x, {expr} FROM (SELECT unnest(?::BIGINT[]) AS x)",
            [LONGS]).fetchall()
        for x, got in rows:
            assert got == _signed(hash_long(x & (M64 - 1), seed)), (x, seed)


def test_sql_str_matches_reference():
    con = duckdb.connect()
    expr = to_s64(xxh64_str("s"))
    rows = con.execute(
        f"SELECT s, {expr} FROM (SELECT unnest(?::VARCHAR[]) AS s)",
        [STRS]).fetchall()
    for s, got in rows:
        assert got == _signed(hash_bytes(s.encode("utf-8"), 42)), repr(s)


def test_sql_seed_chaining_matches_reference():
    """Nested xxh64_long (band-hash shape: hashLong(s2, hashLong(s1,
    C))) — unique prefixes keep the let-bindings from colliding."""
    con = duckdb.connect()
    c0 = hash_int(3, 42)
    expr = to_s64(xxh64_long(to_u64("b"),
                             xxh64_long(to_u64("a"), f"{c0}::HUGEINT",
                                        u="qa"), u="qb"))
    rows = con.execute(
        f"SELECT a, b, {expr} FROM (VALUES (5, -9), (0, 0), "
        f"(-123456789, 987654321)) v(a, b)").fetchall()
    for a, b, got in rows:
        want = hash_long(b & (M64 - 1), hash_long(a & (M64 - 1), c0))
        assert got == _signed(want), (a, b)


def test_sql_hashes_arbitrary_unicode_batch():
    """Arbitrary-unicode sweep for BOTH hash families in ONE query
    (DuckDB re-plans the ~60 KB expression per execute — ~3 s each —
    so per-example hypothesis calls are unaffordable; a seeded batch
    over 300 strings costs one plan). Codepoints span every UTF-8
    width (1–4 bytes, surrogates excluded) so multi-byte boundaries
    land in every stripe/word/4-byte/byte tail class."""
    from mmlspark_spark.functions.murmur import murmur3_x86_32
    from mmlspark_spark.plans.duckdb_xxh import murmur32_str

    rng = random.Random(97)

    def cp():
        c = rng.choice([rng.randint(1, 0x7F), rng.randint(0x80, 0x7FF),
                        rng.randint(0x800, 0xFFFF),
                        rng.randint(0x10000, 0x10FFFF)])
        return c if not 0xD800 <= c <= 0xDFFF else 0x20AC

    cases = ["".join(chr(cp()) for _ in range(rng.randint(0, 120)))
             for _ in range(300)]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT s, {to_s64(xxh64_str('s'))}, {murmur32_str('s')} "
        f"FROM (SELECT unnest(?::VARCHAR[]) AS s)", [cases]).fetchall()
    assert len(rows) == len(cases)
    for s, x, m in rows:
        assert x == _signed(hash_bytes(s.encode("utf-8"), 42)), repr(s)
        assert m == murmur3_x86_32(s, 42), repr(s)


@pytest.mark.parametrize("n", [0, 3, 4, 7, 8, 12, 15, 16, 31, 32, 36,
                               39, 40, 43, 44, 47, 63, 64, 71, 95, 96])
def test_sql_str_every_tail_class(n):
    """One string per (stripes, words, 4-byte, bytes) tail signature."""
    s = "".join(chr(97 + (i % 26)) for i in range(n))
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {to_s64(xxh64_str('s'))} FROM (SELECT ? AS s)",
        [s]).fetchone()[0]
    assert got == _signed(hash_bytes(s.encode(), 42))
