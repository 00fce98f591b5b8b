"""Bit-exact replay of Spark's ``xxhash64`` as DuckDB SQL expressions.

Spark's ``F.xxhash64`` (reference: Spark ``XXH64.java`` /
``hashExpressions``) is the engine's scale hash family — shingle
hashing, MinHash slots, LSH band hashes. Oracles that want to verify
those operators HASH-EXACT must recompute the same 64-bit values in
DuckDB, which has no xxhash64 builtin and (because the driver runs
each oracle as ONE statement) no room for ``CREATE MACRO``. This
module therefore *generates* self-contained SQL expression strings:

- :func:`xxh64_long` — Spark ``xxhash64(<long col>)`` with an
  arbitrary seed expression (``XXH64.hashLong``);
- :func:`xxh64_str` — Spark ``xxhash64(<string col>)`` over the
  column's UTF-8 bytes (``XXH64.hashUnsafeBytes``: 32-byte stripes,
  8-byte words, 4-byte word, byte tail);
- :func:`hash_int` / :func:`hash_long` — the same primitives in pure
  Python, for folding LITERAL arguments (e.g. ``xxhash64(lit(i), x)``
  = ``hashLong(x, hashInt(i, 42))`` — the ``hashInt`` is a constant
  the caller precomputes here and inlines).

Mechanics: all values are HUGEINT in [0, 2**64). Multiplication mod
2**64 splits into 32-bit halves (a full 64×64 product overflows even
HUGEINT); xor/shift detour through UBIGINT (DuckDB's bit ops don't
cover HUGEINT). Straight-line reuse would square the expression size
at every step, so intermediate values are *let-bound* via the
``list_transform([expr], v -> body)[1]`` idiom, which keeps every
generated expression linear in the number of hash steps. Tests
cross-check both generators against Spark on literals covering every
tail-length class (tests/test_duckdb_xxh.py).
"""

from __future__ import annotations

M64 = 1 << 64
MASK = M64 - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

_HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# Pure-Python reference (validated against Spark; used for literal folding
# and as the test oracle's oracle)
# ---------------------------------------------------------------------------

def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & MASK


def _fmix_py(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int = 42) -> int:
    """``XXH64.hashInt`` — unsigned result in [0, 2**64)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((i & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix_py(h)


def hash_long(l: int, seed: int = 42) -> int:
    """``XXH64.hashLong`` — unsigned result in [0, 2**64)."""
    h = (seed + P5 + 8) & MASK
    h ^= (_rotl(((l & MASK) * P2) & MASK, 31) * P1) & MASK
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix_py(h)


def hash_bytes(data: bytes, seed: int = 42) -> int:
    """``XXH64.hashUnsafeBytes`` — unsigned result in [0, 2**64)."""
    n = len(data)
    off = 0
    if n >= 32:
        v = [(seed + P1 + P2) & MASK, (seed + P2) & MASK,
             seed & MASK, (seed - P1) & MASK]
        while off <= n - 32:
            for idx in range(4):
                w = int.from_bytes(data[off + 8 * idx:off + 8 * idx + 8],
                                   "little")
                v[idx] = (_rotl((v[idx] + w * P2) & MASK, 31) * P1) & MASK
            off += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7)
             + _rotl(v[2], 12) + _rotl(v[3], 18)) & MASK
        for x in v:
            k = (_rotl((x * P2) & MASK, 31) * P1) & MASK
            h = ((h ^ k) * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while off <= n - 8:
        w = int.from_bytes(data[off:off + 8], "little")
        k = (_rotl((w * P2) & MASK, 31) * P1) & MASK
        h = (_rotl(h ^ k, 27) * P1 + P4) & MASK
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off:off + 4], "little")
        h ^= (w * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        off += 4
    while off < n:
        h ^= (data[off] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        off += 1
    return _fmix_py(h)


def to_signed(x: int) -> int:
    """Unsigned 64-bit value → Spark's signed long."""
    return x - M64 if x >= (1 << 63) else x


# ---------------------------------------------------------------------------
# SQL expression builders. Convention: every helper argument that is
# DUPLICATED in the emitted text must be a bound variable name or a
# literal; compound expressions are let-bound first.
# ---------------------------------------------------------------------------

def _let(var: str, expr: str, body: str) -> str:
    return f"list_transform([{expr}], {var} -> {body})[1]"


def _lets(binds: list[tuple[str, str]], body: str) -> str:
    for var, expr in reversed(binds):
        body = _let(var, expr, body)
    return body


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2**64 over HUGEINT via 32-bit split (the full 64×64
    product can exceed HUGEINT's 127-bit positive range)."""
    return (f"((((({a})//4294967296)*(({b})%4294967296)"
            f" + (({a})%4294967296)*(({b})//4294967296)) % 4294967296"
            f" * 4294967296"
            f" + (({a})%4294967296)*(({b})%4294967296)) % {M64})")


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT"


def _shr(a: str, n: int) -> str:
    return f"((({a})::UBIGINT >> {n})::HUGEINT)"


def _rot(x: str, n: int) -> str:
    # (x << n | x >> 64-n): the halves are bit-disjoint, so + == |
    return f"({_mul64(x, str((1 << n) % M64))} + {_shr(x, 64 - n)})"


def _fmix(hvar: str, u: str) -> str:
    return _lets(
        [(f"{u}f1", _xor(hvar, _shr(hvar, 33))),
         (f"{u}f2", _mul64(f"{u}f1", str(P2))),
         (f"{u}f3", _xor(f"{u}f2", _shr(f"{u}f2", 29))),
         (f"{u}f4", _mul64(f"{u}f3", str(P3)))],
        _xor(f"{u}f4", _shr(f"{u}f4", 32)))


def to_u64(expr: str) -> str:
    """Signed BIGINT SQL expression → HUGEINT in [0, 2**64)."""
    return f"((({expr})::HUGEINT % {M64} + {M64}) % {M64})"


def to_s64(expr: str) -> str:
    """HUGEINT in [0, 2**64) → signed BIGINT (Spark long semantics)."""
    e = f"({expr})"
    return (f"(CASE WHEN {e} >= {1 << 63} THEN {e} - {M64} "
            f"ELSE {e} END)::BIGINT")


def xxh64_long(l_expr: str, seed_expr: str, u: str = "q") -> str:
    """SQL for ``XXH64.hashLong(l, seed)``.

    ``l_expr`` must already be HUGEINT in [0, 2**64) (wrap signed
    columns with :func:`to_u64`); ``seed_expr`` likewise (a Python-int
    literal is fine). ``u`` is a unique variable prefix — nested calls
    must not share it. Returns HUGEINT in [0, 2**64).
    """
    return _lets(
        [(f"{u}l", l_expr),
         (f"{u}s", seed_expr),
         (f"{u}k1", _mul64(f"{u}l", str(P2))),
         (f"{u}k2", _rot(f"{u}k1", 31)),
         (f"{u}k3", _mul64(f"{u}k2", str(P1))),
         (f"{u}h1", _xor(f"(({u}s + {P5 + 8}) % {M64})", f"{u}k3")),
         (f"{u}h2", _rot(f"{u}h1", 27)),
         (f"{u}h3", f"(({_mul64(f'{u}h2', str(P1))} + {P4}) % {M64})")],
        _fmix(f"{u}h3", u))


def _byte(hx: str, p: str) -> str:
    """Byte value at 0-based offset ``p`` of hex string var ``hx``."""
    return (f"((strpos('{_HEX}', substr({hx}, 2*({p})+1, 1))-1)*16"
            f" + (strpos('{_HEX}', substr({hx}, 2*({p})+2, 1))-1))")


def _word(hx: str, o: str, nbytes: int) -> str:
    """Little-endian ``nbytes``-byte word at byte offset ``o`` (a
    simple expression) as HUGEINT."""
    terms = [f"{_byte(hx, f'({o})+{j}')}::HUGEINT * {256 ** j}"
             for j in range(nbytes)]
    return "(" + " + ".join(terms) + ")"


def _stripe_round(acc: str, w: str, u: str) -> str:
    # v = rotl(v + w*P2, 31) * P1
    return _lets(
        [(f"{u}t", f"(({acc} + {_mul64(w, str(P2))}) % {M64})"),
         (f"{u}r", _rot(f"{u}t", 31))],
        _mul64(f"{u}r", str(P1)))


def _word_round(hvar: str, wvar: str, u: str) -> str:
    # k = rotl(w*P2,31)*P1 ; h = rotl(h^k,27)*P1 + P4
    return _lets(
        [(f"{u}a", _mul64(wvar, str(P2))),
         (f"{u}b", _rot(f"{u}a", 31)),
         (f"{u}c", _mul64(f"{u}b", str(P1))),
         (f"{u}d", _xor(hvar, f"{u}c")),
         (f"{u}e", _rot(f"{u}d", 27))],
        f"(({_mul64(f'{u}e', str(P1))} + {P4}) % {M64})")


def fold_sum(term: str, dim: int) -> str:
    """Left-fold summation of ``term`` (an expression over the 1-based
    index variable ``i2``) for ``dim`` elements, in EXACTLY Catalyst's
    ``F.aggregate(..., lit(0.0), a+v)`` order: ((0.0 + t1) + t2) + …
    Oracles that replay float dot products / norms MUST build them
    from this one helper — two drifting copies of the fold would
    silently break bit-exactness if either ever switched to a
    different summation order (e.g. list_aggregate 'sum')."""
    return (f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {dim + 1}), i2 -> {term})), "
            f"(a2, b2) -> a2 + b2)")


def cosine_sql(a: str, b: str, dim: int) -> str:
    """Exact cosine of two DOUBLE-list columns, bit-identical to
    functions/vector.cosine_similarity: the one-pass struct
    accumulator adds each of (dot, ‖a‖², ‖b‖²) in element order, so
    three separate :func:`fold_sum` folds produce the same doubles."""
    return (f"{fold_sum(f'{a}[i2] * {b}[i2]', dim)}"
            f" / (sqrt({fold_sum(f'{a}[i2] * {a}[i2]', dim)})"
            f" * sqrt({fold_sum(f'{b}[i2] * {b}[i2]', dim)}))")


def murmur32_str(col_expr: str, seed: int = 42, u: str = "y") -> str:
    """SQL for MurmurHash3_x86_32 over ``col_expr``'s UTF-8 bytes —
    the function behind Spark's ``FeatureHasher``/``HashingTF``
    (``Murmur3_x86_32.hashUnsafeBytes2``, default ML seed 42) and VW's
    ``uniform_hash`` (matching functions/murmur.py, which is
    cross-checked against the JVM in tests/test_murmur.py).

    Returns UBIGINT in [0, 2**32). All arithmetic stays in UBIGINT —
    a 32×32-bit product is < 2**64, so no HUGEINT detour is needed.
    Use :func:`nonneg_mod32` for Spark ML's slot assignment.
    """
    hx, n = f"{u}hx", f"{u}n"
    mask = "4294967295"

    def mul32(a: str, b: int) -> str:
        return f"((({a}) * {b}::UBIGINT) & {mask})"

    def rot32(x: str, r: int) -> str:
        return (f"(((({x}) * {1 << r}::UBIGINT) & {mask})"
                f" | (({x}) >> {32 - r}))")

    def mixk1(kvar: str, p: str) -> str:
        return _lets(
            [(f"{p}a", mul32(kvar, 0xCC9E2D51)),
             (f"{p}b", rot32(f"{p}a", 15))],
            mul32(f"{p}b", 0x1B873593))

    def mixh1(hvar: str, kexpr: str, p: str) -> str:
        return _lets(
            [(f"{p}c", f"xor({hvar}, {kexpr})"),
             (f"{p}d", rot32(f"{p}c", 13))],
            f"((({p}d * 5::UBIGINT) + 3864292196::UBIGINT) & {mask})")

    blocks = (f"list_reduce(list_prepend({seed}::UBIGINT, "
              f"list_transform(range(0, {n}//4), {u}bi -> "
              f"{_word(hx, f'4*{u}bi', 4)}::UBIGINT)), "
              f"({u}h, {u}k) -> "
              f"{mixh1(f'{u}h', mixk1(f'{u}k', f'{u}p'), f'{u}q')})")
    tail_terms = " + ".join(
        f"(CASE WHEN {n}%4 >= {j + 1} THEN "
        f"{_byte(hx, f'4*({n}//4)+{j}')}::UBIGINT * {1 << (8 * j)} "
        f"ELSE 0 END)" for j in range(3))
    tailed = (f"(CASE WHEN {n}%4 > 0 THEN "
              f"xor({u}h1, {_let(f'{u}tk', f'({tail_terms})', mixk1(f'{u}tk', f'{u}r'))}) "
              f"ELSE {u}h1 END)")
    fm = _lets(
        [(f"{u}e1", f"xor({u}h2, ({n}::UBIGINT & {mask}))"),
         (f"{u}e2", f"xor({u}e1, {u}e1 >> 16)"),
         (f"{u}e3", mul32(f"{u}e2", 0x85EBCA6B)),
         (f"{u}e4", f"xor({u}e3, {u}e3 >> 13)"),
         (f"{u}e5", mul32(f"{u}e4", 0xC2B2AE35))],
        f"xor({u}e5, {u}e5 >> 16)")
    return _lets(
        [(hx, f"lower(hex(encode({col_expr})))"),
         (n, f"octet_length(encode({col_expr}))"),
         (f"{u}h1", blocks),
         (f"{u}h2", tailed)],
        fm)


def nonneg_mod32(expr: str, m: int) -> str:
    """Spark ML ``Utils.nonNegativeMod`` of a murmur32 value (UBIGINT
    in [0, 2**32)) into ``m`` buckets, as signed-int semantics."""
    e = f"({expr})"
    s = f"(CASE WHEN {e} >= 2147483648 THEN {e}::BIGINT - 4294967296 ELSE {e}::BIGINT END)"
    return f"((({s}) % {m} + {m}) % {m})"


def xxh64_str(col_expr: str, seed: int = 42, u: str = "z") -> str:
    """SQL for Spark ``xxhash64(<string col>)`` over UTF-8 bytes.

    ``col_expr`` is any VARCHAR expression; ``seed`` must be a Python
    int (Spark's default 42). Returns HUGEINT in [0, 2**64). The
    structure mirrors ``XXH64.hashUnsafeBytes``: 32-byte stripes with
    4 accumulators (list_reduce over chunk structs), then 8-byte
    words, one optional 4-byte word, then single bytes, then the
    avalanche. Every loop is a ``list_reduce`` with the initial state
    prepended (this DuckDB has no 3-arg list_reduce).
    """
    hx, n = f"{u}hx", f"{u}n"
    # --- stripes (n >= 32) ---------------------------------------------
    chunk = ("{" + ", ".join(
        f"'w{i}': {_word(hx, f'32*{u}ci + {8 * i}', 8)}"
        for i in range(4)) + "}")
    init = ("{" + ", ".join(
        f"'w{i}': {v}::HUGEINT" for i, v in enumerate(
            [(seed + P1 + P2) & MASK, (seed + P2) & MASK,
             seed & MASK, (seed - P1) & MASK])) + "}")
    stripe_lambda = ("{" + ", ".join(
        f"'w{i}': " + _stripe_round(f"{u}ac.w{i}", f"{u}ch.w{i}", f"{u}s{i}")
        for i in range(4)) + "}")
    stripes = (f"list_reduce(list_prepend({init}, "
               f"list_transform(range(0, {n}//32), {u}ci -> {chunk})), "
               f"({u}ac, {u}ch) -> {stripe_lambda})")
    merge_one = []
    hv = f"{u}m0"
    merged = (f"((({_rot(f'{u}v.w0', 1)}) + ({_rot(f'{u}v.w1', 7)})"
              f" + ({_rot(f'{u}v.w2', 12)}) + ({_rot(f'{u}v.w3', 18)}))"
              f" % {M64})")
    merge_one.append((hv, merged))
    for i in range(4):
        ku, nxt = f"{u}g{i}", f"{u}m{i + 1}"
        kexpr = _lets(
            [(f"{ku}a", _mul64(f"{u}v.w{i}", str(P2))),
             (f"{ku}b", _rot(f"{ku}a", 31))],
            _mul64(f"{ku}b", str(P1)))
        merge_one.append((f"{ku}k", kexpr))
        merge_one.append(
            (nxt, _lets([(f"{ku}x", _xor(hv, f"{ku}k"))],
                        f"(({_mul64(f'{ku}x', str(P1))} + {P4}) % {M64})")))
        hv = nxt
    big = _let(f"{u}v", stripes, _lets(merge_one, hv))
    h0 = (f"(CASE WHEN {n} >= 32 THEN {big} "
          f"ELSE {(seed + P5) & MASK}::HUGEINT END)")
    # --- tail ------------------------------------------------------------
    words = (f"list_reduce(list_prepend(({u}h0 + {n}) % {M64}, "
             f"list_transform(range(0, ({n} - 32*({n}//32))//8), "
             f"{u}wi -> {_word(hx, f'32*({n}//32) + 8*{u}wi', 8)})), "
             f"({u}hh, {u}ww) -> {_word_round(f'{u}hh', f'{u}ww', f'{u}w')})")
    off4 = f"({n}//8)*8"
    four = _lets(
        [(f"{u}p", _word(hx, off4, 4)),
         (f"{u}q1", _mul64(f"{u}p", str(P1))),
         (f"{u}q2", _xor(f"{u}h1", f"{u}q1")),
         (f"{u}q3", _rot(f"{u}q2", 23))],
        f"(({_mul64(f'{u}q3', str(P2))} + {P3}) % {M64})")
    h2 = (f"(CASE WHEN {n} - {off4} >= 4 THEN {four} "
          f"ELSE {u}h1 END)")
    offb = f"(CASE WHEN {n} - ({n}//8)*8 >= 4 THEN ({n}//8)*8 + 4 ELSE ({n}//8)*8 END)"
    byte_round = _lets(
        [(f"{u}y1", _xor(f"{u}bh", _mul64(f"{u}bb", str(P5)))),
         (f"{u}y2", _rot(f"{u}y1", 11))],
        _mul64(f"{u}y2", str(P1)))
    bytes_loop = (f"list_reduce(list_prepend({u}h2, "
                  f"list_transform(range(0, {n} - {u}ob), "
                  f"{u}bi -> {_byte(hx, f'{u}ob + {u}bi')}::HUGEINT)), "
                  f"({u}bh, {u}bb) -> {byte_round})")
    return _lets(
        [(hx, f"lower(hex(encode({col_expr})))"),
         (n, f"octet_length(encode({col_expr}))"),
         (f"{u}h0", h0),
         (f"{u}h1", words),
         (f"{u}h2", h2),
         (f"{u}ob", offb),
         (f"{u}h3", bytes_loop)],
        _fmix(f"{u}h3", u))
