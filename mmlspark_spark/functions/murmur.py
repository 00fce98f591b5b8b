"""MurmurHash3 x86/32 with VW's feature-hashing semantics.

Parity: reference ``vw/.../VowpalWabbitMurmurWithPrefix.scala:1-77``
(caches the murmur state of a constant string prefix — the column
name — so each feature value only hashes its suffix bytes) and the
featurizer's murmur-based index assignment
(``VowpalWabbitFeaturizer.scala:24-231``). The repo's default
featurizer path rides Spark's ``FeatureHasher``; this module closes
the byte-for-byte hash-parity gap for feature spaces produced by
VW-hashed models.

The algorithm is the public-domain MurmurHash3_x86_32 (Austin
Appleby, smhasher) — the exact function VW's ``uniform_hash`` and
Spark's ``Murmur3_x86_32.hashUnsafeBytes2`` implement, so the test
suite can cross-check this implementation against Spark's JVM-side
hashing as an independent second implementation.

All arithmetic is masked to 32 bits; returns are unsigned ints in
``[0, 2**32)``.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _body(h1: int, data: bytes) -> int:
    """Mix all complete 4-byte little-endian blocks of ``data``
    (``len(data) % 4 == 0``) into ``h1``."""
    for i in range(0, len(data), 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    return h1


def _tail_and_finish(h1: int, tail: bytes, total_len: int) -> int:
    if tail:
        k1 = int.from_bytes(tail, "little")  # 1-3 bytes, LE, zero-padded
        h1 ^= _mix_k1(k1)
    return _fmix(h1, total_len)


def murmur3_x86_32(data: bytes | str, seed: int = 0) -> int:
    """Canonical MurmurHash3_x86_32; unsigned 32-bit result."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    aligned = len(data) - len(data) % 4
    h1 = _body(seed & _M32, data[:aligned])
    return _tail_and_finish(h1, data[aligned:], len(data))


class Murmur3PrefixState:
    """Murmur state pre-advanced over a constant prefix.

    ``Murmur3PrefixState(prefix, seed).hash(suffix)`` ==
    ``murmur3_x86_32(prefix + suffix, seed)`` — but the prefix's
    complete 4-byte blocks are mixed exactly once at construction, so
    hashing N feature values against the same column-name prefix does
    O(len(suffix)) work per value (the reference's
    VowpalWabbitMurmurWithPrefix.scala optimization)."""

    __slots__ = ("_h1", "_carry", "_prefix_len")

    def __init__(self, prefix: bytes | str, seed: int = 0):
        if isinstance(prefix, str):
            prefix = prefix.encode("utf-8")
        aligned = len(prefix) - len(prefix) % 4
        self._h1 = _body(seed & _M32, prefix[:aligned])
        self._carry = prefix[aligned:]  # 0-3 bytes awaiting a full block
        self._prefix_len = len(prefix)

    def hash(self, suffix: bytes | str) -> int:
        if isinstance(suffix, str):
            suffix = suffix.encode("utf-8")
        data = self._carry + suffix
        aligned = len(data) - len(data) % 4
        h1 = _body(self._h1, data[:aligned])
        return _tail_and_finish(h1, data[aligned:],
                                self._prefix_len + len(suffix))


def vw_hash_string(value: bytes | str, seed: int = 0) -> int:
    """VW's ``hashstring``: an all-digit feature name is its integer
    value plus the (namespace) seed — VW treats pre-indexed features
    as indices — anything else murmurs. Matches the semantics the
    reference featurizer inherits from the native VW hasher."""
    s = value.decode("utf-8") if isinstance(value, bytes) else value
    if s and s.isascii() and s.isdigit():
        return (int(s) + seed) & _M32
    return murmur3_x86_32(s, seed)
