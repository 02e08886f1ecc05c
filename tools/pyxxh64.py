"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Used ONLY by the expected-output generator (``tools/gen_expected.py``)
so the approximate LSH/IVF operators get an oracle that is computed by
an implementation INDEPENDENT of Spark's JVM one. The algorithm is the
public XXH64 spec (github.com/Cyan4973/xxHash, public domain); Spark's
``XxHash64`` expression applies it per column with seed chaining:
``hash = xxh64(col_i, seed=hash)`` starting from seed 42, where longs
hash via the 8-byte short path, ints via the 4-byte short path, and
strings over their UTF-8 bytes.

Verified bit-for-bit against ``F.xxhash64`` in
``tests/test_expected_oracles.py``.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of a single 64-bit value (Spark LongType path)."""
    value &= M
    h = (seed + P5 + 8) & M
    k1 = _rotl((value * P2) & M, 31) * P1 & M
    h ^= k1
    h = ((_rotl(h, 27) * P1) + P4) & M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of a single 32-bit value (Spark IntegerType path)."""
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = ((_rotl(h, 23) * P2) + P3) & M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark StringType path: UTF-8)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos + 32 <= n:
            for _ in range(4):
                w = int.from_bytes(data[pos : pos + 8], "little")
                if _ == 0:
                    v1 = (_rotl((v1 + w * P2) & M, 31) * P1) & M
                elif _ == 1:
                    v2 = (_rotl((v2 + w * P2) & M, 31) * P1) & M
                elif _ == 2:
                    v3 = (_rotl((v3 + w * P2) & M, 31) * P1) & M
                else:
                    v4 = (_rotl((v4 + w * P2) & M, 31) * P1) & M
                pos += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = ((h * P1) + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos + 8 <= n:
        w = int.from_bytes(data[pos : pos + 8], "little")
        h ^= (_rotl((w * P2) & M, 31) * P1) & M
        h = ((_rotl(h, 27) * P1) + P4) & M
        pos += 8
    if pos + 4 <= n:
        w = int.from_bytes(data[pos : pos + 4], "little")
        h ^= (w * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        pos += 4
    while pos < n:
        h ^= (data[pos] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        pos += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = 42) -> int:
    """Spark-compatible ``F.xxhash64(*cols)``: seed-chained per value.

    Accepts Python ints tagged by width — pass plain ``int`` for
    LongType semantics, ``("int", v)`` for IntegerType, ``str`` for
    StringType. Returns the SIGNED 64-bit result like Spark.
    """
    h = seed & M
    for v in values:
        if isinstance(v, tuple) and v[0] == "int":
            h = hash_int(v[1], h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported type for xxhash64: {type(v)}")
    return _to_signed(h)
