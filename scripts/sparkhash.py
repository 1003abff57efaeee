"""Pure-Python XXH64 compatible with Spark SQL's `xxhash64(...)`.

Implemented from the public xxHash specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) — Spark's
`org.apache.spark.unsafe.hash.XxHash64` is the canonical 64-bit algorithm
reading little-endian words, which is what this module produces.  The
multi-column chaining (`xxhash64(c1, c2, ...)` == fold with the running hash
as seed, initial seed 42) follows Spark's documented HashExpression
semantics.  Validated empirically against Spark for strings of length 0-200
and int/long columns by scripts/gen_literal_oracles.py's self-test.

Used ONLY to generate independent literal-table oracles — the engine never
imports this; Spark's JVM implementation is the thing under test.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    return (_rotl((acc + k * P2) & M, 31) * P1) & M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Canonical XXH64 over a byte string (little-endian word reads)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos + 8 <= n:
        k = int.from_bytes(data[pos : pos + 8], "little")
        h = ((_rotl((h ^ _round(0, k)) & M, 27) * P1) + P4) & M
        pos += 8
    if pos + 4 <= n:
        k = int.from_bytes(data[pos : pos + 4], "little")
        h = ((_rotl((h ^ (k * P1) & M) & M, 23) * P2) + P3) & M
        pos += 4
    while pos < n:
        h = (_rotl((h ^ (data[pos] * P5) & M) & M, 11) * P1) & M
        pos += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark's hashLong path)."""
    return xxh64_bytes((value & M).to_bytes(8, "little"), seed)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (Spark's hashInt path)."""
    return xxh64_bytes((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*cols) -> int:
    """Spark SQL `xxhash64(c1, c2, ...)`: fold the running hash as seed,
    initial seed 42; str → UTF-8 bytes, int → 4-byte path (IntegerType lit),
    ("long", v) → 8-byte path.  Returns a SIGNED 64-bit int like Spark."""
    h = SPARK_SEED
    for c in cols:
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, tuple) and c[0] == "long":
            h = xxh64_long(int(c[1]), h)
        elif isinstance(c, int):
            h = xxh64_int(c, h)
        else:
            raise TypeError(f"unsupported column value {c!r}")
    return _to_signed(h)
