"""Pure-Python twin of Spark's ``xxhash64`` expression.

XXH64 is a public, specified algorithm (Yann Collet's xxHash); Spark's
``F.xxhash64`` applies it with seed 42 to the unsafe-row byte form of each
argument — UTF-8 bytes for strings, 8-byte little-endian for longs — and
chains multiple arguments by feeding the running hash in as the next seed.

This twin exists so the pure-Python correctness oracles can reproduce the
hash-domain sketches (MinHash permutations, SimHash, LSH plane components)
bit-for-bit without a Spark session: tests/test_hash_twin.py pins every
variant against the real Spark expression.
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


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark: string/binary columns, UTF-8)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit integer (Spark's hashLong fast path: the 8-byte
    little-endian body, so identical to xxh64_bytes(le_bytes, seed))."""
    h = (seed + P5 + 8) & M
    h ^= _round(0, value & M)
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit integer (Spark's hashInt path: a 4-byte body —
    NOT the same as the 8-byte long path; F.sequence() yields array<int>,
    so e.g. the MinHash permutation index hashes through here)."""
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


class i32(int):
    """Marker: hash this argument through Spark's 4-byte int path."""


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*args, seed: int = 42) -> int:
    """F.xxhash64(*args) twin: chains args left-to-right, running hash is the
    next arg's seed; returns the signed 64-bit value Spark exposes."""
    h = seed
    for a in args:
        if isinstance(a, bytes):
            h = xxh64_bytes(a, h & M)
        elif isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h & M)
        elif isinstance(a, i32):
            h = xxh64_int(int(a), h & M)
        elif isinstance(a, int):
            h = xxh64_long(a & M, h & M)
        elif isinstance(a, (list, tuple)):
            # array<long> hashes element-wise with the running hash as seed
            for x in a:
                h = xxh64_long(x & M, h & M)
        else:
            raise TypeError(f"unsupported arg type {type(a)}")
    return _signed(h)


# ---------------------------------------------------------------------------
# Sketch twins: pure-Python mirrors of operators/dedup.py's hash-domain
# sketches, built on spark_xxhash64 (parity pinned in tests/test_hash_twin.py)
# ---------------------------------------------------------------------------

import re as _re

_WORD_SPLIT = _re.compile(r"[ \t\r\n\f\x0B]+")


def oracle_shingles(text: str, k: int = 3) -> list[int]:
    """dedup.shingle_hashes twin: distinct xxhash64 of word k-shingles."""
    norm = _WORD_SPLIT.sub(" ", text).lower().strip()
    words = [w for w in norm.split(" ") if w]
    if len(words) >= k:
        seen: dict[int, None] = {}
        for i in range(len(words) - k + 1):
            seen[spark_xxhash64(" ".join(words[i : i + k]))] = None
        return list(seen)
    return [spark_xxhash64(" ".join(words))]


def oracle_minhash(shingles: list[int], num_hashes: int = 64) -> list[int]:
    """dedup.minhash_signature twin (signed min per permutation; the
    permutation index comes from F.sequence -> array<int> -> 4-byte path)."""
    return [
        min(spark_xxhash64(x, i32(j)) for x in shingles)
        for j in range(num_hashes)
    ]


def oracle_simhash(shingles: list[int], bits: int = 64) -> int:
    """dedup.simhash_col twin (bit j set when the +1/-1 vote count > 0)."""
    counts = [0] * bits
    for x in shingles:
        u = x & M
        for j in range(bits):
            counts[j] += 1 if (u >> j) & 1 else -1
    out = 0
    for j in range(bits):
        if counts[j] > 0:
            out |= 1 << j
    return _signed(out)


def oracle_lsh_plane_component(dim_idx: int, plane: int) -> float:
    """similarity._plane_component twin: pmod(xxhash64(dim, plane), 2000)/1000-1.
    dim_idx comes from F.sequence (array<int>) and plane from a python-int
    literal (IntegerType), so both hash through the 4-byte path."""
    h = spark_xxhash64(i32(dim_idx), i32(plane))
    return (h % 2000) / 1000.0 - 1.0


def oracle_hyperplane_bucket(vec: list[float], bits: int = 12) -> int:
    """similarity.hyperplane_bucket twin (float32 inputs widened to double,
    matching the Column expression's cast)."""
    key = 0
    for j in range(bits):
        proj = sum(
            float(x) * oracle_lsh_plane_component(i, j) for i, x in enumerate(vec)
        )
        if proj > 0:
            key |= 1 << j
    return key


def oracle_bloom_positions(text: str, m_bits: int = 1 << 22, k: int = 7) -> list[int]:
    """dedup._bloom_positions twin: seeded xxhash64 chain (4-byte int
    path for the sequence index), masked to the power-of-two bit space.
    Python's ``&`` on a negative int yields the same low bits as Java's,
    so no explicit wrap is needed."""
    return [spark_xxhash64(text, i32(i)) & (m_bits - 1) for i in range(k)]


def oracle_bloom_maybe_dup(
    corpus: list[tuple[int, str]],
    ref_texts: list[str],
    m_bits: int = 1 << 22,
    k: int = 7,
) -> dict[int, bool]:
    """dedup.bloom_filter_table + bloom_probe twin: build the reference
    bit set, probe each corpus doc (all k positions present)."""
    bits: set[int] = set()
    for t in ref_texts:
        bits.update(oracle_bloom_positions(t, m_bits, k))
    return {
        i: all(p in bits for p in oracle_bloom_positions(t, m_bits, k))
        for i, t in corpus
    }
