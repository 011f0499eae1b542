"""Deterministic cross-engine hashing primitives (dedup family).

All hashes derive from md5 so an ANSI-SQL oracle (DuckDB) reproduces
them bit-for-bit:

    hash32(s)            = int(md5(s)[:8], 16)          -- in [0, 2^32)
    minhash_hex(toks, k) = min over toks of md5(k || ':' || tok)[:8]

``minhash_hex`` keeps the 8-char lowercase-hex *string* min — the
lexicographic min of fixed-width hex equals the numeric min, and both
engines order ASCII identically, so no integer conversion is needed.

Scale: pure column expressions — at 100 TB these run inside
WholeStageCodegen with zero Python/JVM crossings; the md5 per token is
CPU-bound but embarrassingly parallel and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for rolling fingerprints — small enough that acc*31 + 2^32
#: never overflows int64
FINGERPRINT_MOD = 1_000_000_007


def hash32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative bigint.

    DuckDB twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def hash_hex8(col: Column) -> Column:
    """First 8 hex chars of md5 (string). DuckDB: ``substr(md5(x),1,8)``."""
    return F.substring(F.md5(col.cast("string")), 1, 8)


def seeded_hash_hex8(col: Column, seed: int) -> Column:
    """Seeded variant: md5('<seed>:' || x)[:8]."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 8)


#: universal-hashing MinHash parameters: sig_s = min over tokens of
#: (a_s * hash32(tok) + b_s) mod MINHASH_MOD. One md5 per token total;
#: the per-seed permutations are integer ops (Broder 1997 / Carter &
#: Wegman universal hashing). a_s*h <= 2^20 * 2^32 < 2^63 — no overflow.
MINHASH_MOD = 1_000_000_007
MINHASH_SEEDS: list[tuple[int, int]] = [
    (131, 7), (137, 101), (139, 211), (149, 307),
    (151, 401), (157, 503), (163, 601), (167, 701),
]


def minhash_int_array(tokens: Column, seeds: list[tuple[int, int]] | None = None) -> Column:
    """All MinHash signature values in ONE fold over the token array:
    the accumulator is the running vector of per-seed minima, so the
    expensive md5 base hash runs exactly once per token regardless of
    signature width.

    DuckDB twin (per seed s, over hv = list of base hashes):
    ``list_aggregate(list_transform(hv, h -> (a_s*h + b_s) % 1000000007), 'min')``
    """
    seeds = seeds or MINHASH_SEEDS
    hashed = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    init = F.array(*[F.lit(MINHASH_MOD).cast("long") for _ in seeds])

    def step(acc: Column, h: Column) -> Column:
        return F.array(*[
            F.least(F.element_at(acc, i + 1),
                    (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_MOD))
            for i, (a, b) in enumerate(seeds)
        ])

    return F.aggregate(hashed, init, step)


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive rolling polynomial hash over a token sequence:
    ``acc = (acc*31 + hash32(tok)) % FINGERPRINT_MOD`` starting at 0.

    The document-fingerprinting kernel of the training-data pipeline —
    order-sensitive (unlike the MinHash/Jaccard set hashes) so
    re-ordered near-duplicates get distinct prints.

    DuckDB twin (list_reduce has no zero, so prepend it):
    ``list_reduce(list_prepend(0, list_transform(toks, t ->
    ('0x'||substr(md5(t),1,8))::BIGINT)), (a, b) -> (a*31 + b) % 1000000007)``
    """
    hashed = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(FINGERPRINT_MOD),
    )
