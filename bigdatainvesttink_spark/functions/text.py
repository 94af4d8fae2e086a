"""Text hashing / shingling primitives for the LLM-data operators
(SURVEY.md §2-D1/D2/D4).

Everything here must be reproducible in ANSI SQL by the DuckDB oracle, so
there is no engine-native ``hash()`` anywhere: the stable 60-bit hash is the
top 15 hex chars of md5 (identical in any engine), and every derived hash
(minhash permutations, simhash bits, LSH bands) is exact integer arithmetic
on top of it — overflow-free within BIGINT, which also keeps Spark's ANSI
mode (overflow => error) happy.

Oracle spellings:
  stable_hash60(x)  = CAST(CAST('0x' || substr(md5(x), 1, 15) AS UBIGINT) AS BIGINT)
  minhash_perm(s,i) = ((2*i+1) * (s % 2147483647) + 7919*(i+1)) % 2147483647
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: (a * s' + b) stays < 2^37 — no 64-bit overflow.
MINHASH_PRIME = 2_147_483_647
N_MINHASHES = 32
LSH_BANDS = 8  # 8 bands x 4 rows


def stable_hash60(c: Column | str) -> Column:
    """Deterministic 60-bit hash: int(md5(x)[:15], 16). Engine-portable."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(c: Column | str, sep: str = " ") -> Column:
    """Split to non-empty tokens (documents.text is space-separated)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(col, sep), lambda t: F.length(t) > 0)


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles of an ordered token array (may contain dups;
    wrap in array_distinct for set semantics).

    Implementation note: built from array-level ops (slice + zip_with), NOT
    per-index ``element_at(tokens, i)`` — Catalyst inlines the token
    expression into every element access, so the per-index formulation
    re-splits the text O(len^2) times per row (measured 50x slower at
    sf0.1). zip_with pads to the longer side with nulls; null-propagating
    concat turns partial tail shingles into nulls, which the final filter
    drops — this also covers the len(tokens) < n case for free."""
    sh = F.slice(tokens, 1, F.size(tokens))
    for k in range(1, n):
        part = F.slice(
            tokens, k + 1, F.greatest(F.size(tokens) - k, F.lit(0))
        )
        sh = F.zip_with(sh, part, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(sh, lambda x: x.isNotNull())


def minhash_value(s60: Column, i: Column) -> Column:
    """i-th minhash permutation of a stable-hashed shingle (i in [0,32))."""
    s_mod = s60 % MINHASH_PRIME
    return ((2 * i + 1) * s_mod + 7919 * (i + 1)) % MINHASH_PRIME


def band_weight(i: Column) -> Column:
    """Positional weight 31^(i%4) for order-independent band signatures:
    sig = sum(minhash_i * 31^(i mod 4)) per 4-row band (< 2^48, no overflow)."""
    return (
        F.when(i % 4 == 0, 1)
        .when(i % 4 == 1, 31)
        .when(i % 4 == 2, 961)
        .otherwise(29791)
        .cast("long")
    )


def row_minhash(text_col: Column) -> Column:
    """All 32 minhash slots of one document as a per-row array — the
    STREAMING-SAFE spelling of ``_minhash_parts``'s groupBy-min (identical
    values: min over the same permuted shingle hashes). One fold over the
    distinct shingle set updates every slot via zip_with, so the shingle
    hashing runs exactly once per row (see the ``shingles`` docstring for
    why per-index formulations re-evaluate Catalyst-inlined inputs).
    Documents with no shingle (< 3 tokens) keep the MINHASH_PRIME sentinel
    in every slot — callers must filter those out, as the batch path drops
    them by construction."""
    sh = F.array_distinct(shingles(tokenize(text_col), 3))
    smods = F.transform(sh, lambda s: stable_hash60(s) % MINHASH_PRIME)
    init = F.array_repeat(
        F.lit(MINHASH_PRIME).cast("long"), N_MINHASHES
    )
    idxs = F.sequence(F.lit(0), F.lit(N_MINHASHES - 1))
    return F.aggregate(
        smods,
        init,
        lambda acc, s: F.zip_with(
            acc,
            idxs,
            lambda m, i: F.least(
                m, ((2 * i + 1) * s + 7919 * (i + 1)) % F.lit(MINHASH_PRIME)
            ),
        ),
    )


def row_band_structs(mh_col: Column) -> Column:
    """8 LSH band signatures from a 32-slot ``row_minhash`` array:
    array<struct<band:int, sig:long>>, sig = sum(mh[4b+k] * 31^k) — the
    same weights as ``band_weight``, so row-wise and groupBy band sigs are
    interchangeable. References mh_col 4x per band: pass a MATERIALIZED
    column (own select), not an inline expression."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            (
                F.element_at(mh_col, b * 4 + 1)
                + F.element_at(mh_col, b * 4 + 2) * 31
                + F.element_at(mh_col, b * 4 + 3) * 961
                + F.element_at(mh_col, b * 4 + 4) * 29791
            ).alias("sig"),
        ),
    )
