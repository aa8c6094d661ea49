"""Portable, partition-independent pseudo-randomness and sketching.

The reference anchors reproducibility on fixed RNG seeds
(np.random.seed(42) in Evaluation_Auxiliary/Data_prep.py:17,
setup_seed(21) per trial). A seeded RNG stream is meaningless on a
1000-executor cluster — row order and partition count change the
stream. This engine instead derives per-row pseudo-randomness from
md5 of the row's key: deterministic, uniform, identical on any
cluster layout, and reproducible by any other engine (the DuckDB
oracle computes the same md5), which is what makes the splits
◆-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_rank(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform 'random' sort key for a row.

    md5 hex is uniformly distributed; ordering by it is a seeded
    shuffle. `salt` plays the role of the seed.
    """
    key = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def md5_unit(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform double in [0,1) derived from md5.

    Uses the first 12 hex digits (48 bits) so the conv() stays exact
    in a double. Portable: DuckDB computes the identical value.
    """
    h = md5_rank(key, salt)
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(
        float(16 ** 12)
    )


def md5_bucket(key: Column | str, n: int, salt: str = "") -> Column:
    """Deterministic bucket in [0, n) — the k-fold assignment (R2)."""
    h = md5_rank(key, salt)
    return F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(n))


def shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of a string (dedup primitive).

    O(len^2) per document: each ``substr(i, k)`` seeks from the
    string head (UTF8String is variable-width), so this form is only
    for SHORT strings / compatibility. Corpus-scale callers must use
    the two-step ``char_array`` + ``shingles_from_chars`` — the zipf
    doc-length study measured the quadratic term as a 17x signature-
    pass blow-up at 3x volume (SCALE_SPOT_r12 doc_skew_phase_isolation).
    """
    t = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    )


def char_array(text: Column | str) -> Column:
    """Single-character array of a string — the O(len) materialization
    step for shingles_from_chars. split('', -1) keeps a trailing empty
    element (Java regex split semantics), sliced off here; the empty
    string maps to [''] so downstream keeps the one-shingle-per-doc
    floor the substr form has."""
    t = F.col(text) if isinstance(text, str) else text
    return F.slice(F.split(t, ""), 1, F.greatest(F.length(t), F.lit(1)))


def shingles_from_chars(chars: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles from a MATERIALIZED char-array
    column (``char_array(text)`` landed in its OWN projection) —
    bit-identical output to ``shingles`` at O(len) instead of
    O(len^2): element_at on an array is O(1) where substr on a string
    seeks from the head.

    Takes a column, not an inline split, for the same reason
    word_ngrams_from_tokens does: HOF lambdas run interpreted with NO
    common-subexpression elimination, so an inline char split would
    re-split the text once per element and hand the quadratic term
    right back. concat_ws skips the NULLs try_element_at returns past
    the array end (plain element_at raises under ANSI mode, the Spark
    4 default), reproducing substr's short-tail semantics for strings
    shorter than k."""
    ch = F.col(chars) if isinstance(chars, str) else chars
    n = F.greatest(F.size(ch) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(
                "", *[F.try_element_at(ch, i + F.lit(j)) for j in range(k)]
            ),
        )
    )


# Linear-permutation constants for MinHash: h_s = (A[s]*h + B[s]) mod P.
# P is the largest prime below 2^48; A[s] < 2^15 keeps A*h < 2^63 (no
# 64-bit overflow in either engine, which would error under ANSI mode).
# Fixed constants => reproducible signatures everywhere.
MINHASH_P = 281474976710597  # largest prime < 2^48
MINHASH_A = [24593, 12289, 6151, 3079, 1543, 769, 389, 196_61, 98_39, 49_19,
             24_59, 12_27, 613, 307, 153_1, 767_3]
MINHASH_B = [(s + 1) * 1099511628211 % MINHASH_P for s in range(16)]


def minhash_base_hashes(shingle_arr: Column) -> Column:
    """48-bit base hash per shingle (one md5 each — the expensive pass).

    Callers should land this in its own projection so the permutation
    layer reads a materialized column instead of recomputing md5
    per permutation (CollapseProject keeps non-cheap expressions
    single-evaluated, but an explicit column boundary is clearer).
    """
    return F.transform(
        shingle_arr,
        lambda sh: F.conv(F.substring(F.md5(sh), 1, 12), 16, 10).cast("long"),
    )


def minhash_from_base(base: Column | str, num_perm: int = 16) -> Column:
    """MinHash signature as array<long>: per permutation s, min over
    base hashes of (A[s]*h + B[s]) mod P. Cheap integer arithmetic,
    bit-portable — DuckDB computes the identical integers."""
    base = F.col(base) if isinstance(base, str) else base
    return F.array(
        *[
            F.array_min(
                F.transform(
                    base,
                    lambda h: (F.lit(MINHASH_A[s]) * h + F.lit(MINHASH_B[s]))
                    % F.lit(MINHASH_P),
                )
            )
            for s in range(num_perm)
        ]
    )


def minhash_signature(shingle_arr: Column, num_perm: int = 16) -> Column:
    """One-shot MinHash signature (compose base + permutations)."""
    return minhash_from_base(minhash_base_hashes(shingle_arr), num_perm)


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into band keys: array of (band_idx, band_hash).

    Equal band_hash within the same band_idx => LSH candidate pair.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    "|",
                )
            ).alias("bucket"),
        ),
    )
