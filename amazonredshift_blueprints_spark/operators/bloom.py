"""Bloom-filter join pruning: cut the big side of a selective join down
to (approximately) the rows that can match, BEFORE the shuffle.

The 100 TB pattern: a selective dimension predicate ("urgent orders
only") should keep most of the fact table out of the join exchange, but
Spark only injects its own runtime bloom filter when cost heuristics
fire (``spark.sql.optimizer.runtime.bloomFilter.enabled``, shuffle-join
shapes within size thresholds). This operator makes the pruning
EXPLICIT and deterministic: build a Bloom bitmap from the filtered key
set, collect it to the driver (metadata — ``n_bits/64`` longs, 2 KiB at
the 2^17-bit default), and filter the big side row-locally with pure
column expressions. The plan gains a map-side filter and loses most of
its exchange volume; no extra join node, no broadcast machinery.

False positives pass the filter (rate ~(1 - e^{-kn/m})^k); the caller's
actual join removes them, so any downstream equi-join result is EXACT —
which is also why the DuckDB oracle for the catalog entry is simply the
plain join. False negatives are impossible: every inserted key sets all
k of its bits and membership tests the same k positions.

Hashing is xxhash64(key, seed) — JVM-side, whole-stage codegen. The
bitmap never needs to replay in another engine, because it only gates a
superset of the matching rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64
# element_at(_MASKS, b + 1) == the signed-long bit pattern of 1 << b —
# the shift-by-a-column Spark's DataFrame API lacks, as a 64-entry
# lookup literal (bit 63 is the sign bit, hence the negative entry).
_MASKS = [1 << b for b in range(_WORD_BITS - 1)] + [-(1 << (_WORD_BITS - 1))]


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The k bit positions of ``key`` (pmod: ANSI-safe on negative
    hashes)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> list[int]:
    """Aggregate the keys of ``df[key_col]`` into a Bloom bitmap,
    returned as ``n_bits / 64`` driver-side longs.

    Fully distributed: each key explodes to its k bit positions, the
    positions aggregate per 64-bit WORD (``groupBy(word).agg(bit_or)``
    — a shuffle bounded by the word count, not the key count), and only
    the ≤ ``n_bits/64`` (word, bits) rows reach the driver — the same
    metadata-collect contract as the IVF centroid table
    (`similarity._collect_centroids`).

    Size the bitmap to the expected distinct-key count: ~10 bits per
    key keeps the false-positive rate near 1% at k=3; at 4 bits/key
    expect ~12%. Oversizing costs only bitmap bytes (2 KiB per 2^17
    bits). ``n_bits`` must be a positive multiple of 64.
    """
    if n_bits <= 0 or n_bits % _WORD_BITS:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if n_hashes <= 0:
        raise ValueError(f"n_hashes must be positive, got {n_hashes}")
    n_words = n_bits // _WORD_BITS
    pos = _positions(F.col(key_col), n_bits, n_hashes)
    masks = F.lit(_MASKS)
    rows = (
        df.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            (F.col("p") / _WORD_BITS).cast("int").alias("w"),
            F.element_at(masks, F.pmod(F.col("p"), F.lit(_WORD_BITS)).cast("int") + 1).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[int(r["w"])] = int(r["bits"])
    return words


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    *,
    n_hashes: int = 3,
) -> Column:
    """Membership predicate of ``key`` against a driver-held bitmap:
    all k bit positions set → maybe-member (or false positive); any bit
    clear → definitely absent. Row-local expressions over the bitmap
    literal — no join, fully inside whole-stage codegen."""
    n_bits = len(words) * _WORD_BITS
    key = F.col(key) if isinstance(key, str) else key
    arr = F.lit(words)
    masks = F.lit(_MASKS)
    cond = F.lit(True)
    for p in _positions(key, n_bits, n_hashes):
        word = F.element_at(arr, (p / _WORD_BITS).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(p, F.lit(_WORD_BITS)).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_prune(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Filter ``big`` to rows whose ``big_key`` MIGHT appear in
    ``small[small_key]`` — a Bloom superset of the semi-join, meant to
    run under an exact join that removes the false positives.

    Plan shape: the small side reduces to a collected bitmap (one
    word-bounded aggregate + a ≤2 KiB collect at defaults); the big
    side gains one row-local filter — no additional exchange anywhere.
    At 100 TB with a 1%-selective dimension this keeps ~99% of the fact
    table out of the join shuffle that follows.
    """
    words = bloom_build(small, small_key, n_bits=n_bits, n_hashes=n_hashes)
    return big.filter(bloom_might_contain(big_key, words, n_hashes=n_hashes))
