"""Distributed Bloom filter as a DataFrame — membership prefilters at scale.

A daily 100 TB ingest probing a multi-year signature store should not pay
a corpus-sized join for batch rows that are OBVIOUSLY novel. A Bloom
filter over the store's probe keys answers "definitely absent" with zero
false negatives, so the expensive joins only run for rows the filter
cannot rule out.

Representation: the filter is an ordinary DataFrame of 64-bit words —
``(word BIGINT, bits BIGINT)`` with ``word = bit_position / 64`` — built
by one groupBy(word)+bit_or over k·n narrow rows (partial aggregation
makes the shuffle word-count-sized, not input-sized). That makes it:

- mergeable: two filters with the same geometry union + bit_or by word
  (append-mode store writes just append word rows; the loader re-ORs),
- persistable: plain parquet rows, no custom binary format,
- probe-side cheap: membership is k broadcast hash joins against the
  word table (a 2^23-bit filter is 128k rows ≈ 2 MB) — entirely
  map-side, no shuffle on the probed DataFrame.

Hash family: ``xxhash64(value, seed_i)`` — the i-th hash differs by the
appended seed literal column, all JVM-side. False-positive rate follows
the standard (1 - e^(-k·n/m))^k; callers size ``n_bits`` ≥ ~10 bits per
stored key for ~1% FPR with k=5. False negatives are impossible by
construction, which is what lets the prefilter preserve exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 1 << 23
N_HASH = 5


def build(
    values: DataFrame,
    col: str,
    n_bits: int = N_BITS,
    n_hashes: int = N_HASH,
) -> DataFrame:
    """Build the word table for every value in ``values[col]``.

    One narrow explode (k rows per value) + one partially-aggregating
    groupBy(word) — the only shuffle moves at most ``n_bits/64`` rows.
    """
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
                for i in range(n_hashes)
            ]
        )
    ).alias("_b_pos")
    return (
        values.select(pos)
        .select(
            (F.col("_b_pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_b_pos, 64) AS INT))").alias(
                "_m"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(_m)").alias("bits"))
    )


def merge(bloom: DataFrame) -> DataFrame:
    """Re-OR a word table that may contain duplicate word rows (the state
    after append-mode writes of incremental filters with one geometry)."""
    return bloom.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


def with_might_contain(
    probe: DataFrame,
    col: str,
    bloom: DataFrame,
    n_bits: int = N_BITS,
    n_hashes: int = N_HASH,
    out: str = "might_contain",
) -> DataFrame:
    """Append ``out`` BOOLEAN: False ⇒ the value is DEFINITELY not in the
    set the filter was built over; True ⇒ it may be (FPR-bounded).

    k broadcast joins against the word table, no shuffle of ``probe``.
    A word with no set bits has no row, so the join is left and a miss
    reads as absent.
    """
    cur = probe
    acc = F.lit(True)
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
        cur = cur.withColumn(f"_b_pos{i}", pos)
        side = bloom.select(
            F.col("word").alias(f"_b_w{i}"), F.col("bits").alias(f"_b_bits{i}")
        )
        cur = cur.join(
            F.broadcast(side),
            (F.col(f"_b_pos{i}") / 64).cast("long") == F.col(f"_b_w{i}"),
            "left",
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_b_pos{i}, 64) AS INT))")
        acc = acc & F.coalesce(
            F.col(f"_b_bits{i}").bitwiseAND(mask) != 0, F.lit(False)
        )
    cur = cur.withColumn(out, acc)
    drop = [c for i in range(n_hashes) for c in (f"_b_pos{i}", f"_b_w{i}", f"_b_bits{i}")]
    return cur.drop(*drop)
