"""Skew mitigation: salted joins.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but only for sort-merge joins it can observe.
Salting is the explicit fallback for pathological keys (the one customer
with 10⁹ rows): replicate the small side R times and scatter the big side
across R sub-keys — the hot key's rows spread over R tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side scattered across ``n_salts`` sub-keys.

    Deterministic salt (hash of all big-side columns mod R, not rand())
    keeps retries/replays stable. The small side is exploded R times —
    use only when `small` is genuinely small or the skew is worse than
    the replication.
    """
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int"),
    )
    salts = F.array(*[F.lit(s) for s in range(n_salts)])
    salted_small = small.withColumn("_salt", F.explode(salts))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for pathologically hot group keys: phase 1
    aggregates on (keys + deterministic salt) so a hot key's rows reduce
    in ``n_salts`` parallel tasks; phase 2 combines the per-salt partials
    on the real keys — a shuffle of at most ``n_salts`` rows per key.

    ``aggs`` is (source_col, fn, out_name) with fn ∈ sum/count/min/max —
    the decomposable aggregates whose two-phase combine is exact
    (count combines by SUM; the rest by themselves). Spark's own partial
    aggregation already splits map-side work; salting additionally
    splits the REDUCE side, which partial aggregation cannot do when one
    key dominates a shuffle partition. Deterministic salt (hash of all
    columns, not rand()) keeps retries and replays stable.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int"),
    )
    phase1 = []
    combine = []
    for col, fn, out in aggs:
        part = f"_p_{out}"
        if fn == "count":
            phase1.append(F.count(F.lit(1)).alias(part))
            combine.append(F.sum(part).alias(out))
        elif fn == "sum":
            phase1.append(F.sum(col).alias(part))
            combine.append(F.sum(part).alias(out))
        elif fn == "min":
            phase1.append(F.min(col).alias(part))
            combine.append(F.min(part).alias(out))
        elif fn == "max":
            phase1.append(F.max(col).alias(part))
            combine.append(F.max(part).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    return (
        salted.groupBy(*keys, "_salt")
        .agg(*phase1)
        .groupBy(*keys)
        .agg(*combine)
    )
