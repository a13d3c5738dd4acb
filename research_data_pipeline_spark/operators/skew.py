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
