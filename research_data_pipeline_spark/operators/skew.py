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


def measured_skew_ppm(df: DataFrame, keys: list[str]) -> int:
    """Hot-key skew of ``df`` grouped by ``keys`` as integer ppm —
    max·n_keys·10⁶ div n_rows, i.e. (hottest key) / (uniform share) —
    the exact statistic q43's audit publishes per join key. 1e6 means
    uniform; ≥ 10e6 means one key owns ten partitions' worth of rows.
    One map-side-combined groupBy + a scalar agg; at 100 TB this is the
    cheap pre-pass that replaces salting guesswork (or is read from the
    standing q43 audit table instead of re-measured)."""
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("c")
    )
    # The product rides DECIMAL(38,0): max(c)·count(*)·10⁶ in BIGINT
    # passes 2⁶³ exactly at the 100 TB hot-key scale this guard exists
    # for (hot key ~1e10 rows × 1e5 keys × 1e6 wraps negative and
    # silently disables salting). DECIMAL keeps the division exact, so
    # uniform data still measures exactly 1e6 ppm.
    row = per_key.agg(
        F.expr(
            "CAST(CAST(max(c) AS DECIMAL(38,0)) * count(*) * 1000000"
            " div sum(c) AS BIGINT)"
        ).alias("ppm")
    ).first()
    if row is None or row["ppm"] is None:
        return 1_000_000
    return int(row["ppm"])


def maybe_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    threshold_ppm: int = 10_000_000,
    n_salts: int = 8,
    how: str = "inner",
    skew_ppm: int | None = None,
) -> DataFrame:
    """The join twin of :func:`maybe_salted_agg` — the second 100 TB
    salting decision as code: equi-join ``big`` to ``small`` on ``key``,
    flipping to :func:`salted_join` (big side scattered across
    ``n_salts`` sub-keys, small side replicated) when the measured
    hot-key skew of the BIG side crosses ``threshold_ppm`` (default:
    the hottest key holds ≥ 10× its uniform share — the one customer
    whose rows would otherwise funnel into a single join task).

    ``skew_ppm`` short-circuits the measurement when the caller already
    has the number (the standing q43 audit measures exactly this
    statistic for the five fact join keys); otherwise one map-side-
    combined measurement groupBy runs first. The decision is recorded
    in ``decisions.LAST['maybe_salted_join']``. Both paths produce
    identical rows (salting only re-partitions the pair space), so the
    flip is a pure execution decision — flip-proven both ways on a
    synthetic hot key in tests/test_skew.py.
    """
    from .decisions import record

    ppm = measured_skew_ppm(big, [key]) if skew_ppm is None else int(skew_ppm)
    use_salt = ppm >= threshold_ppm
    record(
        "maybe_salted_join",
        skew_ppm=ppm,
        threshold_ppm=threshold_ppm,
        path="salted" if use_salt else "plain",
    )
    if use_salt:
        return salted_join(big, small, key, n_salts=n_salts, how=how)
    return big.join(small, key, how)


def maybe_salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    threshold_ppm: int = 10_000_000,
    n_salts: int = 8,
    skew_ppm: int | None = None,
) -> DataFrame:
    """The ACTING guard q43's audit feeds: aggregate ``df`` by ``keys``,
    flipping to the two-phase salted reduction when the measured hot-key
    skew crosses ``threshold_ppm`` (default: the hottest key holds ≥ 10×
    its uniform share — ten partitions' worth of rows funneling into one
    reduce task).

    ``skew_ppm`` short-circuits the measurement pass when the caller
    already has the number (the standing q43 audit, a previous call);
    otherwise one measurement groupBy runs first — map-side combined,
    shuffling one row per distinct key. The decision is recorded in
    ``decisions.LAST['maybe_salted_agg']`` so tests and operators assert
    the flip on real inputs rather than parsing AQE-rewritten plans.
    Both paths produce identical rows for the decomposable aggregate set
    (sum/count/min/max) — the salted path's two-phase combine is exact.
    """
    from .decisions import record

    ppm = measured_skew_ppm(df, keys) if skew_ppm is None else int(skew_ppm)
    use_salt = ppm >= threshold_ppm
    record(
        "maybe_salted_agg",
        skew_ppm=ppm,
        threshold_ppm=threshold_ppm,
        path="salted" if use_salt else "plain",
    )
    if use_salt:
        return salted_agg(df, keys, aggs, n_salts=n_salts)
    exprs = []
    for col, fn, out in aggs:
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif fn in ("sum", "min", "max"):
            exprs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    return df.groupBy(*keys).agg(*exprs)
