"""Ranking operators, including pandas-parity integer ranks.

The reference stores author ranks computed by pandas
``rank(ascending=0).astype(int)`` (/root/reference/dags/scripts/
final_tables.py:161-164): ties get the *average* rank, then truncation.
Spark's rank()/dense_rank() cannot reproduce that directly; combining
min-rank with a tie-count gives floor(min_rank + (ties-1)/2) exactly.

Scale design — two-phase global rank:

A naive ``rank().over(Window.orderBy(...))`` moves EVERY row into one
partition (WindowExec warns about it), which is a non-starter at fact
scale. Both ranks here instead:

1. aggregate to one row per distinct metric value (map-side combine,
   one small shuffle),
2. run the cumulative window over the *distinct values only* (tiny:
   bounded by cardinality of the metric, not row count),
3. hash-join the (value → rank) map back onto the input.

Rank depends only on the metric value, so this is exact, and the single-
partition stage now touches |distinct values| rows instead of |rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


# Above this many distinct metric values the single-partition
# distinct-value window (step 2 of the module docstring) is itself a
# bottleneck — e.g. ranking a near-unique continuous metric degenerates
# to a global sort on one core. The range-partitioned path below takes
# over there; the window path stays for the common low-cardinality case
# (integer counts like total_pubs) where it is one job cheaper.
RANK_WINDOW_MAX_DISTINCT = 65_536


def _value_ranks(
    df: DataFrame,
    metric: str,
    ascending: bool,
    max_window_distinct: int = RANK_WINDOW_MAX_DISTINCT,
    distinct_hint: int | None = None,
) -> DataFrame:
    """One row per distinct metric value with its min rank and tie count.

    Cardinality-guarded: estimates |distinct(metric)| with one cheap
    partial-aggregate pass; below the guard the cumulative window runs
    over the distinct values in one (small) partition, above it the
    prefix sum is computed range-partitioned — local cumsum within each
    range, plus a |partitions|-sized offset map — so no single-partition
    window exists at any cardinality (same shape as
    ``scalable_prefix_sum``).
    """
    order = F.col(metric).asc() if ascending else F.col(metric).desc()
    hist = df.groupBy(metric).agg(F.count(F.lit(1)).alias("_ties"))
    if distinct_hint is not None:
        n_distinct = distinct_hint
    else:
        n_distinct = df.agg(F.approx_count_distinct(metric).alias("d")).first()["d"]
    if n_distinct <= max_window_distinct:
        # single-partition window BY DESIGN: hist is bounded
        # <= max_window_distinct by the cardinality guard above
        w_before = W.orderBy(order).rowsBetween(W.unboundedPreceding, -1)
        return hist.withColumn(
            "_min_rank", F.coalesce(F.sum("_ties").over(w_before), F.lit(0)) + 1
        )
    sc = df.sparkSession.sparkContext
    n_parts = sc.defaultParallelism
    part = hist.repartitionByRange(n_parts, order).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        W.partitionBy("_pid")
        .orderBy(order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "_before", F.coalesce(F.sum("_ties").over(w_local), F.lit(0))
    ).localCheckpoint()
    totals = {
        r["_pid"]: r["_tot"]
        for r in local.groupBy("_pid").agg(F.sum("_ties").alias("_tot")).collect()
    }
    offsets, run = {}, 0
    for pid in sorted(totals):
        offsets[pid] = run
        run += totals[pid] or 0
    omap = F.create_map(
        *[lit for pid, off in offsets.items() for lit in (F.lit(pid), F.lit(off))]
    )
    return local.withColumn(
        "_min_rank",
        F.col("_before") + F.coalesce(omap[F.col("_pid")], F.lit(0)) + 1,
    ).drop("_pid", "_before")


def pandas_int_rank(
    df: DataFrame,
    metric: str,
    out_col: str = "rank",
    ascending: bool = False,
    distinct_hint: int | None = None,
) -> DataFrame:
    """pandas average-rank truncated to int, descending by default.

    avg rank of a tie group = min_rank + (ties-1)/2; int() truncates →
    floor((2·min_rank + ties − 1)/2).

    ``distinct_hint``: callers that KNOW the metric is dictionary-sized
    (small-integer counts like total_pubs) pass a bound to skip the
    cardinality-estimate job the guard otherwise runs.
    """
    ranks = _value_ranks(df, metric, ascending, distinct_hint=distinct_hint).select(
        metric,
        F.floor((2 * F.col("_min_rank") + F.col("_ties") - 1) / 2.0)
        .cast("bigint")
        .alias(out_col),
    )
    return df.join(ranks, on=metric)


def spark_rank(
    df: DataFrame,
    metric: str,
    out_col: str = "rank",
    ascending: bool = False,
    distinct_hint: int | None = None,
) -> DataFrame:
    """Plain SQL rank() (ties share min rank) — the idiomatic rank, same
    two-phase plan. ``distinct_hint`` as in ``pandas_int_rank``."""
    ranks = _value_ranks(df, metric, ascending, distinct_hint=distinct_hint).select(
        metric, F.col("_min_rank").cast("bigint").alias(out_col)
    )
    return df.join(ranks, on=metric)


def scalable_prefix_sum(
    df: DataFrame, order_col: str, value_col: str, out: str = "running_total",
    n_parts: int | None = None, tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact global running total of ``value_col`` in ``order_col`` order,
    without a global single-partition window.

    Same scale shape as the two-phase ranks above: range-partition on the
    order column (global order across partitions, local order within),
    cumulative-sum inside each partition, then add each partition's
    starting offset — the per-partition totals are a |partitions|-sized
    driver list, not data. The single-partition stage a naive
    ``Window.orderBy`` would create never exists.

    Determinism: ``order_col`` must be UNIQUE per row (as doc_id is for
    d14/m05), or a ``tiebreak`` column list must make the combined order
    key unique — otherwise tie rows get an arbitrary relative order and
    intermediate running totals can differ between runs. (The FINAL
    prefix total after a tie group is order-invariant; the per-row values
    inside the group are not.)
    """
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        W.partitionBy("_pid")
        .orderBy(order_col, *(tiebreak or []))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part.withColumn("_local", F.sum(value_col).over(w)).localCheckpoint()
    totals = {
        r["_pid"]: (r["_tot"], r["_cnt"])
        for r in local.groupBy("_pid").agg(
            F.sum(value_col).alias("_tot"),
            F.count(value_col).alias("_cnt"),  # non-NULL rows only
        ).collect()
    }
    offsets, priors, run, seen = {}, {}, 0, 0
    for pid in sorted(totals):
        offsets[pid] = run
        priors[pid] = seen  # non-NULL values in all EARLIER partitions
        tot, cnt = totals[pid]
        run += tot or 0
        seen += cnt
    if not offsets:
        # empty input: a zero-arg create_map() types as MAP<VOID,VOID> and
        # fails analysis on the int lookup — there is nothing to offset
        return local.withColumn(out, F.col("_local")).drop("_pid", "_local")
    omap = F.create_map(
        *[lit for pid, off in offsets.items() for lit in (F.lit(pid), F.lit(off))]
    )
    pmap = F.create_map(
        *[lit for pid, pr in priors.items() for lit in (F.lit(pid), F.lit(pr))]
    )
    # NULL semantics must match a GLOBAL window sum (the parity oracle and
    # the single-machine mental model): the running total carries through a
    # NULL-value row, and is NULL only while NO non-NULL value has occurred
    # yet globally. Without the prior-count fallback, a NULL row that lands
    # FIRST in a range partition saw a NULL _local and emitted NULL — an
    # output that changed with the partition count (found by the nulled-
    # corpus probe under local[8] vs local[4], round 11).
    off = F.coalesce(omap[F.col("_pid")], F.lit(0))
    return local.withColumn(
        out,
        F.when(F.col("_local").isNotNull(), F.col("_local") + off).otherwise(
            F.when(F.coalesce(pmap[F.col("_pid")], F.lit(0)) > 0, off)
        ),
    ).drop("_pid", "_local")
