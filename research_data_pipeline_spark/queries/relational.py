"""Relational operator suite over the TPC-H-ish test tables.

Each query exercises one (or a cluster of) operators from SURVEY.md §2 —
the capability inventory of the reference pipeline — re-expressed as
declarative Spark plans so Catalyst handles pushdown/pruning/join
selection. Reference citations in each docstring point at the behavior
being reproduced (file:line in /root/reference).

Scale notes are inline: every query here is a shape that survives a
1000-executor 100 TB run — broadcast for dims, partial aggregation before
shuffle, no driver-side loops (the single driver-side ``count()`` used for
computed-k top-k is a scalar, reference W3 semantics require it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import REGISTRY
from ..tables import epoch_us, load

D = "decimal(12,4)"  # exact for 2-decimal money/qty data, product-safe ≤38 digits


def _dec(c) -> F.Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(D)


# ---------------------------------------------------------------------------
# A1/A2/A3 group aggregations — reference final_tables.py:125-158, README Q3
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
               AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
                    * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
               AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "agg",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate scan (SURVEY A1-A3; final_tables.py:153-154).

    Scale: partial aggregation map-side, 2-key groupBy → tiny shuffle;
    decimal sums are associative so results are retry-stable.

    r14 nanmoney swap: every double→DECIMAL cast uses the loud
    ``money_dec`` helper — Spark's plain cast maps NaN→NULL silently
    (trace-less row loss from every sum) while the DuckDB oracle refuses
    NaN→DECIMAL loudly; the helper matches the oracle's refusal class
    and is byte-identical to the inline cast on NaN-free corpora.
    """
    from ..functions.core import money_dec

    l = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(D)
    disc_price = money_dec("l_extendedprice") * (one - money_dec("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (one + money_dec("l_tax"))).cast("double").alias("sum_charge"),
            (F.sum(money_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J3 multi-way join chain — reference README.md:204-206,238-239 (DWH Q2-Q4)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q02_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(12,4)) - CAST(l.l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
               AS revenue,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    "join",
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3+-way inner join chain (SURVEY J3) with dimension broadcast.

    Scale: nation/region/customer are dims → broadcast (no shuffle past
    the fact⋈fact step). Revenue is PRE-AGGREGATED per order before the
    lineitem⋈orders join (r14, guide §2.3 aggregate-before-shuffle):
    the join's orderkey exchange doubles as the aggregation exchange, the
    per-nation ``countDistinct(o_orderkey)`` becomes a plain ``count``
    (one row per order survives the pre-agg), and the expand +
    lineitem-grain re-shuffle that countDistinct forced is gone — one
    fact-sized exchange instead of two. Decimal sums are exact and
    associative, so the two-stage sum is value-identical to the one-stage
    sum the oracle computes.

    r14 nanmoney swap: revenue casts go through the loud ``money_dec``
    (oracle-matching NaN refusal; identical on clean corpora).
    """
    from ..functions.core import money_dec

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    one = F.lit(1).cast(D)
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(money_dec("l_extendedprice") * (one - money_dec("l_discount")))
        .alias("_rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum("_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A6 mode()-with-tiebreak — reference README.md:199,208 (Postgres mode())
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q03_mode_priority",
    """
    WITH counted AS (
        SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey, o_orderpriority
    ), ranked AS (
        SELECT o_custkey, o_orderpriority, cnt,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        FROM counted
    )
    SELECT o_custkey, o_orderpriority AS mode_priority, CAST(cnt AS BIGINT) AS n_orders
    FROM ranked WHERE rn = 1
    """,
    "agg",
    "window",
)
def q03_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with deterministic tie-break (SURVEY A6).

    Postgres ``mode() WITHIN GROUP (ORDER BY x)`` breaks count-ties by the
    ORDER BY (README.md:199); Spark has no mode-with-tiebreak builtin, so
    this is the canonical rewrite: count per (group, value) then
    row_number over (count DESC, value ASC).
    """
    o = load(spark, sf_dir, "orders")
    counted = o.groupBy("o_custkey", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("o_custkey").orderBy(F.col("cnt").desc(), F.col("o_orderpriority").asc())
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J4/W5 greatest-per-group keeping ties — reference README.md:209-220
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q04_top_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        FROM orders
    ) WHERE rk = 1
    """,
    "window",
)
def q04_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-per-group via rank(), keeping ALL ties (SURVEY J4).

    The reference expresses this as a null-rejecting self LEFT JOIN
    (README.md:209-220), whose semantics keep every tied row — hence
    rank()==1 (not row_number) is the faithful window rewrite.
    """
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.withColumn("rk", F.rank().over(w))
        .where(F.col("rk") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# A8 h-index — reference augmentations.py:125-148, final_tables.py:146,158
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q05_part_hindex",
    """
    WITH ranked AS (
        SELECT l_partkey, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                                  ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    )
    SELECT l_partkey,
           CAST(COALESCE(MAX(CASE WHEN l_quantity >= rn THEN rn END), 0) AS BIGINT) AS hindex
    FROM ranked GROUP BY l_partkey
    """,
    "window",
    "custom-agg",
)
def q05_part_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h-index as a pure window+agg plan (SURVEY A8).

    The reference computes an author's h-index with a per-author Python
    binary search over sorted citation counts (augmentations.py:125-148)
    inside an O(authors × authorship) driver loop (final_tables.py:143-158).
    Spark-first: row_number over quantity DESC within the group, then
    h = max(rn where metric ≥ rn) — one shuffle, no UDF, works unchanged
    on 10^9 groups. Here: per-part h-index over line quantities.
    """
    from ..operators.hindex import hindex

    l = load(spark, sf_dir, "lineitem")
    return hindex(
        l,
        group_cols=["l_partkey"],
        metric=F.col("l_quantity"),
        tiebreak=[F.col("l_orderkey"), F.col("l_linenumber")],
    ).select("l_partkey", "hindex")


# ---------------------------------------------------------------------------
# A9 pandas int-truncated average rank — reference final_tables.py:161-164
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q06_customer_order_rank",
    """
    WITH counts AS (
        SELECT o_custkey, COUNT(*) AS total_orders FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, total_orders,
               RANK() OVER (ORDER BY total_orders DESC) AS min_rank,
               COUNT(*) OVER (PARTITION BY total_orders) AS ties
        FROM counts
    )
    SELECT o_custkey, CAST(total_orders AS BIGINT) AS total_orders,
           CAST(FLOOR((2 * min_rank + ties - 1) / 2.0) AS BIGINT) AS rank_pandas
    FROM ranked
    """,
    "window",
    "parity",
)
def q06_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``rank(ascending=False).astype(int)`` parity (SURVEY A9).

    pandas assigns ties the *average* rank then the reference truncates to
    int (final_tables.py:161-164): avg = min_rank + (ties-1)/2, truncated
    → floor((2·min_rank + ties − 1)/2). Spark's rank()/dense_rank() alone
    can't reproduce this; combining rank() with a tie-count window does.
    """
    from ..operators.ranks import RANK_WINDOW_MAX_DISTINCT, pandas_int_rank

    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("total_orders"))
    return pandas_int_rank(
        counts, metric="total_orders", out_col="rank_pandas",
        distinct_hint=RANK_WINDOW_MAX_DISTINCT,  # order counts: dictionary-sized
    ).select(
        "o_custkey", "total_orders", "rank_pandas"
    )


# ---------------------------------------------------------------------------
# P6/P7 semi/anti joins — reference final_tables.py:100,116 / raw_to_tables.py:180-187
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q07_semi_anti_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "join",
)
def q07_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left_semi, NOT-IN → left_anti (SURVEY P6/P7).

    The reference's ``isin(other_df[col])`` consistency filters
    (final_tables.py:100,116) and NaN-author exclusions
    (raw_to_tables.py:180-187) are exactly semi/anti joins — hash-join
    shapes that scale, unlike a broadcast ``isin`` literal list.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    open_keys = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(open_keys, c.c_custkey == open_keys.o_custkey, "left_semi")
        .join(f_keys, c.c_custkey == f_keys.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# J6 + A5 self-join two-hop distinct — reference final_tables.py:148-150
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q08_cosupplier_count",
    """
    SELECT a.l_suppkey AS s_suppkey,
           CAST(COUNT(DISTINCT b.l_suppkey) AS BIGINT) AS n_cosuppliers
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    GROUP BY a.l_suppkey
    """,
    "join",
    "graph",
)
def q08_cosupplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop distinct count without a self-join (SURVEY J6 + A5).

    Mirrors the reference's unique-coauthor stat (final_tables.py:148-150:
    authors on my articles, minus me). Derived from the shared
    co-supplier edge table (one row per distinct (src, dst) pair), so
    the distinct count collapses to a per-src row count — one exchange
    over the memo's blocks; the self-join formulation pays three
    exchanges for the same number.
    """
    from .graph_analytics import _co_edge_table

    # the shared co-supplier edge table already holds one row per
    # distinct (src, dst) pair, so the two-hop distinct count is a plain
    # per-src row count over the memo's materialized blocks — the inline
    # collect_set + double-explode derivation this replaces is exactly
    # how the memo itself is built (graph.build.co_occurrence_edges)
    return (
        _co_edge_table(spark, sf_dir)
        .groupBy(F.col("src").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cosuppliers"))
    )


# ---------------------------------------------------------------------------
# E3/F6 split + explode — reference raw_to_tables.py:94,132
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q09_part_name_tokens",
    """
    SELECT t.word AS word, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM part, UNNEST(string_split(p_name, ' ')) AS t(word)
    GROUP BY t.word
    """,
    "explode",
)
def q09_part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split + explode + re-aggregate (SURVEY E3/F6; raw_to_tables.py:132).

    Same shape as the reference's space-delimited ``categories`` →
    article_category fan-out.
    """
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"), "p_retailprice")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_dec("p_retailprice")).cast("double").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# W1/W2 running aggregate window — SURVEY §2.5 extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q10_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
    "window",
)
def q10_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (frame-spec window, SURVEY W6 extension).

    Decimal accumulation keeps the prefix sums exact → deterministic
    across partitionings.

    r14 nanmoney swap: ``money_dec`` keeps the prefix-sum cast loud on
    NaN (oracle-matching; identical on clean corpora).
    """
    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# W3 computed-k top-k — reference README.md:188 (LIMIT 0.01% of COUNT(*))
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q11_top_pct_customers",
    """
    WITH k AS (SELECT CAST(FLOOR(COUNT(*) * 0.005) AS BIGINT) AS k FROM customer),
    ranked AS (
        SELECT c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    SELECT c_custkey, c_name, c_acctbal FROM ranked, k WHERE rn <= k.k
    """,
    "topk",
)
def q11_top_pct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with *computed* k (SURVEY W3; README.md:188).

    Every reference DWH query limits to the top 0.01% of a driver-computed
    COUNT(*). Spark's LIMIT needs a literal → two-phase: scalar count on
    the driver, then orderBy + limit, which Spark executes as a
    TakeOrderedAndProject (no global sort materialization).
    """
    c = load(spark, sf_dir, "customer")
    k = int(c.count() * 0.005)
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(k)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# F2-F13 scalar string functions — reference raw_to_tables.py:97-113
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q12_string_normalize",
    """
    SELECT c_custkey,
           TRIM(REGEXP_REPLACE(LOWER(c_name), '[^a-z0-9]', '', 'g')) AS norm_name,
           SUBSTRING(c_mktsegment, 1, 1) AS seg_initial,
           CONCAT(TRIM(REGEXP_REPLACE(LOWER(c_name), '[^a-z0-9]', '', 'g')),
                  SUBSTRING(c_mktsegment, 1, 1)) AS derived_id,
           STRING_SPLIT(c_name, '#')[1] AS name_prefix,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len
    FROM customer
    WHERE LENGTH(c_name) > 10
    """,
    "scalar",
)
def q12_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string pipeline (SURVEY F2-F9, P4).

    Mirrors the reference's author_id construction: strip punctuation,
    lower, first-initial concat (raw_to_tables.py:104-113) and the
    title-length filter (raw_to_tables.py:66). All JVM-side builtins —
    whole-stage-codegen keeps this in one pass over the scan.
    """
    c = load(spark, sf_dir, "customer")
    norm = F.trim(F.regexp_replace(F.lower(F.col("c_name")), "[^a-z0-9]", ""))
    return (
        c.where(F.length("c_name") > 10)
        .select(
            "c_custkey",
            norm.alias("norm_name"),
            F.substring("c_mktsegment", 1, 1).alias("seg_initial"),
            F.concat(norm, F.substring("c_mktsegment", 1, 1)).alias("derived_id"),
            F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
            F.length("c_name").cast("bigint").alias("name_len"),
        )
    )


# ---------------------------------------------------------------------------
# E1 deterministic dedup — reference raw_to_tables.py:58 (keep='first')
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q13_first_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey,
           epoch_us(o_orderdate) AS first_orderdate_us, o_totalprice AS first_totalprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    "dedup",
)
def q13_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup (SURVEY E1).

    pandas ``drop_duplicates(keep='first')`` (raw_to_tables.py:58) depends
    on row order, which Spark does not guarantee — the scalable equivalent
    pins an explicit order with row_number. ``deterministic_dedup`` is the
    library operator.
    """
    from ..operators.dedup_relational import deterministic_dedup

    o = load(spark, sf_dir, "orders")
    return deterministic_dedup(
        o, keys=["o_custkey"], order_by=[F.col("o_orderdate"), F.col("o_orderkey")]
    ).select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        epoch_us("o_orderdate").alias("first_orderdate_us"),
        F.col("o_totalprice").alias("first_totalprice"),
    )


# ---------------------------------------------------------------------------
# E5 set operations — SURVEY §2.6 extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q14_set_ops",
    """
    SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    INTERSECT
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setop",
)
def q14_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (SURVEY E5)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    f_orders = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.union(rich).distinct().intersect(with_orders).exceptAll(f_orders).distinct()


# ---------------------------------------------------------------------------
# A11 rollup — SURVEY §2.4 extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q15_rollup_revenue",
    """
    SELECT r.r_name, n.n_name,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    "agg",
)
def q15_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup totals (SURVEY A11).

    r13 nanmoney swap: the revenue sum uses the loud ``money_dec`` cast —
    Spark's silent NaN→NULL DECIMAL cast would drop poisoned prices from
    the rollup without a trace while the oracle refuses loudly. Raises on
    the nanmoney corpus, byte-identical on clean ones (both pinned by
    tests/test_nan_inputs.py)."""
    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(money_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# G7 co-occurrence edges with multiplicity — reference research_pipeline_dag.py:353-357
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q16_cosupplier_edges",
    """
    SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
           CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS n_shared_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
    """,
    "graph",
)
def q16_cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence edge derivation, both directions (SURVEY J6/G7).

    The reference's COAUTHORS Cypher CREATE emits both directions and one
    edge per shared article (research_pipeline_dag.py:353-357); here the
    multiplicity is carried as an explicit weight column — the scalable
    representation of a multi-edge.
    """
    from .graph_analytics import _co_edge_table

    return _co_edge_table(spark, sf_dir).select(
        "src", "dst", "n_shared_orders"
    )


# ---------------------------------------------------------------------------
# A4 exact median / percentiles — reference final_tables.py:155 (np.median)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q17_segment_price_stats",
    """
    SELECT c.c_mktsegment,
           MEDIAN(o.o_totalprice) AS median_price,
           MIN(o.o_totalprice) AS min_price,
           MAX(o.o_totalprice) AS max_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice IS NULL OR NOT isnan(o.o_totalprice)
    GROUP BY c.c_mktsegment
    """,
    "agg",
)
def q17_segment_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact group median (SURVEY A4; np.median at final_tables.py:155).

    ``median`` is exact (interpolating) in both engines; at 100 TB one
    would switch to ``percentile_approx`` — exposed by the same operator
    with approx=True — but reference parity needs the exact statistic.

    NaN-exclusion domain contract (r13, nanmoney class): Spark's
    percentile sorts NaN HIGH (an orderable value that shifts the
    median) while DuckDB's quantile ignores it — a SILENT value
    divergence on poisoned money columns. Both engines exclude NaN
    prices from the stats domain; NULL prices stay (ignored by the
    aggregates on both engines). Identical output on NaN-free corpora;
    pinned both ways by tests/test_nan_inputs.py on the nanmoney corpus.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_totalprice").isNull() | ~F.isnan("o_totalprice"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.median("o_totalprice").alias("median_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot — SURVEY §2.6 reshaping extension
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q18_user_event_pivot",
    """
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    "reshape",
)
def q18_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with pinned value list (deterministic columns at any scale)."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = e.groupBy("user_id").pivot("event_type", types).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in types]
    )


# ---------------------------------------------------------------------------
# F14 date functions — idiomatic variant of the reference's split-year
# (raw_to_tables.py:152); full date arithmetic is engine extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q19_order_date_parts",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS o_quarter,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
           CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS INT) AS o_dow,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00') AS INT)
               AS days_to_1999
    FROM orders
    """,
    "scalar",
    "date",
)
def q19_order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + truncation + day arithmetic (SURVEY F14).

    The reference extracts year by string split (raw_to_tables.py:152);
    the engine's idiomatic path is typed date functions — all JVM
    builtins, fused into the scan by whole-stage codegen.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.quarter(d).alias("o_quarter"),
        F.month(d).alias("o_month"),
        F.dayofweek(d).alias("o_dow"),
        epoch_us(F.date_trunc("month", d)).alias("month_start_us"),
        F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date")).alias("days_to_1999"),
    )


# ---------------------------------------------------------------------------
# F11 formatted percent + conditional aggregation — reference README.md:198
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q20_urgent_share_by_nation",
    """
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT') AS BIGINT)
               AS n_urgent,
           printf('%d%%', CAST(FLOOR(
               COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT') * 100.0 / COUNT(*)
           ) AS BIGINT)) AS urgent_pct
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "scalar",
    "format",
)
def q20_urgent_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional count + TO_CHAR-style percent formatting (SURVEY F11;
    README.md:198 ``TO_CHAR(x,'fm99%')``)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    urgent = F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1))
    total = F.count(F.lit(1))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            total.alias("n_orders"),
            urgent.alias("n_urgent"),
            F.format_string(
                "%d%%", F.floor(urgent * 100.0 / total).cast("bigint")
            ).alias("urgent_pct"),
        )
    )


# ---------------------------------------------------------------------------
# J5 dual-key lookup with fallback — reference augmentations.py:105-113
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q21_dualkey_nation_lookup",
    """
    WITH print_idx AS (
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 3
    )
    SELECT s.s_suppkey,
           COALESCE(p.n_name, e.n_name) AS nation_name,
           CASE WHEN p.n_name IS NOT NULL THEN 'print' ELSE 'electronic' END
               AS match_source
    FROM supplier s
    LEFT JOIN print_idx p ON s.s_nationkey = p.n_nationkey
    LEFT JOIN nation e ON s.s_nationkey = e.n_nationkey
    """,
    "join",
)
def q21_dualkey_nation_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-index lookup with fallback index + coalesce (SURVEY J5).

    The reference matches journal ISSNs against a print index first and an
    electronic index as fallback (augmentations.py:105-113). Two broadcast
    left joins + COALESCE is the scalable generalization — no driver-side
    membership dicts.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = n.where(F.col("n_regionkey") < 3).select(
        F.col("n_nationkey").alias("p_key"), F.col("n_name").alias("p_name")
    )
    e = n.select(F.col("n_nationkey").alias("e_key"), F.col("n_name").alias("e_name"))
    return (
        s.join(F.broadcast(p), s.s_nationkey == p.p_key, "left")
        .join(F.broadcast(e), s.s_nationkey == e.e_key, "left")
        .select(
            "s_suppkey",
            F.coalesce("p_name", "e_name").alias("nation_name"),
            F.when(F.col("p_name").isNotNull(), "print")
            .otherwise("electronic")
            .alias("match_source"),
        )
    )


# ---------------------------------------------------------------------------
# G6 collect + unwind — reference analytical_queries.ipynb cells 57-59
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q22_collect_unwind_priorities",
    """
    WITH collected AS (
        SELECT o_custkey,
               list_sort(list_distinct(list(o_orderpriority))) AS prios
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           array_to_string(prios, ',') AS priorities,
           CAST(len(prios) AS BIGINT) AS n_distinct_priorities
    FROM collected
    """,
    "reshape",
    "graph",
)
def q22_collect_unwind_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect → sort → stringify per group (SURVEY G6 collect/UNWIND;
    analytical_queries.ipynb cells 57-59).

    ``collect_set`` + ``array_sort`` keeps the array deterministic under
    any partitioning — the invariant that makes collect usable at scale.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set("o_orderpriority")).alias("prios"))
        .select(
            "o_custkey",
            F.array_join("prios", ",").alias("priorities"),
            F.size("prios").cast("bigint").alias("n_distinct_priorities"),
        )
    )


# ---------------------------------------------------------------------------
# E4 posexplode — SURVEY §2.6 (order-preserving explode)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q23_part_name_positions",
    """
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos,
           string_split(p_name, ' ')[i] AS word
    FROM part, UNNEST(generate_series(1, len(string_split(p_name, ' ')))) AS t(i)
    """,
    "explode",
)
def q23_part_name_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (SURVEY E4) — source order retained as a column,
    the deterministic replacement for pandas implicit row order."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word")
    )


# ---------------------------------------------------------------------------
# A11 cube — SURVEY §2.4 extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q24_cube_revenue",
    """
    SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
           COALESCE(o.o_orderstatus, 'ALL') AS status,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY CUBE (c.c_mktsegment, o.o_orderstatus)
    """,
    "agg",
)
def q24_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (SURVEY A11). Grouping keys are
    non-null in the data, so COALESCE labels the subtotal rows.

    r14 nanmoney swap: revenue cast is the loud ``money_dec``."""
    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum(money_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# P3/P8 regex predicate + null inspection — reference raw_to_tables.py:62-63
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q25_regex_part_filter",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE regexp_matches(p_type, 'BRASS|COPPER')
      AND NOT regexp_matches(p_name, 'gree.')
      AND p_name IS NOT NULL
    """,
    "filter",
)
def q25_regex_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-contains include + exclude predicates (SURVEY P3, P2/P8).

    Mirrors the reference's ``contains('cs.')`` / ``~contains('physics')``
    pair (raw_to_tables.py:62-63) including the unescaped-dot wildcard
    semantics ('gree.' matches 'green' + any char). rlike pushes into the
    scan predicate."""
    p = load(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_type").rlike("BRASS|COPPER")
            & ~F.col("p_name").rlike("gree.")
            & F.col("p_name").isNotNull()
        )
        .select("p_partkey", "p_name", "p_type")
    )


# ---------------------------------------------------------------------------
# W4 ntile buckets — SURVEY §2.5 extension surface
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q26_acctbal_quartiles",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    """,
    "window",
)
def q26_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ntile quartiles — partitioned window (no global sort),
    deterministic tie-break on the key."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile"))


# ---------------------------------------------------------------------------
# Data profiling — quality surface (quality.py checks, as a queryable op)
# ---------------------------------------------------------------------------
@REGISTRY.add(
    "q27_profile_customer",
    """
    SELECT 'c_name' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(c_name) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
           COUNT(DISTINCT c_mktsegment) FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
           COUNT(DISTINCT c_nationkey) FROM customer
    UNION ALL
    SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
           COUNT(DISTINCT c_acctbal) FROM customer
    """,
    "quality",
    "profile",
)
def q27_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (row/null/distinct counts) in ONE scan: all
    measures aggregate together, then ``stack`` pivots to one row per
    column — vs the oracle's four scans. The shape data-quality
    monitoring needs at 100 TB (single pass, no per-column jobs)."""
    c = load(spark, sf_dir, "customer")
    cols = ["c_name", "c_mktsegment", "c_nationkey", "c_acctbal"]
    agg = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(col).alias(f"nn_{col}") for col in cols],
        *[F.countDistinct(col).alias(f"nd_{col}") for col in cols],
    )
    stack_args = ", ".join(f"'{col}', nn_{col}, nd_{col}" for col in cols)
    return agg.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column_name, _nn, _nd)"),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
        F.col("_nd").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# A4 extension: exact interpolated quartiles per group (q17 proved the
# interpolation formula matches DuckDB for the median; this pins p25/p75)
@REGISTRY.add(
    "q28_segment_quartiles",
    """
    SELECT c.c_mktsegment,
           quantile_cont(o.o_totalprice, 0.25) AS p25,
           quantile_cont(o.o_totalprice, 0.50) AS p50,
           quantile_cont(o.o_totalprice, 0.75) AS p75
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice IS NULL OR NOT isnan(o.o_totalprice)
    GROUP BY 1
    """,
    "agg",
    "percentile",
)
def q28_segment_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles per market segment
    (``percentile`` = sort-based exact, vs approx s04).

    NaN-exclusion domain contract (r13, nanmoney class — q17's twin):
    Spark's percentile orders NaN above every real price while DuckDB's
    quantile_cont skips it, silently shifting all three quartiles on a
    poisoned corpus. Both engines exclude NaN prices; NULLs stay.
    Output-identical on NaN-free corpora; pinned both ways by
    tests/test_nan_inputs.py.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    q = F.percentile("o_totalprice", F.lit([0.25, 0.50, 0.75]))
    return (
        o.where(F.col("o_totalprice").isNull() | ~F.isnan("o_totalprice"))
        .join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
              o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(q.alias("_q"))
        .select(
            "c_mktsegment",
            F.element_at("_q", 1).alias("p25"),
            F.element_at("_q", 2).alias("p50"),
            F.element_at("_q", 3).alias("p75"),
        )
    )


# ---------------------------------------------------------------------------
# q29 GROUPING SETS — the non-hierarchical grouping form neither rollup
# (prefix lattice, q15) nor cube (full lattice, q24) can express: exactly
# two disjoint single-dimension aggregations in one pass over the fact
# table, the "report by status AND by priority without a double scan"
# pattern. The grain label is derived from which key survives, so the
# oracle needs no engine-specific GROUPING_ID bit order.
@REGISTRY.add(
    "q29_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CASE WHEN o_orderstatus IS NOT NULL THEN 'by_status'
                ELSE 'by_priority' END AS grain,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    "agg",
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two disjoint grouping sets in one aggregation (one Expand node,
    one shuffle — not two scans).

    r14 nanmoney swap: revenue cast is the loud ``money_dec``."""
    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money_dec("o_totalprice"))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.when(F.col("o_orderstatus").isNotNull(), F.lit("by_status"))
            .otherwise(F.lit("by_priority"))
            .alias("grain"),
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# q30: the skew path, oracle-checked — lineitem reduced on its 3-value
# return flag (each key ~1/3 of the fact table: exactly the hot-reduce
# shape AQE can't split inside a HashAggregate). salted_agg scatters each
# key over 8 sub-keys, then combines ≤8 partials per key; results must be
# identical to a plain GROUP BY, which the decimal sums guarantee
# (associative, order-independent).
@REGISTRY.add(
    "q30_salted_flag_stats",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "agg",
    "skew",
)
def q30_salted_flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the explicit two-phase salted path
    (operators/skew.salted_agg, n_salts=8)."""
    from ..operators.skew import salted_agg

    l = load(spark, sf_dir, "lineitem").withColumn(
        "_qty_dec", F.col("l_quantity").cast(D)
    )
    out = salted_agg(
        l,
        keys=["l_returnflag"],
        aggs=[
            ("l_returnflag", "count", "n_rows"),
            ("_qty_dec", "sum", "sum_qty"),
            ("l_extendedprice", "min", "min_price"),
            ("l_extendedprice", "max", "max_price"),
        ],
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("string").cast("double").alias("sum_qty"),
        "min_price",
        "max_price",
    )


# ---------------------------------------------------------------------------
# q31 FULL OUTER join — the last join shape the suite lacked: deep-debt
# customers vs flush suppliers per nation, where each side has nations
# the other misses (5 of 12 per side at sf0.01), so all three match
# classes (both / left-only / right-only) appear in the result. Sentinel
# counts (0) and a match_kind label keep the output NULL-free.
@REGISTRY.add(
    "q31_full_outer_nation_profile",
    """
    WITH c AS (
        SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_debt_customers
        FROM customer WHERE c_acctbal < -800 GROUP BY c_nationkey
    ), s AS (
        SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich_suppliers
        FROM supplier WHERE s_acctbal > 8000 GROUP BY s_nationkey
    )
    SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
           CAST(COALESCE(c.n_debt_customers, 0) AS BIGINT) AS n_debt_customers,
           CAST(COALESCE(s.n_rich_suppliers, 0) AS BIGINT) AS n_rich_suppliers,
           CASE WHEN c.nationkey IS NOT NULL AND s.nationkey IS NOT NULL THEN 'both'
                WHEN c.nationkey IS NOT NULL THEN 'customers_only'
                ELSE 'suppliers_only' END AS match_kind
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    "join",
)
def q31_full_outer_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join of two filtered per-nation aggregates."""
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < -800)
        .groupBy(F.col("c_nationkey").alias("c_key"))
        .agg(F.count(F.lit(1)).alias("n_debt_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("s_key"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    j = c.join(s, c.c_key == s.s_key, "full_outer")
    return j.select(
        F.coalesce("c_key", "s_key").cast("bigint").alias("nationkey"),
        F.coalesce("n_debt_customers", F.lit(0)).cast("bigint").alias("n_debt_customers"),
        F.coalesce("n_rich_suppliers", F.lit(0)).cast("bigint").alias("n_rich_suppliers"),
        F.when(F.col("c_key").isNotNull() & F.col("s_key").isNotNull(), F.lit("both"))
        .when(F.col("c_key").isNotNull(), F.lit("customers_only"))
        .otherwise(F.lit("suppliers_only"))
        .alias("match_kind"),
    )


# ---------------------------------------------------------------------------
# q32: correlated scalar subquery — "customers richer than their own
# nation's average balance". The oracle states it the declarative way (a
# correlated subquery Catalyst/DuckDB both decorrelate into an
# aggregate+join); the Spark side writes the decorrelated plan the
# optimizer would produce — per-nation averages joined broadcast — so the
# query also documents WHAT the decorrelation is. Averages divide the
# exact decimal sum by the count (one IEEE division, identical engines).
@REGISTRY.add(
    "q32_above_nation_avg",
    """
    WITH avgs AS (
        SELECT c_nationkey,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS nation_avg
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal, a.nation_avg
    FROM customer c JOIN avgs a ON a.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > a.nation_avg
    """,
    "filter",
    "subquery",
)
def q32_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery semantics, decorrelated: tiny per-nation
    aggregate broadcast against the customer scan."""
    c = load(spark, sf_dir, "customer")
    avgs = c.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast(D)).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("nation_avg")
    )
    return (
        c.join(F.broadcast(avgs), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
    )


# ---------------------------------------------------------------------------
# q33: unpivot/melt — the inverse of q18's pivot: the wide per-customer
# balance profile goes long, one (metric, value) row per source column.
# Spark's native unpivot (melt) vs a UNION ALL oracle; both emit DOUBLE
# values (the casts make the wide columns one comparable type).
@REGISTRY.add(
    "q33_unpivot_balances",
    """
    SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    WHERE c_custkey <= 100
    """,
    "reshape",
)
def q33_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native unpivot (melt): wide numeric columns to long key/value."""
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# q34: value-RANGE window frame — trailing 30-day revenue per customer,
# anchored at each order. Distinct from q10's ROWS frame: RANGE frames
# bound peers by ORDER-BY *value* distance (here epoch-day), so same-day
# orders are peers and every row's frame covers exactly the 31-day
# calendar span regardless of how many rows fall in it. Exactness: the
# frame sum runs over DECIMAL(18,2) (order-independent), cast to DOUBLE
# once at the end. Scale shape: one window whose partition key (custkey)
# is the natural shard; no self-join formulation of the trailing sum.
_RANGE_FRAME_ORACLE = """
    SELECT o_orderkey,
           o_custkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing30_revenue
    FROM orders
"""


@REGISTRY.add("q34_range_frame_revenue", _RANGE_FRAME_ORACLE, "window")
def q34_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-calendar-day revenue per customer at each order via a
    RANGE window frame over epoch days (peers = same-day orders).

    r14 nanmoney swap: the frame sum casts through the loud
    ``money_dec`` at this site's exact DECIMAL(18,2) shape."""
    from pyspark.sql import Window

    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    dnum = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(dnum)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("day"),
        F.sum(money_dec("o_totalprice", "decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing30_revenue"),
    )


# ---------------------------------------------------------------------------
# q35: filter against a GLOBAL aggregate (TPC-H Q11's shape) — parts whose
# discounted revenue is ≥ 0.05% of total revenue. The scalar subquery
# decorrelates to a single-row broadcast joined to the per-part aggregate
# (one row → the nested-loop join is O(parts), the canonical scalar plan;
# a window-over-() would funnel every row through one partition). The
# share itself is integer ppm: both sides floor the DECIMAL revenue to
# exact micro-units, then one BIGINT division — no float threshold, so a
# borderline part cannot flip between engines.
_GLOBAL_SHARE_ORACLE = """
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                   * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(FLOOR(SUM(rev) * 1000000) AS BIGINT) AS total_micros FROM pr)
    SELECT pr.l_partkey,
           CAST(CAST(pr.rev AS VARCHAR) AS DOUBLE) AS revenue,
           CAST((CAST(FLOOR(pr.rev * 1000000) AS BIGINT) * 1000000)
                // tot.total_micros AS BIGINT) AS share_ppm
    FROM pr, tot
    WHERE (CAST(FLOOR(pr.rev * 1000000) AS BIGINT) * 1000000) // tot.total_micros >= 500
"""


@REGISTRY.add("q35_global_share_parts", _GLOBAL_SHARE_ORACLE, "agg", "subquery")
def q35_global_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts holding ≥ 500 ppm of total discounted revenue; the global
    total rides a single-row broadcast, the share is one BIGINT division
    over floored micro-units.

    r14 nanmoney swap: the revenue casts use the loud ``money_dec``
    (oracle-matching NaN refusal; identical on clean corpora)."""
    from ..functions.core import money_dec

    l = load(spark, sf_dir, "lineitem")
    rev = F.sum(
        money_dec("l_extendedprice")
        * (F.lit(1).cast(D) - money_dec("l_discount"))
    ).alias("rev")
    pr = l.groupBy("l_partkey").agg(rev)
    pr = pr.withColumn(
        "rev_micros", F.expr("CAST(FLOOR(rev * 1000000) AS BIGINT)")
    )
    tot = pr.agg(
        F.expr("CAST(FLOOR(SUM(rev) * 1000000) AS BIGINT)").alias("total_micros")
    )
    joined = pr.crossJoin(F.broadcast(tot)).withColumn(
        "share_ppm", F.expr("(rev_micros * 1000000) div total_micros")
    )
    return joined.where(F.col("share_ppm") >= 500).select(
        "l_partkey",
        F.expr("CAST(CAST(rev AS STRING) AS DOUBLE)").alias("revenue"),
        F.col("share_ppm").cast("bigint").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# q36: blocked fuzzy self-match (record linkage) — near-identical part
# names found by Levenshtein distance inside BLOCKS, never all-pairs.
# The block key (first name token) caps the candidate space at
# sum(|block|^2) — the standard blocking step every entity-resolution
# pipeline runs before the expensive string metric; at 100 TB you widen
# the key (first two tokens + length band) to keep blocks bounded. The
# oracle states the naive semantics (row-level self-join, one metric call
# per row pair); the Spark plan applies MULTIPLICITY COMPRESSION on top:
# group rows by (block, name) first, run levenshtein once per DISTINCT
# name pair, and weight each distance by cnt_a·cnt_b (plus the
# C(cnt,2) zero-distance self-pairs). Metric calls scale with
# distinct-name pairs, not row pairs — on duplicate-heavy corpora (this
# table: 64 names over 20k rows) that is orders of magnitude fewer DP
# evaluations, and it is exactly how a production linkage pass survives
# hot keys. levenshtein() is unit-cost edit distance in both engines, so
# the distances are exact integers; output is the per-block pair summary
# (count / min / sum of distances), not the pair list, keeping the result
# size |blocks|.
_FUZZY_BLOCK_ORACLE = """
    WITH p AS (
        SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
        FROM part
    ),
    pairs AS (
        SELECT a.blk, levenshtein(a.p_name, b.p_name) AS dist
        FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    )
    SELECT blk,
           CAST(COUNT(*) AS BIGINT) AS fuzzy_pairs,
           CAST(MIN(dist) AS BIGINT) AS min_dist,
           CAST(SUM(dist) AS BIGINT) AS sum_dist
    FROM pairs
    WHERE dist <= 3
    GROUP BY blk
"""


@REGISTRY.add("q36_fuzzy_name_blocks", _FUZZY_BLOCK_ORACLE, "join", "linkage")
def q36_fuzzy_name_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block summary of part-name row pairs within edit distance 3,
    computed over DISTINCT name pairs and re-weighted by group sizes —
    identical to the oracle's row-level self-join, with levenshtein calls
    proportional to distinct names, not rows."""
    p = load(spark, sf_dir, "part").select(
        "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    )
    names = p.groupBy("blk", "p_name").agg(F.count(F.lit(1)).alias("cnt"))
    a = names.alias("a")
    b = names.alias("b")
    # distinct cross-name pairs: cnt_a·cnt_b row pairs each (the
    # p_partkey < p_partkey condition enumerates unordered row pairs, so
    # name order can be fixed lexicographically)
    cross = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("mult"),
    )
    # same-name row pairs: C(cnt, 2) at distance 0
    selfp = names.where(F.col("cnt") >= 2).select(
        "blk",
        F.lit(0).alias("dist"),
        # integer C(cnt,2): `div` keeps the product/quotient in BIGINT —
        # float `/` is only exact below 2^53 (advisor round-5 note)
        F.expr("cnt * (cnt - 1) div 2").alias("mult"),
    )
    return (
        cross.unionByName(selfp)
        .where(F.col("dist") <= 3)
        .groupBy("blk")
        .agg(
            F.sum("mult").cast("bigint").alias("fuzzy_pairs"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.sum(F.col("dist") * F.col("mult")).cast("bigint").alias("sum_dist"),
        )
    )


# ---------------------------------------------------------------------------
# q37: snapshot diff (CDC) — two deterministic "versions" of orders are
# derived from the base table (v1 drops hash-bucket 0, v2 drops bucket 1
# and doubles every 7th order's price), then diffed with ONE full-outer
# join on the key. Change detection is column-wise NULL-safe equality,
# never a row-hash over stringified floats (engine-dependent rendering).
# The summary emits per-status row counts plus an exact key checksum, so
# the hash gate covers WHICH rows got each status, not just how many.
_DIFF_BUCKETS = 10


@REGISTRY.add(
    "q37_snapshot_diff",
    f"""
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
              % {_DIFF_BUCKETS} <> 0
    ), v2 AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
              % {_DIFF_BUCKETS} <> 1
    ), d AS (
        SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
               CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                    WHEN v2.o_orderkey IS NULL THEN 'removed'
                    WHEN v1.o_orderstatus IS NOT DISTINCT FROM v2.o_orderstatus
                         AND v1.o_totalprice IS NOT DISTINCT FROM v2.o_totalprice
                    THEN 'unchanged'
                    ELSE 'modified' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY status
    """,
    "relational",
    "cdc",
)
def q37_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status diff summary between two derived order snapshots —
    see operators/diff.snapshot_diff for the row-level operator."""
    from ..operators.diff import snapshot_diff
    from .sampling import md5_bucket

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    bucket = md5_bucket(F.col("o_orderkey")) % _DIFF_BUCKETS
    v1 = o.where(bucket != 0)
    v2 = o.where(bucket != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    d = snapshot_diff(v1, v2, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
    )


# ---------------------------------------------------------------------------
# q38: right-to-be-forgotten cascade purge — a deterministic 2%% forget
# set of customers (md5 bucket 0 of 50) propagated customer → orders →
# lineitem via operators/retention.cascade_purge, emitting the audit
# receipt (tbl, n_before, n_purged, n_after) a regulator actually asks
# for. Every hop is a keyed semi/anti-join; nothing driver-side scales
# with data.
_PURGE_BUCKETS = 50


@REGISTRY.add(
    "q38_retention_purge",
    f"""
    WITH forget AS (
        SELECT c_custkey FROM customer
        WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
              % {_PURGE_BUCKETS} = 0
    ), doomed_o AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS tbl,
           (SELECT COUNT(*) FROM customer) AS n_before,
           (SELECT COUNT(*) FROM forget) AS n_purged,
           (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget)
               AS n_after
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM doomed_o),
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM doomed_o)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o)),
           (SELECT COUNT(*) FROM lineitem)
           - (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o))
    """,
    "relational",
    "retention",
)
def q38_retention_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade-purge audit for the md5-bucket-0 customer forget set —
    see operators/retention.cascade_purge."""
    from ..operators.retention import cascade_purge
    from .sampling import md5_bucket

    tables = {
        name: load(spark, sf_dir, name)
        for name in ("customer", "orders", "lineitem")
    }
    forget = (
        tables["customer"]
        .where(md5_bucket(F.col("c_custkey")) % _PURGE_BUCKETS == 0)
        .select("c_custkey")
    )
    _, audit = cascade_purge(
        tables,
        root_table="customer",
        root_keys=forget,
        cascades=[
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    return audit


# ---------------------------------------------------------------------------
# q39: smoothed target encoding — the leakage-safe categorical feature a
# training pipeline materializes: each (nation, segment) cell encodes to
# (sum + m·global_mean) / (n + m), shrinking small cells toward the
# prior (m = 10 virtual rows). Everything in exact integer cents with
# `div`; the global mean is a 1-row broadcast, the cell stats one
# groupBy — two scans' worth of signal in one shuffle.
_TENC_M = 10


@REGISTRY.add(
    "q39_target_encoding",
    f"""
    WITH g AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
                   // COUNT(*) AS gmean_cents
        FROM customer
    ), cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS sum_cents
        FROM customer GROUP BY 1, 2
    )
    SELECT c.c_nationkey, c.c_mktsegment, c.n,
           CAST((c.sum_cents + {_TENC_M} * g.gmean_cents)
                // (c.n + {_TENC_M}) AS BIGINT) AS enc_cents
    FROM cells c CROSS JOIN g
    """,
    "relational",
    "feature",
)
def q39_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of (nation, segment) → mean acctbal in
    exact integer cents, shrunk toward the global prior."""
    c = load(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint")
    g = c.agg(
        F.expr(
            "CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)) * 100 ) AS BIGINT)"
            " div count(*)"
        ).alias("gmean_cents")
    )
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
    )
    return cells.crossJoin(F.broadcast(g)).select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        F.expr(
            f"CAST((sum_cents + {_TENC_M} * gmean_cents)"
            f" div (n + {_TENC_M}) AS BIGINT)"
        ).alias("enc_cents"),
    )


# ---------------------------------------------------------------------------
# q40: the spark.sql SURFACE exercised end-to-end — one query authored
# as ANSI SQL text over tables.register_views (the entry point for
# users coming from the reference's Postgres workflow), not DataFrame
# calls. Catalyst compiles both APIs to the same plans; this registered
# query is the standing proof the SQL path resolves the same normalized
# schemas and returns hash-identical results. The statement itself is a
# region × priority revenue matrix (two broadcast dims + the fact scan).
_Q40_SQL = """
    SELECT r.r_name AS region, o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE o.o_totalprice IS NULL OR NOT isnan(o.o_totalprice)
    GROUP BY 1, 2
"""
# the WHERE is the NaN-exclusion domain contract (r12 nanmoney class):
# Spark's NaN->DECIMAL cast silently drops the row from the sum while
# DuckDB refuses loudly — both engines share this SQL text verbatim, so
# the excluded domain is identical by construction; NULL prices stay
# (counted, skipped by the sum on both engines)


@REGISTRY.add("q40_sql_surface", _Q40_SQL, "relational", "sql-api")
def q40_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region × priority revenue via raw ``spark.sql`` over registered
    views — oracle and engine share the SQL text verbatim."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q40_SQL)


# ---------------------------------------------------------------------------
# q41: SURVIVORSHIP (golden-record) merge — the MDM primitive: several
# versions of each customer exist (CRM import, web form, support edit),
# columns are sparsely populated, and the golden record takes each
# column's value from the highest-priority version that HAS one. The
# per-column rule is one aggregate — max over (priority, value) structs
# built only when the value is non-null — so merging v versions of any
# width is a single groupBy, no per-column self-joins. Versions are
# synthesized deterministically (md5 ppm nulls, version-stamped values)
# so the whole thing is oracle-checkable.
_SURV_V, _SURV_NULL_PPM = 3, 400_000


@REGISTRY.add(
    "q41_survivorship_merge",
    f"""
    WITH versions AS (
        SELECT c.c_custkey, v.v,
               CASE WHEN ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)
                        || '-s-' || CAST(v.v AS VARCHAR)), 1, 8))::UBIGINT
                        % 1000000 < {_SURV_NULL_PPM} THEN NULL
                    ELSE c.c_mktsegment || '#' || CAST(v.v AS VARCHAR)
               END AS seg,
               CASE WHEN ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)
                        || '-b-' || CAST(v.v AS VARCHAR)), 1, 8))::UBIGINT
                        % 1000000 < {_SURV_NULL_PPM} THEN NULL
                    ELSE CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                              AS BIGINT) + v.v
               END AS bal_cents
        FROM customer c, UNNEST(generate_series(1, {_SURV_V})) AS v(v)
    )
    SELECT c_custkey,
           (MAX(CASE WHEN seg IS NOT NULL
                     THEN {{'p': v, 'x': seg}} END)).x AS golden_seg,
           (MAX(CASE WHEN bal_cents IS NOT NULL
                     THEN {{'p': v, 'x': bal_cents}} END)).x
               AS golden_bal_cents,
           CAST(COUNT(seg) AS BIGINT) AS n_seg_present,
           CAST(COUNT(bal_cents) AS BIGINT) AS n_bal_present
    FROM versions GROUP BY c_custkey
    """,
    "relational",
    "mdm",
)
def q41_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden record per customer: per-column highest-priority non-null
    survivorship over three synthesized sparse versions."""
    from .sampling import md5_bucket

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    versions = c.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.explode(F.sequence(F.lit(1), F.lit(_SURV_V))).alias("v"),
    )

    def null_ppm(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("c_custkey").cast("string"),
                            F.lit(f"-{tag}-"),
                            F.col("v").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint") % 1000000
            < _SURV_NULL_PPM
        )

    versions = versions.select(
        "c_custkey", "v",
        F.when(null_ppm("s"), None).otherwise(
            F.concat("c_mktsegment", F.lit("#"), F.col("v").cast("string"))
        ).alias("seg"),
        F.when(null_ppm("b"), None).otherwise(
            (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint")
            + F.col("v")
        ).alias("bal_cents"),
    )

    def survive(col: str):
        return F.max(
            F.when(
                F.col(col).isNotNull(),
                F.struct(F.col("v").alias("p"), F.col(col).alias("x")),
            )
        )["x"]

    return versions.groupBy("c_custkey").agg(
        survive("seg").alias("golden_seg"),
        survive("bal_cents").alias("golden_bal_cents"),
        F.count("seg").cast("bigint").alias("n_seg_present"),
        F.count("bal_cents").cast("bigint").alias("n_bal_present"),
    )


# ---------------------------------------------------------------------------
# q42: k-ANONYMITY audit — the privacy companion to q38's purge: before
# sharing a table, every quasi-identifier combination (nation × market
# segment here) must cover at least k individuals, or those rows are
# re-identifiable. One groupBy for the equivalence classes + one
# broadcast-back summary; the per-class rows carry the violation flag,
# a final row ('__total__') carries the table-level verdict counts.
_KANON_K = 25


@REGISTRY.add(
    "q42_k_anonymity",
    f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment AS segment,
           n,
           n >= {_KANON_K} AS k_anonymous
    FROM classes
    UNION ALL
    SELECT CAST(-1 AS BIGINT), '__total__',
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) = 0
    FROM classes
    """,
    "relational",
    "privacy",
)
def q42_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class sizes for the (nation, segment) quasi-identifier
    with per-class k≥{_KANON_K} flags and a '__total__' violating-row count."""
    c = load(spark, sf_dir, "customer")
    classes = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per_class = classes.select(
        "nationkey", "segment", "n",
        (F.col("n") >= _KANON_K).alias("k_anonymous"),
    )
    total = classes.agg(
        F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0))
        .cast("bigint").alias("n"),
        (F.sum(F.when(F.col("n") < _KANON_K, 1).otherwise(0)) == 0)
        .alias("k_anonymous"),
    ).select(
        F.lit(-1).cast("bigint").alias("nationkey"),
        F.lit("__total__").alias("segment"),
        "n",
        "k_anonymous",
    )
    return per_class.unionByName(total)


# ---------------------------------------------------------------------------
# q43: JOIN-SKEW audit — the operational table behind every salting /
# AQE-skew-join decision: for each join key the engine actually
# shuffles on, how hot is the hottest key relative to uniform? One
# groupBy per audited key (map-side combined), then a 3-number scalar
# agg; skew crosses engines as integer ppm (max·n_keys·10⁶ div n_rows
# = max/mean in exact BIGINT arithmetic). At 100 TB this replaces the
# guesswork: skew_ppm ≈ 1e6 means uniform, ≥ 10e6 means the hot key
# owns 10 partitions' worth of rows and the join wants salting.
_SKEW_KEY_SQL = """
        SELECT '{label}' AS join_key,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_key_rows,
               CAST(CAST(MAX(c) AS HUGEINT) * COUNT(*) * 1000000 // SUM(c)
                   AS BIGINT) AS skew_ppm
        FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)
"""
_SKEW_KEYS = [
    ("lineitem.l_orderkey", "l_orderkey", "lineitem"),
    ("lineitem.l_suppkey", "l_suppkey", "lineitem"),
    ("lineitem.l_partkey", "l_partkey", "lineitem"),
    ("orders.o_custkey", "o_custkey", "orders"),
    ("events.user_id", "user_id", "events"),
]
_SKEW_ORACLE = "\n        UNION ALL\n".join(
    _SKEW_KEY_SQL.format(label=label, key=key, table=table)
    for label, key, table in _SKEW_KEYS
)

# Per-(session, dataset) skew-stats artifact — the r09 verdict's
# amortization: maybe_salted_agg / maybe_salted_join used to re-scan the
# fact table per invocation to measure the hot-key ppm (q47's 4.9×-at-30×
# was exactly that pre-pass). Same cache contract as docs._CLUSTER_CACHE /
# _IVF_ASSIGN_CACHE: keyed by (applicationId, sf_dir), measure-on-miss,
# stopped-session eviction; bench.py times the full five-key warm under
# `shared`. Values are the q43 audit's exact per-key statistics
# (n_rows, n_keys, max_key_rows, skew_ppm) — entries are None on an
# empty table, mirroring the SQL aggregates.
_SKEW_STATS_CACHE: dict[
    tuple[str, str], dict[str, tuple[int | None, ...]]
] = {}

_SKEW_FIELDS = ("n_rows", "n_keys", "max_key_rows", "skew_ppm")


def _skew_store_path(sf_dir: str) -> str:
    """Durable home of a dataset's skew audit (r10 verdict task 6): at
    100 TB the five-key measurement is worth keeping NEXT TO the dataset
    across sessions, not re-scanning per session. The test datasets are
    read-only, so the store lives under a relocatable artifact root
    (env SPARK_GRAFT_ARTIFACT_DIR, default ./spark-warehouse) keyed by
    the dataset's absolute path; refresh-by-delete via io.checkpoint.
    invalidate() when the dataset is rewritten."""
    import hashlib
    import os

    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "spark-warehouse",
    )  # repo root anchor: the driver harness's cwd is not guaranteed
    root = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", default).rstrip("/")
    ds = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    return f"{root}/skew_stats/{ds}"


def _skew_store_read(spark: SparkSession, sf_dir: str) -> dict:
    from ..io import fs

    path = _skew_store_path(sf_dir)
    if not fs.exists(spark, path.rstrip("/") + "/_SUCCESS"):
        return {}
    out = {}
    for r in spark.read.parquet(path).collect():
        out[r["join_key"]] = tuple(
            None if r[c] is None else int(r[c]) for c in _SKEW_FIELDS
        )
    return out


def _skew_store_write(spark: SparkSession, sf_dir: str, stats: dict) -> None:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("join_key", StringType(), False)]
        + [StructField(c, LongType(), True) for c in _SKEW_FIELDS]
    )
    from ..tables import local_df

    rows = [(label, *vals) for label, vals in sorted(stats.items())]
    # Arrow-backed LocalRelation (tables.local_df): the list-of-rows
    # createDataFrame path parallelizes into defaultParallelism
    # Python-RDD slices, which coalesce(1) then computes SERIALLY — one
    # Python-worker roundtrip per slice, ~5.5 s per 5-row store write on
    # a 32-core session (measured r15); the LocalRelation write is ~0.1 s
    local_df(spark, rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(_skew_store_path(sf_dir))


def _measure_skew(
    spark: SparkSession, sf_dir: str, label: str
) -> tuple[int | None, int | None, int | None, int | None]:
    """One audited key's (n_rows, n_keys, max_key_rows, skew_ppm): one
    map-side-combined groupBy + a 4-number scalar agg. Thread-safe (no
    shared state) so the bulk path below can overlap the five
    measurement jobs (guide §2.6 — independent jobs back-fill each
    other's stragglers instead of paying five serial job round-trips)."""
    _, col, table = next(x for x in _SKEW_KEYS if x[0] == label)
    t = load(spark, sf_dir, table)
    per_key = t.groupBy(F.col(col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    row = per_key.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        # DECIMAL(38,0)/HUGEINT intermediate: the triple product
        # passes 2⁶³ at 100 TB hot-key scale (advisor r08); div
        # stays exact on both engines.
        F.expr(
            "CAST(CAST(max(c) AS DECIMAL(38,0)) * count(*) * 1000000"
            " div sum(c) AS BIGINT)"
        ).alias("skew_ppm"),
    ).first()
    return tuple(
        None if row is None or row[c] is None else int(row[c])
        for c in _SKEW_FIELDS
    )


def _skew_stats_bulk(
    spark: SparkSession, sf_dir: str, labels: list[str] | None = None
) -> dict[str, tuple[int | None, int | None, int | None, int | None]]:
    """Session-cached, store-backed skew stats for ``labels`` (default:
    every audited key). Read order per key: session dict → parquet store
    (one 5-row read, zero skew jobs) → measure and write through. The
    measurement jobs for missing keys are submitted CONCURRENTLY from a
    small thread pool (guide §2.6): they are independent aggregations
    whose tails would otherwise leave the machine idle five times over
    (cold-store rebuild measured 10.5 s serial → ~3 s overlapped at
    sf0.1); the store write-through happens once, after all of them."""
    labels = [x[0] for x in _SKEW_KEYS] if labels is None else labels
    key = (spark.sparkContext.applicationId, sf_dir)
    for k in [k for k in _SKEW_STATS_CACHE if k[0] != key[0]]:
        del _SKEW_STATS_CACHE[k]
    stats = _SKEW_STATS_CACHE.setdefault(key, {})
    if any(lab not in stats for lab in labels):
        # warm path: one 5-row parquet read, no skew jobs; dict entries
        # (e.g. a planted test sentinel) always win over the store
        for k2, v2 in _skew_store_read(spark, sf_dir).items():
            stats.setdefault(k2, v2)
    missing = [lab for lab in labels if lab not in stats]
    if missing:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(missing)) as pool:
            for lab, vals in zip(
                missing,
                pool.map(
                    lambda lab: _measure_skew(spark, sf_dir, lab), missing
                ),
            ):
                stats[lab] = vals
        _skew_store_write(spark, sf_dir, stats)
    return {lab: stats[lab] for lab in labels}


def _skew_stats(
    spark: SparkSession, sf_dir: str, label: str
) -> tuple[int | None, int | None, int | None, int | None]:
    """Measured (n_rows, n_keys, max_key_rows, skew_ppm) for one audited
    join key, cached per (session, dataset) AND persisted as a tiny
    parquet next to the dataset (r10 verdict task 6). A second session
    on the same dataset therefore builds NO skew jobs."""
    return _skew_stats_bulk(spark, sf_dir, [label])[label]


def _skew_ppm_for(spark: SparkSession, sf_dir: str, label: str) -> int:
    """The guard-facing read: cached skew ppm for one audited key,
    1e6 (uniform) when the table is empty."""
    ppm = _skew_stats(spark, sf_dir, label)[3]
    return 1_000_000 if ppm is None else ppm


@REGISTRY.add("q43_join_skew_audit", _SKEW_ORACLE, "relational", "audit",
              "scale")
def q43_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew (max/mean in integer ppm) for the five join keys the
    fact tables shuffle on — the number that decides salting. Reads (and
    warms) the per-session skew-stats artifact; the result is the
    5-row bounded audit table itself, so materializing it driver-side
    is the point, not a scale hazard."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("join_key", StringType(), False),
        StructField("n_rows", LongType(), True),
        StructField("n_keys", LongType(), True),
        StructField("max_key_rows", LongType(), True),
        StructField("skew_ppm", LongType(), True),
    ])
    from ..tables import local_df

    bulk = _skew_stats_bulk(spark, sf_dir)
    rows = [(label, *bulk[label]) for label, _, _ in _SKEW_KEYS]
    # LocalRelation, not a 32-slice Python RDD (see _skew_store_write)
    return local_df(spark, rows, schema)


# ---------------------------------------------------------------------------
# q44: the q43 audit ACTING — per-user event rollup routed through
# operators/skew.maybe_salted_agg, which measures the hot-key skew (the
# same integer-ppm statistic q43 publishes) and flips to the two-phase
# salted reduction when the hottest key holds ≥ 10× its uniform share.
# Results are identical on either path (sum/count/max are exactly
# decomposable), so the oracle is the plain GROUP BY — what the guard
# chooses is an execution decision, recorded in decisions.LAST and
# flip-proven on a synthetic hot key in tests/test_skew.py. Money stays
# exact: cents = FLOOR(value·100 + 0.5) BIGINTs.
_GHK_ORACLE = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events GROUP BY user_id
"""


@REGISTRY.add("q44_guarded_hot_key_agg", _GHK_ORACLE, "relational", "scale",
              "audit")
def q44_guarded_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rollup through the skew-measuring salted-agg guard
    (plain single-shuffle plan on this uniform key; the same call flips
    to the two-phase salted reduction on a ≥10× hot key). The skew ppm
    comes from the per-session q43 stats artifact — measured once per
    (session, dataset), a dict read afterwards — so no measurement
    aggregate runs here on the warm path."""
    from ..functions.core import money_cents
    from ..operators.skew import maybe_salted_agg

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        # money_cents, not the inline FLOOR idiom: floor(NaN) is a silent
        # 0 engine-side while the oracle refuses loudly (r11 NaN triage)
        money_cents("value").alias("cents"),
    )
    out = maybe_salted_agg(
        ev,
        ["user_id"],
        [("cents", "count", "n_events"), ("cents", "sum", "total_cents"),
         ("cents", "max", "max_cents")],
        skew_ppm=_skew_ppm_for(spark, sf_dir, "events.user_id"),
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# q45: ORDER↔LINEITEM reconciliation — the cross-table consistency audit
# a warehouse runs before trusting either side: recompute each order's
# total from its lines (price·(1−disc)·(1+tax)) and compare against the
# stored o_totalprice. All arithmetic is exact BIGINT in 10⁻⁶-dollar
# units (cents × two 2-decimal percentage factors), so "within a cent"
# is an integer comparison, not a float epsilon. On this synthetic data
# the stored totals are unrelated to the lines — the audit correctly
# reports ~zero matches; the value is the machinery (two keyed
# aggregations + one equi-join, no driver math).
_REC_CENTS = "CAST(FLOOR({c} * 100 + 0.5) AS BIGINT)"
_REC_ORACLE = f"""
    WITH ln AS (
        SELECT l_orderkey,
               SUM({_REC_CENTS.format(c='l_extendedprice')}
                   * (100 - {_REC_CENTS.format(c='l_discount')})
                   * (100 + {_REC_CENTS.format(c='l_tax')})) AS line_e6
        FROM lineitem GROUP BY l_orderkey
    ), j AS (
        SELECT o.o_orderstatus AS status,
               ABS(ln.line_e6
                   - {_REC_CENTS.format(c='o.o_totalprice')} * 10000)
                   AS diff_e6
        FROM orders o JOIN ln ON ln.l_orderkey = o.o_orderkey
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN diff_e6 <= 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1c,
           CAST(SUM(CASE WHEN diff_e6 <= 10000 THEN 0 ELSE 1 END)
                * 1000000 // COUNT(*) AS BIGINT) AS mismatch_ppm,
           CAST(SUM(diff_e6) // (COUNT(*) * 10000) AS BIGINT)
               AS avg_abs_diff_cents
    FROM j GROUP BY status
"""


@REGISTRY.add("q45_order_reconciliation", _REC_ORACLE, "relational", "audit",
              "quality")
def q45_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recomputed-vs-stored order totals per status in exact
    10⁻⁶-dollar integers: within-a-cent counts, mismatch ppm, mean
    absolute drift."""
    from ..functions.core import money_cents

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    # money_cents, not the inline FLOOR idiom: floor(NaN) is a silent
    # 0 engine-side while the oracle refuses loudly (r11 NaN triage)
    cents = lambda c: money_cents(F.col(c))  # noqa: E731
    ln = l.groupBy("l_orderkey").agg(
        F.sum(
            cents("l_extendedprice")
            * (F.lit(100) - cents("l_discount"))
            * (F.lit(100) + cents("l_tax"))
        ).alias("line_e6")
    )
    j = o.join(ln, o["o_orderkey"] == ln["l_orderkey"]).select(
        F.col("o_orderstatus").alias("status"),
        F.abs(F.col("line_e6") - cents("o_totalprice") * 10000)
        .alias("diff_e6"),
    )
    return j.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("diff_e6") <= 10000, 1).otherwise(0))
        .cast("bigint").alias("n_within_1c"),
        F.expr(
            "CAST(sum(CASE WHEN diff_e6 <= 10000 THEN 0 ELSE 1 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("mismatch_ppm"),
        F.expr(
            "CAST(sum(diff_e6) div (count(*) * 10000) AS BIGINT)"
        ).alias("avg_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# q46: REFERENTIAL-ORPHAN audit — the FK-integrity table the engine
# publishes instead of relying on database-enforced constraints
# (quality.py enforces them per-load; this is the standing corpus-wide
# report): for each declared relationship, how many child rows point at
# a missing parent? One left-anti join per relation (keyed, broadcast
# when the parent key set fits), counts in exact integer ppm.
_ORPHAN_RELS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]
_ORPHAN_ORACLE = "\n    UNION ALL\n".join(
    f"""
    SELECT '{label}' AS relation,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) AS BIGINT) AS n_orphans,
           CAST(COUNT(*) * 1000000
                // NULLIF((SELECT COUNT(*) FROM {child}), 0)
                AS BIGINT) AS orphan_ppm
    FROM {child} c WHERE NOT EXISTS (
        SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey})
    """
    for label, child, ckey, parent, pkey in _ORPHAN_RELS
)


@REGISTRY.add("q46_referential_orphans", _ORPHAN_ORACLE, "relational",
              "audit", "quality")
def q46_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-child counts (exact integer ppm) for the four declared
    FK relationships, via left-anti joins."""
    out = None
    for label, child, ckey, parent, pkey in _ORPHAN_RELS:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent)
        n_child = c.agg(F.count(F.lit(1)).alias("_n"))
        orphans = c.join(
            p, c[ckey] == p[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("_o"))
        row = n_child.crossJoin(orphans).select(
            F.lit(label).alias("relation"),
            F.col("_n").cast("bigint").alias("n_child_rows"),
            F.col("_o").cast("bigint").alias("n_orphans"),
            # NULLIF: empty child table -> NULL ppm (ANSI-safe), not a
            # divide-by-zero crash; identical on any non-empty table
            F.expr("CAST(_o * 1000000 div nullif(_n, 0) AS BIGINT)").alias(
                "orphan_ppm"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q47: the q43 audit ACTING on a JOIN — per-nation supplier revenue with
# the lineitem→supplier join routed through operators/skew.
# maybe_salted_join, which measures the big side's hot-key skew on
# l_suppkey (the same integer-ppm statistic q43 publishes for exactly
# this key) and flips to the salted scatter-join when the hottest
# supplier holds ≥ 10× its uniform share. Results are identical on
# either path (salting only re-partitions the pair space), so the
# oracle is the plain join — what the guard chooses is an execution
# decision, recorded in decisions.LAST and flip-proven both ways on a
# synthetic hot key in tests/test_skew.py. Money stays exact cents.
_GSJ_ORACLE = """
    SELECT s.s_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
"""


@REGISTRY.add("q47_guarded_skew_join", _GSJ_ORACLE, "relational", "scale",
              "audit")
def q47_guarded_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue through the skew-measuring salted-
    join guard (plain broadcast/hash join on this uniform key; the same
    call flips to the scatter join on a ≥10× hot supplier).

    r14 nanmoney swap: the cents projection uses the loud
    ``money_cents_decimal`` at this site's exact DECIMAL(12,2) shape."""
    from ..functions.core import money_cents_decimal
    from ..operators.skew import maybe_salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        money_cents_decimal("l_extendedprice", "decimal(12,2)").alias("cents"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_nationkey").alias("nationkey"),
    )
    # skew ppm from the per-session q43 stats artifact (measured once
    # per session/dataset, dict read afterwards) — the r09 verdict's
    # amortization of the per-invocation measurement pre-pass.
    j = maybe_salted_join(
        li, supp, "suppkey",
        skew_ppm=_skew_ppm_for(spark, sf_dir, "lineitem.l_suppkey"),
    )
    return j.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_distinct("suppkey").cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
