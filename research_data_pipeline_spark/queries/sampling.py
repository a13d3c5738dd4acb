"""Sampling / sketch queries over ``orders`` — the approximate-statistics
surface a 100 TB pipeline needs (operators/sketches.py).

s01/s02 are exact-oracle-checked (the md5 sampler and the exact
heavy-hitter pass are deterministic and SQL-expressible). s03/s04 are
genuinely approximate (HLL++, Greenwald-Khanna), so their *sketch values*
cannot be oracle-compared — instead each emits the EXACT statistic (which
the oracle recomputes) plus a ``within_*`` BOOLEAN asserting the sketch
satisfies its error contract, with the oracle emitting a TRUE literal.
This keeps the sketches under the hard hash signal: a drifting sketch
flips the boolean and fails the compare. Outputs are scalar columns only
(the harness canonicalizer cannot sort array cells — see registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import REGISTRY
from ..tables import load

_BUCKETS = 1_000_000
_FRACTION = 0.2
_CUT = int(_FRACTION * _BUCKETS)
_SUPPORT = 0.05


def md5_bucket(c) -> "F.Column":
    """First 32 md5 bits of the id as an integer bucket — identical in
    Spark (conv base16) and DuckDB ('0x'-prefixed cast), unlike xxhash64
    (Spark-only) or hash() (engine-specific)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


@REGISTRY.add(
    "s01_hash_sample",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
          % {_BUCKETS} < {_CUT}
    """,
    "sketch",
    "sampling",
)
def s01_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% sample by id-hash bucket. Unlike ``df.sample``
    (per-partition seeded RNG — row set changes under repartitioning),
    the same rows survive retries and re-runs: the reproducible way to
    cut a training subset. Pure codegen filter on the scan, no shuffle."""
    o = load(spark, sf_dir, "orders")
    return o.where(md5_bucket(F.col("o_orderkey")) % _BUCKETS < _CUT).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@REGISTRY.add(
    "s02_heavy_hitters",
    f"""
    SELECT o_orderpriority AS value, COUNT(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) >= {_SUPPORT} * (SELECT COUNT(*) FROM orders)
    """,
    "sketch",
)
def s02_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: values with frequency >= support·n. Two
    map-side-combined aggregations + a broadcast of one scalar — the
    exact counterpart of ``sketches.heavy_hitters`` (freqItems), used
    when the group-key cardinality is bounded."""
    o = load(spark, sf_dir, "orders")
    total = o.agg(F.count(F.lit(1)).alias("_n"))
    return (
        o.groupBy(F.col("o_orderpriority").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(_SUPPORT) * F.col("_n"))
        .drop("_n")
    )


_HLL_RSD = 0.02


@REGISTRY.add(
    "s03_approx_distinct",
    """
    SELECT o_orderpriority AS value,
           COUNT(DISTINCT o_custkey) AS exact_custkeys,
           TRUE AS within_rsd
    FROM orders
    GROUP BY 1
    """,
    "sketch",
    "approx",
)
def s03_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct customers per priority (rsd 2%), under the
    hard signal: DuckDB's HLL is a different implementation, so the sketch
    value itself is not comparable — instead we emit the exact distinct
    count (oracle recomputes it) and a boolean asserting the HLL estimate
    is within 5·rsd of exact (a ≥5σ contract; deviation there means a
    broken sketch, not noise). Both the sketch and the exact count are
    single map-side-combined aggregations over the same shuffle."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderpriority").alias("value")).agg(
        F.count_distinct("o_custkey").alias("exact_custkeys"),
        F.approx_count_distinct("o_custkey", _HLL_RSD).alias("_approx"),
    )
    err = F.abs(F.col("_approx") - F.col("exact_custkeys"))
    bound = F.lit(5 * _HLL_RSD) * F.col("exact_custkeys")
    return agg.select(
        "value",
        "exact_custkeys",
        (err <= bound).alias("within_rsd"),
    )


# GK sketch accuracy: rank error ≤ n/_GK_ACCURACY. The contract check
# brackets the sketch value between exact percentiles at q ± _GK_SLACK.
# The slack must exceed one order-statistic gap for the smallest group
# (the sketch returns an actual element; the exact percentile
# interpolates — at sf0.001 a group holds ~60 rows, so slack ≥ 1/60),
# while staying a real contract at scale (±60 ranks at sf0.01).
_GK_ACCURACY = 10_000
_GK_SLACK = 0.02


@REGISTRY.add(
    "s04_approx_quantiles",
    """
    SELECT o_orderpriority AS value,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           TRUE AS within_rank_bound
    FROM orders
    WHERE o_totalprice IS NULL OR NOT isnan(o_totalprice)
    GROUP BY 1
    """,
    "sketch",
    "approx",
)
def s04_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna price quartiles per priority, under the hard
    signal. Emits the EXACT interpolated quartiles (p25/p50/p75 — oracle
    ``quantile_cont`` parity proven by q28) as scalar columns, plus one
    boolean asserting every GK estimate lies between the exact percentiles
    at q ± 10/accuracy — the sketch's rank-error contract. No array
    columns in the output (harness canonicalizer constraint).

    NaN-exclusion domain contract (r13, nanmoney class): Spark's exact
    percentile AND the GK sketch both order NaN high while DuckDB's
    quantile_cont skips it — the third silent quantile divergence found
    by scripts/probe_corpus.py nanmoney. Both engines exclude NaN
    prices; NULLs stay. Output-identical on NaN-free corpora; pinned
    both ways by tests/test_nan_inputs.py.
    """
    o = load(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNull() | ~F.isnan("o_totalprice")
    )
    qs = [0.25, 0.50, 0.75]
    brackets = [(max(q - _GK_SLACK, 0.0), min(q + _GK_SLACK, 1.0)) for q in qs]
    exact_pts = sorted({q for q in qs} | {b for lo_hi in brackets for b in lo_hi})
    idx = {p: i + 1 for i, p in enumerate(exact_pts)}  # element_at is 1-based
    agg = o.groupBy(F.col("o_orderpriority").alias("value")).agg(
        F.percentile("o_totalprice", F.lit(exact_pts)).alias("_exact"),
        F.percentile_approx("o_totalprice", qs, _GK_ACCURACY).alias("_approx"),
    )
    within = F.lit(True)
    for i, (q, (lo, hi)) in enumerate(zip(qs, brackets)):
        a = F.element_at("_approx", i + 1)
        within = within & (a >= F.element_at("_exact", idx[lo])) & (
            a <= F.element_at("_exact", idx[hi])
        )
    return agg.select(
        "value",
        F.element_at("_exact", idx[0.25]).alias("p25"),
        F.element_at("_exact", idx[0.50]).alias("p50"),
        F.element_at("_exact", idx[0.75]).alias("p75"),
        within.alias("within_rank_bound"),
    )


_STRATA = {
    "1-URGENT": 0.50,
    "2-HIGH": 0.25,
    "3-MEDIUM": 0.10,
    "4-NOT SPECIFIED": 0.05,
    "5-LOW": 0.02,
}
_CASE_SQL = "CASE o_orderpriority " + " ".join(
    f"WHEN '{k}' THEN {int(v * _BUCKETS)}" for k, v in _STRATA.items()
) + " ELSE 0 END"


@REGISTRY.add(
    "s05_stratified_sample",
    f"""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
          % {_BUCKETS} < {_CASE_SQL}
    """,
    "sketch",
    "sampling",
)
def s05_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-class keep fractions (rebalance
    skewed classes when cutting a training subset). Same md5-bucket
    mechanics as s01, so membership is stable under retries AND consistent
    across the strata — a row's bucket never changes, only the per-class
    cut. Pure codegen filter, no shuffle, no RNG."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit(0)
    for k, v in _STRATA.items():
        cut = F.when(F.col("o_orderpriority") == k, F.lit(int(v * _BUCKETS))).otherwise(cut)
    return o.where(md5_bucket(F.col("o_orderkey")) % _BUCKETS < cut).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


_TRAIN_CUT, _VAL_CUT = int(0.8 * _BUCKETS), int(0.9 * _BUCKETS)


@REGISTRY.add(
    "s06_train_test_split",
    f"""
    SELECT o_orderkey,
           CASE WHEN b < {_TRAIN_CUT} THEN 'train'
                WHEN b < {_VAL_CUT} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT o_orderkey,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
               % {_BUCKETS} AS b
        FROM orders
    )
    """,
    "sketch",
    "sampling",
)
def s06_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by id-hash bucket:
    the three sets are disjoint, exhaustive, and stable across runs and
    engines — no RNG, no state file, no leakage when the table grows
    (a row's split never changes because its bucket never does)."""
    o = load(spark, sf_dir, "orders")
    b = md5_bucket(F.col("o_orderkey")) % _BUCKETS
    return o.select(
        "o_orderkey",
        F.when(b < _TRAIN_CUT, "train").when(b < _VAL_CUT, "val").otherwise("test").alias("split"),
    )


_W_RATE = 0.3        # base keep rate at weight 1.0
_W_NORM = 400.0      # length normalizer: weight = min(1, len(text)/400)


@REGISTRY.add(
    "s07_weighted_sample",
    f"""
    SELECT doc_id, n_tokens, keep_prob
    FROM (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {_W_RATE} * least(1.0, LENGTH(text) / {_W_NORM}) AS keep_prob,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               % {_BUCKETS} AS b
        FROM documents
    )
    WHERE b < CAST(floor(keep_prob * {_BUCKETS}) AS UBIGINT)
    """,
    "sketch",
    "sampling",
)
def s07_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: each document's keep
    probability scales with its length (longer documents carry more
    training signal per row; the conventional length-proportional
    up-weighting, capped at 1). Same md5-bucket mechanics as s01 — the
    per-row cut moves with the weight while the row's bucket never does,
    so membership is reproducible across runs, engines and repartitioning
    where ``df.sample`` (per-partition RNG) is not. Pure codegen filter
    on the scan: no shuffle, no RNG, no collected weights."""
    d = load(spark, sf_dir, "documents")
    keep_prob = F.lit(_W_RATE) * F.least(
        F.lit(1.0), F.length("text") / F.lit(_W_NORM)
    )
    b = md5_bucket(F.col("doc_id")) % _BUCKETS
    return (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            keep_prob.alias("keep_prob"),
            b.alias("_b"),
        )
        .where(F.col("_b") < F.floor(F.col("keep_prob") * _BUCKETS))
        .drop("_b")
    )


# ---------------------------------------------------------------------------
# s08: ANALYZE-style exact column statistics — the one-pass profile a
# cost-based optimizer (and a data-quality gate) collects per table:
# row count, per-column null count, exact NDV, min/max. One wide
# aggregation; Spark expands the multi-distinct into one Expand + shared
# shuffle (no per-column scan), which is the plan ANALYZE TABLE itself
# produces. Values stay in each column's native integer/string domain so
# the comparison is exact.
_STATS_ORACLE = """
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
"""


@REGISTRY.add("s08_column_stats", _STATS_ORACLE, "sampling", "stats")
def s08_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile of ``orders`` (bigint, char, decimal-ish
    double, varchar columns): one aggregation node computes every
    statistic; the long format (one row per column) keeps the output
    scalar-typed for the comparator.

    r14 nanmoney swap: the double min/max render through the loud
    ``money_dec`` DECIMAL(18,2) cast — a NaN extreme raises on BOTH
    engines instead of Spark silently printing NULL."""
    from ..functions.core import money_dec

    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    aggs = []
    for c in cols:
        # doubles render through DECIMAL(18,2): Spark's double→string
        # goes scientific past 1e7 ("4.997E9") while DuckDB stays plain
        # ("4997050500.0") — a fixed-scale decimal prints identically on
        # both engines at any magnitude (value-invariant below 1e7)
        from pyspark.sql.types import DoubleType

        mn, mx = F.min(c), F.max(c)
        if isinstance(o.schema[c].dataType, DoubleType):
            mn = money_dec(mn, "decimal(18,2)")
            mx = money_dec(mx, "decimal(18,2)")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            mn.cast("string").alias(f"{c}__min"),
            mx.cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select(
        "s.col", "s.n_rows", "s.n_nulls", "s.ndv", "s.min_v", "s.max_v"
    )


# ---------------------------------------------------------------------------
# s09: weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
# each row gets key u^(1/w) for a uniform u and weight w; the k largest
# keys are an exact weighted k-sample with no replacement and no
# coordination — the distributed-sampling primitive s07's independent
# Bernoulli cut cannot provide (s07 has no fixed k, and heavy rows can
# all drop). u derives from md5 (cross-engine, reproducible under
# repartitioning); keys are compared as ln(u)/w (monotone in u^(1/w))
# floored to integer nano-units so selection and rank are order-exact.
_ES_K = 50
_ES_DENOM = 4503599627370497.0  # 2^52 + 1: 13 md5 hex chars -> u in (0,1)
_ES_ORACLE = f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(FLOOR(
                   ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
                            AS DOUBLE) + 1.0) / {_ES_DENOM})
                   / CAST(len(string_split(text, ' ')) AS DOUBLE)
                   * 1000000000.0
               ) AS BIGINT) AS key_e9
        FROM documents
    )
    SELECT doc_id, n_tokens, key_e9, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY key_e9 DESC, doc_id) AS rank
        FROM keyed
    )
    WHERE rank <= {_ES_K}
"""


@REGISTRY.add("s09_weighted_sample_wor", _ES_ORACLE, "sketch", "sampling")
def s09_weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_ES_K} by Efraimidis-Spirakis key with weight = token count:
    longer documents are proportionally likelier, but each document
    appears at most once. Pure codegen keying + TakeOrderedAndProject;
    the rank window runs on the k survivors only."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    keyed = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.floor(
            F.log((h.cast("double") + F.lit(1.0)) / F.lit(_ES_DENOM))
            / n_tokens.cast("double")
            * F.lit(1000000000.0)
        ).alias("key_e9"),
    )
    topk = keyed.orderBy(F.col("key_e9").desc(), F.col("doc_id")).limit(_ES_K)
    # unpartitioned window, DELIBERATE: ranks only the <= _ES_K limit
    # survivors (TakeOrderedAndProject already cut the corpus); the
    # "No Partition Defined" warning is benign here — a constant
    # partitionBy(lit(0)) is folded away and does not hush it
    w = Window.orderBy(F.col("key_e9").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# s10: count-min sketch — the fixed-size frequency summary for streams /
# merges where the exact term table is too big (counters are mergeable by
# plain +, unlike a top-k list). d=4 salted md5 rows × w=256 buckets; an
# estimate is min over rows of the bucket counter, OVERCOUNTS ONLY. The
# sketch is deterministic given the salts, so the oracle REPLAYS the
# identical sketch in SQL and the driver hash-checks real CMS estimates —
# no within_bound weakening; `overcount = est − exact ≥ 0` exposes the
# collision error directly. Scale shape: building is one explode(d) +
# groupBy((row, bucket)) into d·w counters regardless of input size; the
# d·w table is broadcast for probing.
_CMS_D, _CMS_W = 4, 256


def _cms_bucket_sql(i: str, term: str = "term") -> str:
    return (
        f"('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || {term}), 1, 8))"
        f"::UBIGINT % {_CMS_W}"
    )


_CMS_ORACLE = f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    rows_ AS (SELECT CAST(t.i AS INTEGER) AS i FROM generate_series(0, {_CMS_D - 1}) t(i)),
    sketch AS (
        SELECT i, {_cms_bucket_sql("i")} AS bucket, COUNT(*) AS cnt
        FROM words CROSS JOIN rows_ GROUP BY 1, 2
    ),
    exact AS (SELECT term, COUNT(*) AS exact_cnt FROM words GROUP BY term),
    est AS (
        SELECT e.term, MIN(s.cnt) AS cms_est
        FROM exact e CROSS JOIN rows_ r
        JOIN sketch s ON s.i = r.i AND s.bucket = {_cms_bucket_sql("r.i", "e.term")}
        GROUP BY e.term
    )
    SELECT exact.term, CAST(exact.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(est.cms_est - exact.exact_cnt AS BIGINT) AS overcount
    FROM exact JOIN est USING (term)
"""


@REGISTRY.add("s10_countmin_sketch", _CMS_ORACLE, "sketch", "approx")
def s10_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min term-frequency sketch (4×256, salted md5 rows) built and
    probed in-plan; emits exact count, CMS estimate, and the collision
    overcount per term."""
    from ..tables import load as _load

    d = _load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("term"))
    rows_i = F.explode(
        F.array(*[F.lit(i) for i in range(_CMS_D)])
    ).alias("i")

    def bucket(i_col, term_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(i_col.cast("string"), F.lit(":"), term_col)),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint") % _CMS_W
        )

    tagged = words.select("term", rows_i)
    sketch = (
        tagged.select("i", bucket(F.col("i"), F.col("term")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = words.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.select("term", rows_i).withColumn(
        "bucket", bucket(F.col("i"), F.col("term"))
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return exact.join(est, "term").select(
        "term",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# s11: equi-width histogram — the data-profiling primitive behind ANALYZE
# histograms and UI distribution panels. Bin edges derive from the global
# min/max, which ride a SINGLE-ROW broadcast into the binning pass (same
# scalar-subquery shape as q35): two scans of customer, no window, no
# single-partition funnel. All arithmetic is integer cents — the value has
# at most 2 decimals, so DECIMAL(12,2)*100 is exact and the bin index is
# one BIGINT floor-division both engines compute identically (no float
# boundary can flip a row between bins). Scale: at 100 TB the min/max agg
# and the binned count are both one map-side-combined aggregation each;
# the bin count (12) is a constant, so the final groupBy is tiny.

_HISTOGRAM_BINS = 12

_HISTOGRAM_ORACLE = f"""
    WITH c AS (
        SELECT CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM customer
    ),
    mm AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM c)
    SELECT
        CAST(LEAST((c.cents - mm.mn) * {_HISTOGRAM_BINS} // (mm.mx - mm.mn + 1),
                   {_HISTOGRAM_BINS - 1}) AS BIGINT) AS bin,
        CAST(MIN(mm.mn + ((mm.mx - mm.mn + 1) * LEAST((c.cents - mm.mn) * {_HISTOGRAM_BINS} // (mm.mx - mm.mn + 1), {_HISTOGRAM_BINS - 1})) // {_HISTOGRAM_BINS}) AS BIGINT) AS lo_cents,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(c.cents) AS BIGINT) AS bin_min_cents,
        CAST(MAX(c.cents) AS BIGINT) AS bin_max_cents
    FROM c, mm
    GROUP BY 1
"""


@REGISTRY.add("s11_equiwidth_histogram", _HISTOGRAM_ORACLE, "profile", "agg")
def s11_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-bin equi-width histogram of customer.c_acctbal in exact integer
    cents; global min/max arrive via a single-row broadcast."""
    c = load(spark, sf_dir, "customer").select(
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    )
    mm = c.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    b = _HISTOGRAM_BINS
    binned = c.crossJoin(F.broadcast(mm)).withColumn(
        "bin",
        F.expr(f"least((cents - mn) * {b} div (mx - mn + 1), {b - 1})").cast(
            "bigint"
        ),
    )
    return binned.groupBy("bin").agg(
        F.expr(f"CAST(MIN(mn + ((mx - mn + 1) * bin) div {b}) AS BIGINT)").alias(
            "lo_cents"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("cents").cast("bigint").alias("bin_min_cents"),
        F.max("cents").cast("bigint").alias("bin_max_cents"),
    )


# ---------------------------------------------------------------------------
# s12: schema-wide data-quality report — the dbt-test/Deequ-style
# constraint audit the reference delegates to Postgres PKs and Neo4j
# uniqueness constraints. One row per (table, check): PK uniqueness,
# NOT-NULL, and FK orphan counts, every check a single aggregation or
# anti-join count (quality.quality_report). The TPC-H fixture is clean,
# so violations are 0 — the CHECK is that both engines compute the same
# zeros the same way; tests/test_pipeline.py-style dirty-data unit tests
# cover the non-zero paths.
_QUALITY_ORACLE = """
    SELECT 'orders' AS tbl, 'unique_o_orderkey' AS chk,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'customer', 'unique_c_custkey',
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'customer', 'not_null_c_acctbal',
           CAST(COALESCE(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'lineitem', 'not_null_l_quantity',
           CAST(COALESCE(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'fk_l_orderkey_to_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders', 'fk_o_custkey_to_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
"""


@REGISTRY.add("s12_quality_report", _QUALITY_ORACLE, "quality", "profiling")
def s12_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the TPC-H schema: PK uniqueness, NOT NULL,
    FK orphans — one (tbl, chk, n_violations) row each."""
    from ..quality import quality_report

    tables = {name: load(spark, sf_dir, name)
              for name in ("orders", "customer", "lineitem")}
    return quality_report(
        tables,
        fks=[("lineitem", "l_orderkey", "orders", "o_orderkey"),
             ("orders", "o_custkey", "customer", "c_custkey")],
        uniques=[("orders", "o_orderkey"), ("customer", "c_custkey")],
        not_nulls=[("customer", "c_acctbal"), ("lineitem", "l_quantity")],
    )


# ---------------------------------------------------------------------------
# s13: mergeable HLL-style distinct sketch with EXACT integer registers.
# Spark's approx_count_distinct hides its HLL++ registers in the JVM;
# a 100 TB pipeline wants the registers as DATA — per-shard sketch rows
# it can persist, ship, and merge later without re-reading the shard
# (the same persistable-state design as the d21 signature store and s10
# CMS). Everything is integer: the md5-derived 60-bit hash splits into
# a 6-bit bucket and a 54-bit suffix whose leading-zero rank comes from
# the binary-string length (no log2 — libm rounding is not portable);
# s55 = Σ_buckets 2^(55−M_b) is the estimator's denominator as one exact
# BIGINT (≤ 2^61). The '__union__' row is computed by MERGING the
# per-type register tables (bucketwise MAX) while the oracle computes it
# DIRECTLY from the raw rows — their equality under the hash gate is the
# proof that the sketch merge is lossless. n_exact_users is the audit
# column (computed exactly, like d34's reconstruction error).
_HLL_M = 64  # 6-bit bucket index, 2^6 registers


def _hll_regs(ud: DataFrame) -> DataFrame:
    """Register table over the DISTINCT (day, user_id) table: bucket and
    rank are pure functions of user_id, and MAX(rank) per (day, bucket)
    is duplicate-insensitive — so hashing the deduplicated pairs computes
    the identical registers while touching each (day, user) once (r14:
    the raw-event form paid the md5/conv/bin chain once per EVENT row)."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    z = F.expr(f"h div {_HLL_M}")
    rank = F.when(z == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(z))
    )
    return (
        ud.select("day", h.alias("h"))
        .select(
            "day",
            (F.col("h") % _HLL_M).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("m"))
    )


def _hll_row(regs: DataFrame, scope_col) -> DataFrame:
    grp = regs.groupBy(scope_col.alias("scope"))
    return grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_hit"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << 55).cast("bigint")
        ).cast("bigint").alias("s55"),
    )


_HLL_ORACLE = f"""
    WITH b AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::UBIGINT::BIGINT AS h
        FROM events
    ), r AS (
        SELECT day, user_id, h % {_HLL_M} AS bucket,
               CASE WHEN h // {_HLL_M} = 0 THEN 55
                    ELSE 55 - length(bin(h // {_HLL_M})) END AS rank
        FROM b
    ), regs AS (
        SELECT day, bucket, MAX(rank) AS m FROM r GROUP BY 1, 2
    ), per_day AS (
        SELECT day AS scope,
               CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
               CAST(SUM(1::BIGINT << (55 - m))
                    + ({_HLL_M} - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS s55
        FROM regs GROUP BY 1
    ), u_regs AS (
        SELECT bucket, MAX(rank) AS m FROM r GROUP BY 1
    ), u_row AS (
        SELECT '__union__' AS scope,
               CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
               CAST(SUM(1::BIGINT << (55 - m))
                    + ({_HLL_M} - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS s55
        FROM u_regs
    ), ex AS (
        SELECT strftime(ts, '%Y-%m-%d') AS scope,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users
        FROM events GROUP BY 1
        UNION ALL
        SELECT '__union__', CAST(COUNT(DISTINCT user_id) AS BIGINT)
        FROM events
    )
    SELECT s.scope, s.n_buckets_hit, s.s55, ex.n_exact_users
    FROM (SELECT * FROM per_day UNION ALL SELECT * FROM u_row) s
    JOIN ex ON ex.scope = s.scope
"""


@REGISTRY.add("s13_hll_registers", _HLL_ORACLE, "sketch", "distinct")
def s13_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DAY HLL register sketches (64 buckets, exact integer s55
    denominator) plus the '__union__' row obtained by MERGING the 30
    daily register tables — bucketwise MAX, the shard-then-merge shape a
    daily 100 TB ingest uses; the oracle computes the union DIRECTLY
    from raw rows, so hash equality proves the merge is lossless.

    One full-data pass (r14): the distinct (day, user_id) table is the
    shared base — registers hash the deduplicated pairs (bucket/rank are
    functions of user_id; MAX(rank) is duplicate-insensitive), the
    per-day exact count is a plain count over it, and the union exact
    count a distinct-user re-agg of it. The raw-event form ran three
    full scans (register hash per event row + two countDistinct passes)
    for identical values."""
    ev = load(spark, sf_dir, "events").select("ts", "user_id")
    ud = (
        ev.select(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"), "user_id"
        )
        .distinct()
        .localCheckpoint()  # read 3x: registers + both exact branches
    )
    regs = _hll_regs(ud).localCheckpoint()  # read 2x: per-day + merge
    per_day = _hll_row(regs, F.col("day"))
    merged = regs.groupBy("bucket").agg(F.max("m").alias("m"))
    union_row = _hll_row(merged, F.lit("__union__"))
    exact = (
        ud.groupBy(F.col("day").alias("scope"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_users"))
        .unionByName(
            ud.agg(
                F.countDistinct("user_id").cast("bigint").alias("n_exact_users")
            ).select(F.lit("__union__").alias("scope"), "n_exact_users")
        )
    )
    return per_day.unionByName(union_row).join(exact, "scope")


# ---------------------------------------------------------------------------
# s14: Poisson bootstrap — THE resampling scheme for massive data
# (Chamandy et al., "Estimating uncertainty for massive data streams",
# Google 2012): classic bootstrap needs a global n-sized resample index
# per replicate (impossible shuffle at 100 TB); Poisson(1) weights make
# every row's contribution to every replicate a pure function of the
# row itself, so B replicates ride ONE scan + one 50-group aggregation.
# Determinism: the weight is inverse-CDF'd from an md5 ppm draw per
# (row, replicate) — exact integer thresholds, no RNG; the statistic is
# exact integer cents; the CI bounds are exact order statistics of the
# replicate means. Any engine reproduces the identical table.
_BOOT_B = 50
# Poisson(1) CDF in ppm: P(0)=.367879, P(≤1)=.735759, P(≤2)=.919699,
# P(≤3)=.981012; remainder draws weight 4 (tail capped)
_BOOT_T = (367879, 735759, 919699, 981012)
_BOOT_W_SQL = f"""CASE
    WHEN u < {_BOOT_T[0]} THEN 0 WHEN u < {_BOOT_T[1]} THEN 1
    WHEN u < {_BOOT_T[2]} THEN 2 WHEN u < {_BOOT_T[3]} THEN 3
    ELSE 4 END"""
_BOOT_ORACLE = f"""
    WITH draws AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               b.b,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-'
                                   || CAST(b.b AS VARCHAR)), 1, 8))
                   ::UBIGINT % 1000000 AS u
        FROM orders, UNNEST(generate_series(1, {_BOOT_B})) AS b(b)
        WHERE o_totalprice IS NULL OR NOT isnan(o_totalprice)
    ), reps AS (
        SELECT b, CAST(SUM(w) AS BIGINT) AS n,
               CAST(SUM(w * cents) AS BIGINT) AS total_cents,
               CAST(SUM(w * cents) // SUM(w) AS BIGINT) AS mean_cents
        FROM (SELECT b, cents, {_BOOT_W_SQL} AS w FROM draws)
        GROUP BY b
    ), ranked AS (
        SELECT mean_cents,
               ROW_NUMBER() OVER (ORDER BY mean_cents ASC) AS r
        FROM reps
    )
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_reps,
           (SELECT CAST(SUM(mean_cents) // {_BOOT_B} AS BIGINT) FROM reps)
               AS mean_of_means_cents,
           (SELECT mean_cents FROM ranked WHERE r = 3) AS p05_mean_cents,
           (SELECT mean_cents FROM ranked WHERE r = 48) AS p95_mean_cents
"""


@REGISTRY.add("s14_poisson_bootstrap", _BOOT_ORACLE, "sketch", "resampling")
def s14_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% bootstrap CI for the mean order price: 50 Poisson-weighted
    replicates in one scan, exact integer cents, order-statistic bounds
    (ranks 3 and 48 = ceil(.05·50), ceil(.95·50))."""
    from pyspark.sql import Window as W

    # NaN prices leave the bootstrap domain on both engines (the r12
    # nanmoney contract — Spark's NaN->DECIMAL cast silently drops the
    # row, DuckDB refuses loudly); NULL prices stay, as the nulled-probe
    # green pins
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .where(
            F.col("o_totalprice").isNull() | ~F.isnan("o_totalprice")
        )
    )
    draws = o.select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        F.col("o_orderkey"),
    ).select(
        "cents",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.col("o_orderkey").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).alias("u"),
    )
    w = (
        F.when(F.col("u") < _BOOT_T[0], 0)
        .when(F.col("u") < _BOOT_T[1], 1)
        .when(F.col("u") < _BOOT_T[2], 2)
        .when(F.col("u") < _BOOT_T[3], 3)
        .otherwise(4)
    )
    reps = (
        draws.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("n"),
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("total_cents"),
        )
        .select(
            "b", F.expr("total_cents div n").cast("bigint").alias("mean_cents")
        )
    )
    ranked = reps.select(
        "mean_cents",
        F.row_number().over(W.orderBy(F.col("mean_cents").asc())).alias("r"),
    )  # B rows total — the single-partition window is replicate-sized, not data-sized
    return (
        reps.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reps"),
            F.expr(f"CAST(sum(mean_cents) div {_BOOT_B} AS BIGINT)").alias(
                "mean_of_means_cents"
            ),
        )
        .crossJoin(
            ranked.where(F.col("r") == 3).select(
                F.col("mean_cents").alias("p05_mean_cents")
            )
        )
        .crossJoin(
            ranked.where(F.col("r") == 48).select(
                F.col("mean_cents").alias("p95_mean_cents")
            )
        )
    )


# ---------------------------------------------------------------------------
# s15: guaranteed-coverage eval sample — "at least k per stratum" where
# fraction-based sampling (s05) can return zero rows for a rare class:
# rank every row inside its stratum by the portable md5 order and keep
# rank ≤ k. Deterministic across engines, retries, and repartitionings;
# the within-stratum window is bounded by stratum population.
_EVAL_K = 20


@REGISTRY.add(
    "s15_stratified_topk_sample",
    f"""
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                             1, 8))::UBIGINT, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= {_EVAL_K}
    """,
    "sketch",
    "sampling",
)
def s15_stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(k, n) rows per priority class by md5 order — the
    eval-set cut with guaranteed per-class coverage."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    rn = F.row_number().over(
        W.partitionBy("o_orderpriority").orderBy(
            md5_bucket(F.col("o_orderkey")), F.col("o_orderkey")
        )
    )
    return (
        o.withColumn("rn", rn)
        .where(F.col("rn") <= _EVAL_K)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# s16: exact WEIGHTED median — the estimator quantile_cont can't give
# you (every engine's percentile treats rows equally; a 100 TB fact
# wants value-by-importance). Definition: smallest value whose
# cumulative weight reaches half the total — integer-exact via the
# cum·2 ≥ total comparison on BIGINT weights, and tie-proof because
# weights are pre-aggregated per DISTINCT value before the cumulative
# walk (no within-value ordering exists to matter). The window runs
# over distinct values per group; at open-domain scale the two-phase
# prefix rank (operators/ranks.py) is the drop-in replacement.
_WMED_ORACLE = """
    WITH w AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wgt
        FROM lineitem GROUP BY 1, 2
    ), c AS (
        SELECT flag, price, wgt,
               SUM(wgt) OVER (PARTITION BY flag ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(wgt) OVER (PARTITION BY flag) AS total
        FROM w
    )
    SELECT flag,
           CAST(MAX(total) AS BIGINT) AS total_weight,
           MIN(price) FILTER (WHERE cum * 2 >= total) AS weighted_median
    FROM c GROUP BY flag
"""


@REGISTRY.add("s16_weighted_median", _WMED_ORACLE, "sketch", "stats")
def s16_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag."""
    from pyspark.sql import Window as W

    l = load(spark, sf_dir, "lineitem")
    w = l.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("wgt"))
    win = W.partitionBy("flag").orderBy("price").rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = W.partitionBy("flag")
    c = w.select(
        "flag", "price", "wgt",
        F.sum("wgt").over(win).alias("cum"),
        F.sum("wgt").over(tot).alias("total"),
    )
    return c.groupBy("flag").agg(
        F.max("total").cast("bigint").alias("total_weight"),
        F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("price")))
        .alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# s17: per-group exact WEIGHTED quartiles — s16's median generalized to
# the p25/p50/p75 triple, per line status. Same tie-proof construction
# (weights pre-aggregated per distinct value; quantile q is the
# smallest value whose 4·cum ≥ q·total — all-BIGINT comparisons, no
# interpolation, no floats). The cumulative window runs over DISTINCT
# prices per group; at open-domain scale the range-partitioned prefix
# sum (operators/ranks.py) is the drop-in replacement.
_WQRT_ORACLE = """
    WITH w AS (
        SELECT l_linestatus AS status, l_extendedprice AS price,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wgt
        FROM lineitem GROUP BY 1, 2
    ), c AS (
        SELECT status, price, wgt,
               SUM(wgt) OVER (PARTITION BY status ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(wgt) OVER (PARTITION BY status) AS total
        FROM w
    )
    SELECT status,
           CAST(MAX(total) AS BIGINT) AS total_weight,
           MIN(price) FILTER (WHERE cum * 4 >= total) AS wq25,
           MIN(price) FILTER (WHERE cum * 4 >= total * 2) AS wq50,
           MIN(price) FILTER (WHERE cum * 4 >= total * 3) AS wq75
    FROM c GROUP BY status
"""


@REGISTRY.add("s17_weighted_quartiles", _WQRT_ORACLE, "sketch", "stats")
def s17_weighted_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted exact p25/p50/p75 of extended price per line
    status (lower weighted quantile; BIGINT-exact thresholds)."""
    from pyspark.sql import Window as W

    l = load(spark, sf_dir, "lineitem")
    w = l.groupBy(
        F.col("l_linestatus").alias("status"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("wgt"))
    win = W.partitionBy("status").orderBy("price").rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = W.partitionBy("status")
    c = w.select(
        "status", "price", "wgt",
        F.sum("wgt").over(win).alias("cum"),
        F.sum("wgt").over(tot).alias("total"),
    )
    return c.groupBy("status").agg(
        F.max("total").cast("bigint").alias("total_weight"),
        F.min(F.when(F.col("cum") * 4 >= F.col("total"), F.col("price")))
        .alias("wq25"),
        F.min(F.when(F.col("cum") * 4 >= F.col("total") * 2, F.col("price")))
        .alias("wq50"),
        F.min(F.when(F.col("cum") * 4 >= F.col("total") * 3, F.col("price")))
        .alias("wq75"),
    )


# ---------------------------------------------------------------------------
# s18: CUPED variance-reduction audit (Deng et al. WSDM'13) — the A/B
# experimentation primitive: θ = cov(pre,post)/var(pre) over per-user
# spend in the two halves of the event log, plus the variance-reduction
# fraction R² the covariate would buy. Everything that must be exact IS
# exact: per-user cents are BIGINT (values are 2-decimal by contract,
# DECIMAL(12,4)·100 is an integer), the five sufficient statistics ride
# DECIMAL(38,0)/HUGEINT (n·Σxy − Σx·Σy stays ≤ 30 digits even at 1000×
# today's users), and θ·10⁶ derives by integral division — the d47
# discipline. R² alone is a final double (both engines divide the same
# two exactly-represented decimals).
_CUPED_ORACLE = """
    WITH t AS (
        SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT)
            AS snap_us
        FROM events
    ), ev AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
        FROM events
    ), u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ev.us < t.snap_us THEN cents ELSE 0 END)
                    AS HUGEINT) AS x,
               CAST(SUM(CASE WHEN ev.us >= t.snap_us THEN cents ELSE 0 END)
                    AS HUGEINT) AS y
        FROM ev CROSS JOIN t GROUP BY user_id
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS sum_pre_cents,
           CAST(sy AS BIGINT) AS sum_post_cents,
           CAST(1000000::HUGEINT * (n * sxy - sx * sy)
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS theta_ppm,
           CAST(FLOOR(
               1000000.0
               * CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE)
               / (CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                  * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE))
           ) AS BIGINT) AS r2_e6
    FROM s
"""


@REGISTRY.add("s18_cuped_theta", _CUPED_ORACLE, "sketch", "stats",
              "experiment")
def s18_cuped_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED θ (ppm, exact integral division) and covariate R² (µ-units)
    for per-user spend: pre-period = first half of the event log as the
    covariate for the second half."""
    from ..functions.core import money_cents_decimal
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events")
    us = epoch_us(F.col("ts"))
    t = ev.agg(F.min(us).alias("_mn"), F.max(us).alias("_mx")).select(
        F.expr("CAST((_mn + _mx) div 2 AS BIGINT)").alias("snap_us")
    )
    # loud-on-NaN variant of the DECIMAL cents idiom (r11 NaN triage)
    cents = money_cents_decimal("value")
    u = (
        ev.select("user_id", us.alias("us"), cents.alias("cents"))
        .crossJoin(F.broadcast(t))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("snap_us"), F.col("cents"))
                  .otherwise(0)).cast("decimal(38,0)").alias("x"),
            F.sum(F.when(F.col("us") >= F.col("snap_us"), F.col("cents"))
                  .otherwise(0)).cast("decimal(38,0)").alias("y"),
        )
    )
    s = u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("sx").cast("bigint").alias("sum_pre_cents"),
        F.col("sy").cast("bigint").alias("sum_post_cents"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * (n * sxy - sx * sy)"
            " div NULLIF(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("theta_ppm"),
        F.expr(
            "CAST(FLOOR(1000000.0"
            " * CAST(n * sxy - sx * sy AS DOUBLE)"
            " * CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"
            "    * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE))"
            ") AS BIGINT)"
        ).alias("r2_e6"),
    )


# ---------------------------------------------------------------------------
# s19: LOG-HISTOGRAM quantile sketch — the mergeable-sketch answer to
# "approximate quantiles over 100 TB with bounded state": values bucket
# by floor(log2(cents)), per-bucket counts merge by plain addition
# (commutative/associative — the property test unions two halves), and
# quantile q reads the smallest bucket whose cumulative count covers
# q·n. The bucket bound guarantees the estimate is within 2× of the
# exact quantile; the oracle recomputes the exact quantile and the
# within-bucket booleans make that guarantee a hard hash signal. The
# bucket index is computed by 40 integer comparisons (v ≥ 2^k), not
# FLOOR(LOG2(v)) — float log at an exact power of 2 is engine-dependent,
# integer compares are not.
_LOGB = " + ".join(
    f"(CASE WHEN v >= {1 << k} THEN 1 ELSE 0 END)" for k in range(1, 41)
)
_LHQ_CENTS = "CAST(l_extendedprice * 100 AS BIGINT)"
_LHQ_ORACLE = f"""
    WITH c AS (
        SELECT {_LHQ_CENTS} AS v FROM lineitem WHERE l_extendedprice > 0
    ), b AS (
        SELECT v, CAST({_LOGB} AS BIGINT) AS bkt FROM c
    ), h AS (
        SELECT bkt, COUNT(*) AS cnt FROM b GROUP BY bkt
    ), cum AS (
        SELECT bkt, cnt,
               SUM(cnt) OVER (ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               SUM(cnt) OVER () AS n
        FROM h
    ), pick AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cm * 2 >= n THEN bkt END) AS BIGINT) AS b50,
               CAST(MIN(CASE WHEN cm * 10 >= n * 9 THEN bkt END) AS BIGINT) AS b90,
               CAST(MIN(CASE WHEN cm * 100 >= n * 99 THEN bkt END) AS BIGINT) AS b99
        FROM cum
    ), vals AS (
        SELECT v, COUNT(*) AS cnt FROM c GROUP BY v
    ), exact AS (
        SELECT v,
               SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               SUM(cnt) OVER () AS n
        FROM vals
    ), eq AS (
        SELECT CAST(MIN(CASE WHEN cm * 2 >= n THEN v END) AS BIGINT) AS q50,
               CAST(MIN(CASE WHEN cm * 10 >= n * 9 THEN v END) AS BIGINT) AS q90,
               CAST(MIN(CASE WHEN cm * 100 >= n * 99 THEN v END) AS BIGINT) AS q99
        FROM exact
    )
    SELECT p.n,
           (CAST(1 AS BIGINT) << b50) AS p50_lo, e.q50 AS p50_exact,
           e.q50 >= (CAST(1 AS BIGINT) << b50)
             AND e.q50 < (CAST(1 AS BIGINT) << (b50 + 1)) AS p50_in_bucket,
           (CAST(1 AS BIGINT) << b90) AS p90_lo, e.q90 AS p90_exact,
           e.q90 >= (CAST(1 AS BIGINT) << b90)
             AND e.q90 < (CAST(1 AS BIGINT) << (b90 + 1)) AS p90_in_bucket,
           (CAST(1 AS BIGINT) << b99) AS p99_lo, e.q99 AS p99_exact,
           e.q99 >= (CAST(1 AS BIGINT) << b99)
             AND e.q99 < (CAST(1 AS BIGINT) << (b99 + 1)) AS p99_in_bucket
    FROM pick p CROSS JOIN eq e
"""


@REGISTRY.add("s19_log_histogram_quantiles", _LHQ_ORACLE, "sketch", "stats")
def s19_log_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log₂-bucket histogram sketch of extended price (cents):
    p50/p90/p99 bucket lower bounds, the exact quantiles, and the
    in-bucket booleans that make the 2× guarantee a hard hash signal.
    Sketch state is ≤ 40 counters regardless of input size."""
    from pyspark.sql import Window as W

    l = load(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    c = l.select(
        F.expr(_LHQ_CENTS).alias("v")
    )
    b = c.select("v", F.expr(f"CAST({_LOGB} AS BIGINT)").alias("bkt"))
    h = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    cum = h.select(
        "bkt", "cnt",
        F.sum("cnt").over(
            W.orderBy("bkt").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cm"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )
    pick = cum.agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("bkt")))
        .cast("bigint").alias("b50"),
        F.min(F.when(F.col("cm") * 10 >= F.col("n") * 9, F.col("bkt")))
        .cast("bigint").alias("b90"),
        F.min(F.when(F.col("cm") * 100 >= F.col("n") * 99, F.col("bkt")))
        .cast("bigint").alias("b99"),
    )
    # exact quantiles over the DISTINCT-value histogram: the groupBy
    # reduces rows to the value domain before any window runs, so the
    # cumulative sum orders domain-sized state, never the row count
    # (s16/s17's construction; at open-domain scale the range-
    # partitioned prefix sum in operators/ranks.py is the drop-in
    # replacement for this window).
    vals = c.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    exact = vals.select(
        "v",
        F.sum("cnt").over(
            W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cm"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )
    eq = exact.agg(
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("v")))
        .cast("bigint").alias("q50"),
        F.min(F.when(F.col("cm") * 10 >= F.col("n") * 9, F.col("v")))
        .cast("bigint").alias("q90"),
        F.min(F.when(F.col("cm") * 100 >= F.col("n") * 99, F.col("v")))
        .cast("bigint").alias("q99"),
    )
    return pick.crossJoin(eq).select(
        "n",
        F.expr("shiftleft(CAST(1 AS BIGINT), b50)").alias("p50_lo"),
        F.col("q50").alias("p50_exact"),
        ((F.col("q50") >= F.expr("shiftleft(CAST(1 AS BIGINT), b50)"))
         & (F.col("q50") < F.expr("shiftleft(CAST(1 AS BIGINT), b50 + 1)")))
        .alias("p50_in_bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), b90)").alias("p90_lo"),
        F.col("q90").alias("p90_exact"),
        ((F.col("q90") >= F.expr("shiftleft(CAST(1 AS BIGINT), b90)"))
         & (F.col("q90") < F.expr("shiftleft(CAST(1 AS BIGINT), b90 + 1)")))
        .alias("p90_in_bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), b99)").alias("p99_lo"),
        F.col("q99").alias("p99_exact"),
        ((F.col("q99") >= F.expr("shiftleft(CAST(1 AS BIGINT), b99)"))
         & (F.col("q99") < F.expr("shiftleft(CAST(1 AS BIGINT), b99 + 1)")))
        .alias("p99_in_bucket"),
    )


# ---------------------------------------------------------------------------
# s20: SAMPLE-RATIO-MISMATCH check — the first thing an experimentation
# pipeline validates before reading any metric: does the 50/50 md5
# assignment actually split users 50/50 within each event type? For a
# two-cell split the chi-square statistic collapses to (a−b)²/n, which
# stays in exact BIGINT arithmetic as integer ppm; the flag compares
# against the χ²(1df, α=0.05) critical value 3.841459 in the same ppm
# scale. Distinct users per arm is one keyed aggregation.
_SRM_ARM = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT "
    "% 1000000 < 500000"
)
_SRM_ORACLE = f"""
    WITH u AS (
        SELECT event_type,
               COUNT(DISTINCT CASE WHEN {_SRM_ARM} THEN user_id END) AS a,
               COUNT(DISTINCT CASE WHEN NOT ({_SRM_ARM}) THEN user_id END) AS b
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(a AS BIGINT) AS n_arm_a,
           CAST(b AS BIGINT) AS n_arm_b,
           CAST((a - b) * (a - b) * 1000000 // (a + b) AS BIGINT)
               AS chi2_ppm,
           (a - b) * (a - b) * 1000000 // (a + b) >= 3841459 AS srm_flag
    FROM u
"""


@REGISTRY.add("s20_srm_check", _SRM_ORACLE, "stats", "experiment", "audit")
def s20_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch χ² (integer ppm, exact BIGINT) for the
    50/50 md5 user split within each event type, flagged against the
    1-df α=0.05 critical value."""
    ev = load(spark, sf_dir, "events")
    arm_a = md5_bucket(F.col("user_id")) % _BUCKETS < 500_000
    u = ev.groupBy("event_type").agg(
        F.count_distinct(F.when(arm_a, F.col("user_id"))).alias("a"),
        F.count_distinct(F.when(~arm_a, F.col("user_id"))).alias("b"),
    )
    chi2 = F.expr("CAST((a - b) * (a - b) * 1000000 div (a + b) AS BIGINT)")
    return u.select(
        "event_type",
        F.col("a").cast("bigint").alias("n_arm_a"),
        F.col("b").cast("bigint").alias("n_arm_b"),
        chi2.alias("chi2_ppm"),
        (chi2 >= 3_841_459).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# s21: MANN-WHITNEY U — the nonparametric two-sample test an
# experimentation pipeline runs when values are skewed (medians, not
# means). Everything stays exact BIGINT by working in DOUBLED midranks:
# for pooled value v, r2(v) = 2·(#smaller) + (#equal) + 1 is always an
# integer, so Σ-of-ranks and U stay integers too (u2 = 2·U). The
# identity u2_a + u2_b = 2·n_a·n_b is emitted as a hard consistency
# boolean. Ranks come from the per-(event_type, cents) pooled histogram
# — the cumulative window orders value-domain-sized state per group,
# never rows.
_MW_ORACLE = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               {_SRM_ARM} AS in_a
        FROM events
    ), h AS (
        SELECT event_type, cents,
               SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
        FROM ev GROUP BY 1, 2
    ), c AS (
        -- NULLS FIRST pins DuckDB to Spark's ASC default (Spark ranks
        -- NULLs first, DuckDB last): a NULL-cents event is one tie group
        -- ranking below every real value — "missing ranks lowest", the
        -- same convention as pandas rank(na_option='bottom') inverted
        SELECT event_type, cents, ca, cb,
               COALESCE(SUM(ca + cb) OVER (PARTITION BY event_type
                   ORDER BY cents NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_less
        FROM h
    ), r AS (
        SELECT event_type,
               SUM(ca) AS na, SUM(cb) AS nb,
               SUM(ca * (2 * n_less + (ca + cb) + 1)) AS sr2a,
               SUM(cb * (2 * n_less + (ca + cb) + 1)) AS sr2b
        FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(sr2a - na * (na + 1) AS BIGINT) AS u2_a,
           CAST(sr2b - nb * (nb + 1) AS BIGINT) AS u2_b,
           (sr2a - na * (na + 1)) + (sr2b - nb * (nb + 1))
               = 2 * na * nb AS u_identity_ok
    FROM r
"""


@REGISTRY.add("s21_mann_whitney_u", _MW_ORACLE, "stats", "experiment")
def s21_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (doubled-midrank BIGINT arithmetic, ties
    handled) between the two md5 arms per event type, with the
    u2_a + u2_b = 2·n_a·n_b identity as a hard signal."""
    from pyspark.sql import Window as W

    from ..functions.core import money_cents

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        # money_cents, not the inline FLOOR idiom: floor(NaN) is a silent
        # 0 engine-side while the oracle refuses loudly (r11 NaN triage)
        money_cents("value").alias("cents"),
        (md5_bucket(F.col("user_id")) % _BUCKETS < 500_000).alias("in_a"),
    )
    h = ev.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("cb"),
    )
    c = h.select(
        "event_type", "cents", "ca", "cb",
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(
                W.partitionBy("event_type").orderBy("cents")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("n_less"),
    )
    r = c.groupBy("event_type").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.expr("ca * (2 * n_less + (ca + cb) + 1)")).alias("sr2a"),
        F.sum(F.expr("cb * (2 * n_less + (ca + cb) + 1)")).alias("sr2b"),
    )
    return r.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("CAST(sr2a - na * (na + 1) AS BIGINT)").alias("u2_a"),
        F.expr("CAST(sr2b - nb * (nb + 1) AS BIGINT)").alias("u2_b"),
        F.expr(
            "(sr2a - na * (na + 1)) + (sr2b - nb * (nb + 1)) = 2 * na * nb"
        ).alias("u_identity_ok"),
    )


# ---------------------------------------------------------------------------
# s22: CUSUM drift detection — the sequential change detector a metrics
# pipeline runs on daily aggregates: S_t = max(0, S_{t-1} + x_t − μ − k)
# per event type over its daily value sums (exact cents), with
# allowance k = μ div 20 and alarm threshold h = μ div 2. Unlike a
# fixed-window drift test (e27), CUSUM accumulates small persistent
# shifts until they cross h — the standard Page test, in exact BIGINT
# arithmetic so the alarm sequence is deterministic across engines,
# partitionings and replays. The recursion is not window-expressible;
# it folds JVM-side over each type's sorted day array (state is
# #days-sized — bounded by the calendar, not the event count; the
# daily aggregation is the only row-scaled shuffle). The oracle walks
# the same recursion via a recursive CTE.
_CUSUM_DAY_US = 86_400_000_000
_CUSUM_ORACLE = f"""
    WITH RECURSIVE ev AS (
        SELECT event_type,
               epoch_us(ts) // {_CUSUM_DAY_US} AS day,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), daily AS (
        SELECT event_type, day, SUM(cents) AS x
        FROM ev GROUP BY event_type, day
    ), st AS (
        SELECT event_type, SUM(x) // COUNT(*) AS mu
        FROM daily GROUP BY event_type
    ), idx AS (
        SELECT d.event_type, d.day, d.x,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.day) AS rn
        FROM daily d
    ), walk(event_type, rn, day, x, s) AS (
        SELECT i.event_type, i.rn, i.day, i.x,
               GREATEST(0, i.x - st.mu - st.mu // 20)
        FROM idx i JOIN st USING (event_type) WHERE i.rn = 1
        UNION ALL
        SELECT i.event_type, i.rn, i.day, i.x,
               GREATEST(0, w.s + i.x - st.mu - st.mu // 20)
        FROM walk w
        JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1
        JOIN st ON st.event_type = i.event_type
    )
    SELECT w.event_type,
           CAST(w.day AS BIGINT) AS day,
           CAST(w.x AS BIGINT) AS day_cents,
           CAST(w.s AS BIGINT) AS cusum_cents,
           w.s >= st.mu // 2 AS alarm
    FROM walk w JOIN st USING (event_type)
"""


@REGISTRY.add("s22_cusum_drift", _CUSUM_ORACLE, "stats", "drift", "audit")
def s22_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily CUSUM (Page test) in exact cents: daily
    value sums, the max(0, ·) recursion folded over the sorted day
    array JVM-side, alarm at μ div 2 above the μ + μ div 20 drift
    allowance."""
    from ..functions.core import money_cents
    from ..tables import epoch_us

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        # integer div, not float /: a double quotient landing an ULP
        # under an exact day boundary would floor to the previous day
        epoch_us(F.col("ts")).alias("us"),
        # money_cents, not the inline FLOOR idiom (r11 NaN triage)
        money_cents("value").alias("cents"),
    ).select(
        "event_type",
        F.expr(f"us div {_CUSUM_DAY_US}").alias("day"),
        "cents",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").alias("x")
    )
    per_type = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("ds"),
        F.expr("CAST(sum(x) div count(*) AS BIGINT)").alias("mu"),
    )
    # fold: acc is the running array of (day, x, s); `get` is the
    # NULL-safe 0-based probe (element_at throws on empty under ANSI)
    folded = per_type.select(
        "event_type", "mu",
        F.expr(
            "aggregate(ds, CAST(array() AS array<struct<day:bigint,"
            "x:bigint,s:bigint>>), (acc, e) -> concat(acc, array(struct("
            "e.day AS day, e.x AS x, GREATEST(CAST(0 AS BIGINT),"
            " coalesce(get(acc, size(acc) - 1).s, CAST(0 AS BIGINT))"
            " + e.x - mu - mu div 20) AS s))))"
        ).alias("walk"),
    )
    w = folded.select(
        "event_type", "mu", F.explode("walk").alias("e")
    )
    return w.select(
        "event_type",
        F.col("e.day").alias("day"),
        F.col("e.x").alias("day_cents"),
        F.col("e.s").alias("cusum_cents"),
        (F.col("e.s") >= F.expr("mu div 2")).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# s23: DELTA-METHOD ratio-metric CI — the missing member of the
# experimentation suite (s18 CUPED, s20 SRM, s21 MWU): revenue-per-view
# is a ratio of two per-user sums, so its variance needs the delta
# method, not a t-test on per-user ratios (users with zero views would
# divide by zero, and the ratio of means ≠ mean of ratios). Sufficient
# statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate EXACTLY — cents ride
# DECIMAL(38,0)/HUGEINT so the squares cannot overflow — and only the
# final CI arithmetic runs in DOUBLE with an identical expression tree
# on both engines (the cosine-fold precedent: same exact integer
# inputs + same IEEE op order = bit-identical doubles).
_DM_Z = "1.959964"  # two-sided 95% normal quantile, fixed literal
_DM_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
# shared double expression fragments — IDENTICAL text on both engines so
# the IEEE op order (and hence every output bit) matches
_DM_R = "CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)"
_DM_SE_INNER = (
    "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    f" - 2 * ({_DM_R})"
    " * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    f" + ({_DM_R}) * ({_DM_R})"
    " * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    " / CAST(n AS DOUBLE)))"
    " / (CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE)"
    " / ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))"
)
_DM_SE = f"sqrt({_DM_SE_INNER})"
_DM_ORACLE = f"""
    WITH pu AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                         ::UBIGINT % 1000000 < 500000
                    THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN {_DM_CENTS} ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ), s AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
               SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        FROM pu GROUP BY arm
    ), f AS (
        SELECT arm, n, sx, sy,
               CAST(sxx AS BIGINT) AS sxx_b,
               CAST(syy AS BIGINT) AS syy_b,
               CAST(sxy AS BIGINT) AS sxy_b,
               {_DM_R} AS r,
               {_DM_SE} AS se
        FROM s
    )
    SELECT arm, n AS n_users, sx AS x_cents, sy AS y_events,
           sxx_b AS sxx, syy_b AS syy, sxy_b AS sxy,
           r, se, r - {_DM_Z} * se AS ci_lo, r + {_DM_Z} * se AS ci_hi
    FROM f
"""


@REGISTRY.add("s23_delta_method_ratio", _DM_ORACLE, "stats", "experiment")
def s23_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm revenue-per-view ratio with the delta-method 95% CI:
    exact integer sufficient statistics (squares in DECIMAL(38,0)),
    one double formula identical on both engines."""
    from ..functions.core import money_cents

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        # money_cents under the purchase guard, not inline {_DM_CENTS}:
        # floor(NaN) is a silent 0 engine-side while the oracle refuses
        # loudly (r11 NaN triage); non-purchase rows never evaluate it
        F.sum(
            F.when(F.col("event_type") == "purchase", money_cents("value"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("x"),
        F.expr(
            "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
        ).alias("y"),
    ).select(
        F.when(md5_bucket(F.col("user_id")) % 1000000 < 500000, "A")
        .otherwise("B").alias("arm"),
        "x", "y",
    )
    s = pu.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.expr(
            "SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))"
        ).alias("sxx"),
        F.expr(
            "SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))"
        ).alias("syy"),
        F.expr(
            "SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))"
        ).alias("sxy"),
    )
    f = s.select(
        "arm", "n", "sx", "sy",
        F.expr("CAST(sxx AS BIGINT)").alias("sxx_b"),
        F.expr("CAST(syy AS BIGINT)").alias("syy_b"),
        F.expr("CAST(sxy AS BIGINT)").alias("sxy_b"),
        F.expr(_DM_R).alias("r"),
        F.expr(_DM_SE).alias("se"),
    )
    return f.select(
        "arm",
        F.col("n").alias("n_users"),
        F.col("sx").alias("x_cents"),
        F.col("sy").alias("y_events"),
        F.col("sxx_b").alias("sxx"),
        F.col("syy_b").alias("syy"),
        F.col("sxy_b").alias("sxy"),
        "r", "se",
        F.expr(f"r - {_DM_Z} * se").alias("ci_lo"),
        F.expr(f"r + {_DM_Z} * se").alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# s24: ALWAYS-VALID mSPRT — the sequential companion to s23's fixed-n
# CI: the mixture sequential probability ratio for the A−B mean
# difference (purchase cents per user) under a N(0, τ²) effect prior,
# valid at EVERY peek, so the experimentation platform can monitor
# continuously without alpha-spending. Λ = sqrt(V/(V+τ²)) ·
# exp(d²τ²/(2V(V+τ²))); we emit log Λ (ln is the one transcendental
# verified bit-identical across engines — exp/pow are NOT, see e37) and
# the decision boolean log Λ > ln 20 ⇔ always-valid p < 0.05. All
# sufficient statistics are exact integers (squares in
# DECIMAL(38,0)/HUGEINT); the double formula is one shared text on
# both engines. τ = $1 (100 cents), a fixed effect-scale prior.
_SPRT_TAU2 = "10000.0"  # (100 cents)^2
_SPRT_LN20 = "2.995732273553991"  # ln(20): two-sided alpha 0.05
_SPRT_D = (
    "(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"
)
_SPRT_V = (
    "((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE)"
    " / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)"
    " / CAST(na AS DOUBLE)"
    " + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE)"
    " / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)"
    " / CAST(nb AS DOUBLE))"
)
_SPRT_LOGL = (
    f"0.5 * ln({_SPRT_V} / ({_SPRT_V} + {_SPRT_TAU2}))"
    f" + ({_SPRT_D}) * ({_SPRT_D}) * {_SPRT_TAU2}"
    f" / (2 * ({_SPRT_V}) * (({_SPRT_V}) + {_SPRT_TAU2}))"
)
_SPRT_ORACLE = f"""
    WITH pu AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                         ::UBIGINT % 1000000 < 500000
                    THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN {_DM_CENTS} ELSE 0 END) AS x
        FROM events GROUP BY user_id
    ), s AS (
        SELECT
            CAST(COUNT(*) FILTER (arm = 'A') AS BIGINT) AS na,
            CAST(COUNT(*) FILTER (arm = 'B') AS BIGINT) AS nb,
            CAST(SUM(x) FILTER (arm = 'A') AS BIGINT) AS sxa,
            CAST(SUM(x) FILTER (arm = 'B') AS BIGINT) AS sxb,
            CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                 FILTER (arm = 'A') AS BIGINT) AS sxxa,
            CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                 FILTER (arm = 'B') AS BIGINT) AS sxxb
        FROM pu
    )
    SELECT na AS n_a, nb AS n_b, sxa AS x_cents_a, sxb AS x_cents_b,
           sxxa AS sxx_a, sxxb AS sxx_b,
           {_SPRT_D} AS delta,
           {_SPRT_V} AS variance,
           {_SPRT_LOGL} AS log_lambda,
           {_SPRT_LOGL} > {_SPRT_LN20} AS significant
    FROM s
"""


@REGISTRY.add("s24_msprt_always_valid", _SPRT_ORACLE, "stats", "experiment")
def s24_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid mixture SPRT for the A−B purchase-cents mean
    difference: exact integer sufficient statistics per arm, log Λ via
    the shared-text ln formula, decision at log Λ > ln 20 (always-valid
    p < 0.05)."""
    from ..functions.core import money_cents

    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        # money_cents under the purchase guard (r11 NaN triage, s23 twin)
        F.sum(
            F.when(F.col("event_type") == "purchase", money_cents("value"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("x"),
    ).select(
        F.when(md5_bucket(F.col("user_id")) % 1000000 < 500000, "A")
        .otherwise("B").alias("arm"),
        "x",
    )
    s = pu.agg(
        F.expr("CAST(COUNT(*) FILTER (WHERE arm = 'A') AS BIGINT)")
        .alias("na"),
        F.expr("CAST(COUNT(*) FILTER (WHERE arm = 'B') AS BIGINT)")
        .alias("nb"),
        F.expr("CAST(SUM(x) FILTER (WHERE arm = 'A') AS BIGINT)")
        .alias("sxa"),
        F.expr("CAST(SUM(x) FILTER (WHERE arm = 'B') AS BIGINT)")
        .alias("sxb"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))"
            " FILTER (WHERE arm = 'A') AS BIGINT)"
        ).alias("sxxa"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))"
            " FILTER (WHERE arm = 'B') AS BIGINT)"
        ).alias("sxxb"),
    )
    return s.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.col("sxa").alias("x_cents_a"), F.col("sxb").alias("x_cents_b"),
        F.col("sxxa").alias("sxx_a"), F.col("sxxb").alias("sxx_b"),
        F.expr(_SPRT_D).alias("delta"),
        F.expr(_SPRT_V).alias("variance"),
        F.expr(_SPRT_LOGL).alias("log_lambda"),
        F.expr(f"{_SPRT_LOGL} > {_SPRT_LN20}").alias("significant"),
    )
