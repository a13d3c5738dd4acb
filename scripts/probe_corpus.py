"""Adversarial-corpus parity probe: replay EVERY registered query against
its DuckDB oracle on a mutated copy of the sf0.001 tables.

Round 10 ran these sweeps ad-hoc (poisoned / empty / big-values / skew /
degenerate-text / constant-clock) and found 12 operator crashes plus 2 real
100 TB hazards; this script makes the probe a standing, repeatable tool so
round 11's oracle-alignment work (the `_E_CTE`/`MEDIA_CTE` NULL-row class
and the five per-query alignments) has a measurable before/after.

Usage:
    python scripts/probe_corpus.py nulled [names...]
    python scripts/probe_corpus.py empty
    python scripts/probe_corpus.py negval    # mixed-sign money/values
    python scripts/probe_corpus.py bigvals   # money x10^4, cents > 2^31
    python scripts/probe_corpus.py degtext   # empty/whitespace/megatoken docs
    python scripts/probe_corpus.py constant  # one clock tick, one value, one text
    python scripts/probe_corpus.py nan       # IEEE NaN in double columns
    python scripts/probe_corpus.py unicode   # emoji/CJK/RTL/combining text
    python scripts/probe_corpus.py epochs    # pre-1970 + far-future clocks
    python scripts/probe_corpus.py nanmoney  # NaN in lineitem/orders money
    python scripts/probe_corpus.py nanemb   # NaN inside embedding vectors
    python scripts/probe_corpus.py nullemb  # NULL components inside vectors
Prints one line per divergent query and a final summary count.
(The 70%-hot-key skew sweep lives as a permanent pytest instead:
tests/test_skew_corpus_parity.py — it must FLIP the salting guards,
which needs a corpus sized to the guard thresholds, not a mutation.)

Expected divergences on `epochs` (documented engine semantics, pinned by
tests/test_epoch_inputs.py): e13/e17/e18/e23 — Spark Structured
Streaming initializes the event-time watermark to epoch 0, so pre-1970
event times are dropped as late in the first micro-batch while the
batch oracles keep them. Standing state 224/228.

Full-battery standing state at round-14 HEAD (zero silent divergences
on any kind except the five r15-scheduled nanemb cosine rankers):
nulled/negval/degtext/constant/unicode 228/228; nan 218/228 + 10
loud-by-design money refusals; empty 221/228 (documented scalar
shapes); bigvals 224/228 (4 loud overflows); epochs 224/228 (above);
nanmoney 215/228, diverged=0, 13 refusals loud on BOTH engines;
nanemb 223/228, diverged=5 (d09/d10/d11/d13/d39 — registry.py r15
schedule), crashed=0.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# Same mutation as tests/test_null_inputs.py::nulled_dir — every 7th key's
# payload column goes NULL (text / embedding / event value / order price).
NULLABLE = {
    "documents": ("text", "doc_id"),
    "embeddings": ("embedding", "vec_id"),
    "events": ("value", "event_id"),
    "orders": ("o_totalprice", "o_orderkey"),
}


def build_corpus(spark: SparkSession, kind: str, out_dir: str) -> None:
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if kind == "nulled" and t in NULLABLE:
            col, key = NULLABLE[t]
            df = df.withColumn(
                col, F.when(F.col(key) % 7 == 0, None).otherwise(F.col(col))
            )
        elif kind == "empty":
            df = df.limit(0)
        elif kind == "bigvals":
            # r10's big-values regime: money/value columns x10^4 push
            # exact cents past 2^31 and decimal products past 2^63.
            # Unit-price columns (decimal(12,4) spec width) are NOT
            # scaled — prices don't grow with data volume; sums do.
            if t == "events":
                df = df.withColumn("value", F.col("value") * 10000)
            elif t == "orders":
                df = df.withColumn(
                    "o_totalprice", F.col("o_totalprice") * 10000
                )
        elif kind == "degtext" and t == "documents":
            # empty / whitespace-only / single-5000-char-token documents
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 5 == 0, F.lit(""))
                .when(F.col("doc_id") % 5 == 1, F.lit("   "))
                .when(F.col("doc_id") % 5 == 2,
                      F.expr("repeat('x', 5000)"))
                .otherwise(F.col("text")),
            )
        elif kind == "constant":
            # one clock tick, one value, one text: degenerate ranges,
            # all-duplicate corpora, 0-width histograms
            if t == "events":
                df = df.withColumn(
                    "ts", F.lit("2024-01-15 12:00:00").cast("timestamp")
                ).withColumn("value", F.lit(42.5))
            elif t == "documents":
                df = df.withColumn(
                    "text", F.lit("the same document text every time")
                )
        elif kind == "nan":
            # IEEE NaN (not NULL) in double columns — engines disagree
            # on NaN more often than on NULL (ordering, grouping,
            # equality); every 11th key's value goes NaN
            if t == "events":
                df = df.withColumn(
                    "value",
                    F.when(
                        F.col("event_id") % 11 == 0,
                        F.lit(float("nan")),
                    ).otherwise(F.col("value")),
                )
        elif kind == "nanemb" and t == "embeddings":
            # r13 frontier corpus: IEEE NaN INSIDE the embedding arrays
            # (component 0 of every 13th vector) — the ANN/similarity
            # family's NaN surface. A NaN component turns every dot
            # product / norm that touches the vector into NaN; Spark SQL
            # orders NaN GREATER than every value, so a NaN cosine
            # passes `>= threshold` gates and wins top-k windows
            # engine-side while DuckDB's list math diverges. Expected
            # state after the r14 batch (the vector-domain contract —
            # similarity.drop_nan_vectors + _E_CTE_FIN — at
            # d26/d34/d36/d40/d13b/d63/d64/m18/d44): those nine are
            # value-exact; the ONLY remaining divergences are the five
            # r15-scheduled cosine rankers d09/d10/d11/d13/d39
            # (registry.py schedule), i.e. 223/228 ok, diverged=5,
            # crashed=0.
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 13 == 0,
                    F.expr(
                        "concat(array(cast('NaN' as float)), "
                        "slice(embedding, 2, size(embedding) - 1))"
                    ),
                ).otherwise(F.col("embedding")),
            )
        elif kind == "nullemb" and t == "embeddings":
            # r14 frontier-sizing corpus: SQL NULL INSIDE the embedding
            # arrays (component 0 of every 13th vector — same key
            # pattern as nanemb so the two classes are directly
            # comparable). Distinct hazard from NULL whole-vectors
            # (dropped at the loaders) and from NaN components (ordered
            # HIGH by Spark): a NULL element propagates as NULL through
            # JVM folds (zip_with/aggregate yield NULL dots → NULL
            # cosines, which comparisons treat as unknown → filtered),
            # while the Arrow kernels see None inside the list and build
            # object-dtype numpy batches — the same crash class d13b had
            # for NaN. DuckDB list arithmetic propagates NULL too but
            # its aggregates/ranks then SKIP the NULL where Spark's
            # windows may keep the row. Measured to size the class;
            # expected state documented in SURVEY round-14 once sized.
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 13 == 0,
                    F.expr(
                        "concat(array(cast(NULL as float)), "
                        "slice(embedding, 2, size(embedding) - 1))"
                    ),
                ).otherwise(F.col("embedding")),
            )
        elif kind == "nanmoney":
            # The r12 frontier-sizing corpus: NaN in the RELATIONAL money
            # columns (lineitem/orders) instead of events.value. Expected
            # state after the r14 swap batch (the class is CLOSED): ZERO
            # silent value divergences and ZERO oracle-side-only
            # refusals — q17/q28/s04 carry the NaN-exclusion domain
            # contract (both engines), and every remaining money-cast
            # site (q15/e42 in r13; q01, q02, q10, q24, q29, q34, q35,
            # q47, s08 in r14) raises the loud money_dec /
            # money_cents_decimal refusal ENGINE-side, matching the
            # oracle's NaN→DECIMAL refusal class (alongside q45's floor
            # helper and s19's ANSI overflow). Standing state:
            # 215/228 ok, diverged=0, crashed=13 — all 13 loud by
            # design on both engines. q40/s14 r12 contracts value-exact.
            if t == "lineitem":
                df = df.withColumn(
                    "l_extendedprice",
                    F.when(
                        F.col("l_orderkey") % 13 == 0, F.lit(float("nan"))
                    ).otherwise(F.col("l_extendedprice")),
                )
            elif t == "orders":
                df = df.withColumn(
                    "o_totalprice",
                    F.when(
                        F.col("o_orderkey") % 13 == 0, F.lit(float("nan"))
                    ).otherwise(F.col("o_totalprice")),
                )
        elif kind == "unicode" and t == "documents":
            # Multibyte / non-Latin regimes where Spark (UTF8String +
            # Java regex) and DuckDB (RE2-flavored, utf8proc) most often
            # disagree: astral-plane emoji (4-byte UTF-8, surrogate
            # pairs in UTF-16), unsegmented CJK, RTL Arabic, NFD
            # combining marks, zero-width joiners, non-ASCII whitespace,
            # mathematical-alphanumeric letters. Keyed by doc_id so the
            # mutation is deterministic and both engines read the same
            # parquet bytes.
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 11 == 0,
                       F.lit("I \U0001F496 data \U0001F680\U0001F680 "
                             "pipelines \U0001F600 but\U0001F916tokenizers"))
                .when(F.col("doc_id") % 11 == 1,
                      F.lit("数据管道的质量评估与去重需要精确的分词"))
                .when(F.col("doc_id") % 11 == 2,
                      F.lit("معالجة البيانات الضخمة بسرعة وكفاءة عالية"))
                .when(F.col("doc_id") % 11 == 3,
                      # NFD: base letter + combining acute / diaeresis
                      F.lit("e\u0301te\u0301 cafe\u0301 nai\u0308ve "
                            "re\u0301sume\u0301"))
                .when(F.col("doc_id") % 11 == 4,
                      # U+200B ZWSP, U+200C ZWNJ, U+200D ZWJ
                      F.lit("zero\u200bwidth\u200cjoined\u200dtext here"))
                .when(F.col("doc_id") % 11 == 5,
                      # U+00A0 NBSP, U+2003 EM SPACE, U+2009 THIN SPACE
                      F.lit("non\u00a0breaking\u2003em\u2009thin spaces"))
                .when(F.col("doc_id") % 11 == 6,
                      F.lit("Ω≈ç√∫ "
                            "\U0001D518\U0001D52B\U0001D526 \U00010348")
                      )
                .otherwise(F.col("text")),
            )
        elif kind == "epochs" and t == "events":
            # Shift the WHOLE clock by a constant so the corpus straddles
            # epoch zero: half the events land pre-1970 (negative unix
            # seconds/micros). Relative order and every inter-event gap
            # are preserved, so watermark/session/lag semantics are
            # untouched — per-event scatter would create legitimately-
            # late data that streaming drops by design and batch oracles
            # keep, drowning the probe in expected-semantics noise.
            # The target class: truncate-vs-floor integer bucketing —
            # for t < 0, CAST(us/gap AS BIGINT) truncates toward zero
            # while floor/`window()` bucket downward, so engines that
            # mix the idioms put the same event in different windows.
            mid = df.selectExpr(
                "CAST((min(unix_micros(CAST(ts AS TIMESTAMP)))"
                " + max(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
                " AS BIGINT) AS m"
            ).first()["m"]
            # land the midpoint 150 s past epoch zero — NOT on a window
            # boundary — so 5-minute windows straddle zero asymmetrically
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.lit(mid - 150_000_000)
                ).cast("timestamp_ntz"),
            )
        elif kind == "negval" and t in NULLABLE and t != "documents":
            # mixed signs: every 3rd key's money/value column flips
            # negative (refunds, chargebacks, corrections) — the regime
            # where truncate-vs-floor integer division and sign-blind
            # formulas diverge between engines
            col, key = NULLABLE[t]
            if t != "embeddings":
                df = df.withColumn(
                    col,
                    F.when(F.col(key) % 3 == 0, -F.col(col))
                    .otherwise(F.col(col)),
                )
            else:
                df = df.withColumn(
                    col,
                    F.when(
                        F.col(key) % 3 == 0,
                        F.transform(col, lambda x: -x),
                    ).otherwise(F.col(col)),
                )
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main() -> int:
    kind = sys.argv[1] if len(sys.argv) > 1 else "nulled"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    from research_data_pipeline_spark.registry import all_specs
    sys.path.insert(0, "tests")
    from tests.oracle import assert_parity

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"probe-{kind}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix=f"probe_{kind}_") as d:
        # isolate the persistent skew-stats store: a probe corpus is
        # synthetic and must never read (or leave behind) a repo-level
        # audit keyed to a reusable path
        import os

        os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = f"{d}/_artifacts"
        build_corpus(spark, kind, d)
        specs = all_specs()
        names = [n for n in specs if not only or n in only]
        bad, crashed = [], []
        for i, name in enumerate(names, 1):
            spec = specs[name]
            if spec.oracle is None:
                continue
            try:
                assert_parity(spec.fn(spark, d), spec.oracle, d, name)
            except AssertionError as e:
                bad.append(name)
                print(f"DIVERGE {name}: {str(e).splitlines()[0][:160]}")
            except Exception as e:  # noqa: BLE001 — probe must survey all
                crashed.append(name)
                print(f"CRASH   {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            if i % 25 == 0:
                print(f"... {i}/{len(names)} done", file=sys.stderr)
        ok = len(names) - len(bad) - len(crashed)
        print(f"SUMMARY kind={kind} ok={ok}/{len(names)} "
              f"diverged={len(bad)} crashed={len(crashed)}")
        print("DIVERGED:", sorted(bad))
        print("CRASHED:", sorted(crashed))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
