"""g18's handoff-edge construction, independently recomputed in plain
python from the raw lineitem rows (the SCC operator itself is
property-tested against a transitive-closure reference in
test_properties.py; this pins the EDGE DERIVATION — per-order supplier
sequence by (first line number, suppkey), consecutive handoffs, top-2
strongest successors per source)."""

from __future__ import annotations

from collections import Counter, defaultdict


def _python_handoff_edges(rows):
    """rows: (l_orderkey, l_suppkey, l_linenumber) tuples."""
    first_ln: dict = {}
    for ok, s, ln in rows:
        k = (ok, s)
        if k not in first_ln or ln < first_ln[k]:
            first_ln[k] = ln
    per_order: dict = defaultdict(list)
    for (ok, s), ln in first_ln.items():
        per_order[ok].append((ln, s))
    handoffs: Counter = Counter()
    for ok, seq in per_order.items():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            handoffs[(a, b)] += 1
    by_src: dict = defaultdict(list)
    for (a, b), w in handoffs.items():
        by_src[a].append((-w, b))
    edges = set()
    for a, lst in by_src.items():
        for _, b in sorted(lst)[:2]:
            edges.add((a, b))
    return edges


def test_g18_edges_match_python_recomputation(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    l = load(spark, sf, "lineitem")
    rows = [
        (r["l_orderkey"], r["l_suppkey"], r["l_linenumber"])
        for r in l.select("l_orderkey", "l_suppkey", "l_linenumber").collect()
    ]
    want = _python_handoff_edges(rows)

    pos = l.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).agg(F.min("l_linenumber").alias("first_ln"))
    nxt = pos.select(
        "s",
        F.lead("s").over(
            W.partitionBy("ok").orderBy("first_ln", "s")
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    h = nxt.groupBy(F.col("s").alias("src"), F.col("t").alias("dst")).agg(
        F.count(F.lit(1)).alias("w")
    )
    e = (
        h.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
            ),
        )
        .where(F.col("rn") <= 2)
        .select("src", "dst")
    )
    got = {(r["src"], r["dst"]) for r in e.collect()}
    assert got == want and len(got) > 0
