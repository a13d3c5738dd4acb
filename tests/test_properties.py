"""Property-based differential tests (hypothesis): the custom temporal
operators agree with independent implementations (pandas.merge_asof,
brute-force pair scan) on adversarially-generated inputs — tie
timestamps, empty sides, key skew, gap-boundary pairs.

Examples are capped small: each example builds Spark DataFrames and runs
jobs, so the value is in the generator's edge cases, not volume.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from research_data_pipeline_spark.operators.temporal import asof_join, range_self_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-100, 100)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=rows_left, rrows=rows_right)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    lpdf = pd.DataFrame(
        {"k": [k for k, _ in lrows], "ts": [_ts(s) for _, s in lrows], "lid": range(len(lrows))}
    )
    rpdf = pd.DataFrame(
        {"k": [k for k, _, _ in rrows], "ts": [_ts(s) for _, s, _ in rrows],
         "val": [v for _, _, v in rrows]}
    ).drop_duplicates(subset=["k", "ts"])  # operator contract: unique (key, ts)
    # pin dtypes: an empty frame would otherwise come out float64/object
    rpdf = rpdf.astype({"k": "int64", "val": "int64"})
    rpdf["ts"] = pd.to_datetime(rpdf["ts"])

    left = spark.createDataFrame(lpdf)
    right = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k bigint, ts timestamp, val bigint")
    )
    got = (
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")
        .select("k", "ts", "lid", "val")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    want = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]),
        rpdf.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)

    assert list(got["lid"]) == list(want["lid"])
    got_vals = [None if pd.isna(v) else int(v) for v in got["val"]]
    want_vals = [None if pd.isna(v) else int(v) for v in want["val"]]
    assert got_vals == want_vals


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=14
    ),
    gap=st.integers(1, 15),
)
def test_range_self_join_matches_bruteforce(spark, rows, gap):
    pdf = pd.DataFrame(
        {"k": [k for k, _ in rows], "ts": [_ts(s) for _, s in rows], "id": range(len(rows))}
    )
    got = {
        (r["k"], r["i"], r["j"])
        for r in range_self_join(
            spark.createDataFrame(pdf), key="k", ts="ts", id_col="id", max_gap_s=float(gap)
        ).collect()
    }
    want = set()
    recs = pdf.to_dict("records")
    for a in recs:
        for b in recs:
            if (
                a["k"] == b["k"]
                and a["id"] < b["id"]
                and abs((b["ts"] - a["ts"]).total_seconds()) <= gap
            ):
                want.add((a["k"], a["id"], b["id"]))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(1, 9),
    edge_pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=12
    ),
)
def test_connected_components_matches_union_find(spark, n, edge_pairs):
    from research_data_pipeline_spark.graph.build import (
        connected_components,
        connected_components_contraction,
    )

    edge_pairs = [(a, b) for a, b in edge_pairs if a < n and b < n and a != b]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    both = [(a, b) for a, b in edge_pairs] + [(b, a) for a, b in edge_pairs]
    edges = (
        spark.createDataFrame(both, "src bigint, dst bigint")
        if both
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    got = {  # default: tiny edge set takes the driver union-find path
        r["node"]: r["label"]
        for r in connected_components(vertices, edges, id_col="node").collect()
    }
    got_dist = {  # forced distributed auto-selection path
        r["node"]: r["label"]
        for r in connected_components(
            vertices, edges, id_col="node", driver_max_edges=0
        ).collect()
    }
    got_star = {
        r["node"]: r["label"]
        for r in connected_components_contraction(
            vertices, edges, id_col="node"
        ).collect()
    }
    assert got_dist == got
    assert got_star == got

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    n_parts=st.integers(1, 5),
)
def test_scalable_prefix_sum_matches_cumsum(spark, vals, n_parts):
    from research_data_pipeline_spark.operators.ranks import scalable_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k bigint, v bigint"
    )
    got = (
        scalable_prefix_sum(df, "k", "v", out="run", n_parts=n_parts)
        .orderBy("k")
        .collect()
    )
    want = pd.Series(vals).cumsum().tolist()
    assert [r["run"] for r in got] == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                  min_size=1, max_size=30),
    n_parts=st.integers(1, 8),
)
def test_scalable_prefix_sum_null_semantics_partition_invariant(
    spark, vals, n_parts
):
    """NULL values must behave like a GLOBAL window sum regardless of the
    partition count: the running total carries through a NULL row, and is
    NULL only before the first non-NULL value. Round 11's nulled-corpus
    probe caught a NULL row landing FIRST in a range partition emitting
    NULL — an output that changed with parallelism (d14/m05 class)."""
    from research_data_pipeline_spark.operators.ranks import scalable_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k bigint, v bigint"
    )
    got = (
        scalable_prefix_sum(df, "k", "v", out="run", n_parts=n_parts)
        .orderBy("k")
        .collect()
    )
    want, acc, seen = [], 0, False
    for v in vals:
        if v is not None:
            acc += v
            seen = True
        want.append(acc if seen else None)
    assert [r["run"] for r in got] == want


def test_contraction_logarithmic_rounds_on_long_path(spark):
    """A 64-node path has diameter 63: label propagation needs ~63 rounds,
    star contraction must close it in O(log n)."""
    from research_data_pipeline_spark.graph.build import (
        connected_components_contraction,
    )

    n = 64
    pairs = [(i, i + 1) for i in range(n - 1)]
    both = pairs + [(b, a) for a, b in pairs]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(both, "src bigint, dst bigint")
    stats: dict = {}
    labels = {
        r["node"]: r["label"]
        for r in connected_components_contraction(
            vertices, edges, id_col="node", stats=stats
        ).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 8, stats  # log2(64)=6 plus slack; diameter is 63


def test_cc_string_ids_no_premature_convergence(spark):
    """String vertex ids must produce correct components. Regression: the
    decimal-sum convergence probe cast string labels to NULL under
    non-ANSI Spark, so None == None reported a fixpoint after round 1 —
    silently wrong components on any string-keyed graph (vertices_from
    in the same module emits string ids). Numeric strings are also
    covered: '10' < '9' lexicographically, so the sum isn't monotone
    even where the cast succeeds."""
    from research_data_pipeline_spark.graph.build import connected_components

    # path a-b-c-d-e: needs >1 propagation round to label everything 'a'
    ids = ["a", "b", "c", "d", "e"]
    pairs = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    both = pairs + [(b, a) for a, b in pairs]
    vertices = spark.createDataFrame([(i,) for i in ids], "node string")
    edges = spark.createDataFrame(both, "src string, dst string")
    labels = {
        r["node"]: r["label"]
        for r in connected_components(vertices, edges, id_col="node").collect()
    }
    assert labels == {i: "a" for i in ids}

    # numeric strings: lexicographic min is '10' over '9' — the label is
    # the lexicographic minimum, and every node must still agree on it
    ids2 = ["9", "10", "11"]
    pairs2 = [("9", "10"), ("10", "11")]
    both2 = pairs2 + [(b, a) for a, b in pairs2]
    v2 = spark.createDataFrame([(i,) for i in ids2], "node string")
    e2 = spark.createDataFrame(both2, "src string, dst string")
    labels2 = {
        r["node"]: r["label"]
        for r in connected_components(v2, e2, id_col="node").collect()
    }
    assert labels2 == {i: "10" for i in ids2}


def test_auto_cc_escalates_to_contraction_on_long_path(spark):
    """The public ``connected_components`` must detect a high-diameter
    graph by itself (label prop not converged after prop_rounds) and
    finish via quotient contraction in O(log n) — no caller choice."""
    from research_data_pipeline_spark.graph.build import connected_components

    n = 64
    pairs = [(i, i + 1) for i in range(n - 1)]
    both = pairs + [(b, a) for a, b in pairs]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(both, "src bigint, dst bigint")
    stats: dict = {}
    labels = {
        r["node"]: r["label"]
        for r in connected_components(
            vertices, edges, id_col="node", stats=stats, driver_max_edges=0
        ).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    assert stats["algorithm"] == "hybrid_contraction", stats
    # total work is prop_rounds + O(log quotient) contraction rounds
    assert stats["prop_rounds"] <= 6, stats
    assert stats["rounds"] <= 8, stats


def test_auto_cc_stays_on_label_prop_when_diameter_small(spark):
    """A star graph (diameter 2) must converge inside the propagation
    budget — the fast path for dense graphs like g05's."""
    from research_data_pipeline_spark.graph.build import connected_components

    n = 20
    pairs = [(0, i) for i in range(1, n)]
    both = pairs + [(b, a) for a, b in pairs]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(both, "src bigint, dst bigint")
    stats: dict = {}
    labels = {
        r["node"]: r["label"]
        for r in connected_components(
            vertices, edges, id_col="node", stats=stats, driver_max_edges=0
        ).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    assert stats["algorithm"] == "label_propagation", stats


# ---------------------------------------------------------------------------
# cardinality-guarded global rank (operators/ranks.py)


def test_value_ranks_partitioned_path_matches_window_path(spark):
    """The range-partitioned rank path (high-cardinality guard) must agree
    exactly with the single-partition distinct-value window path."""
    from research_data_pipeline_spark.operators.ranks import _value_ranks

    df = spark.range(0, 4000).selectExpr(
        "cast(id % 997 as double) * 1.0000001 as metric"
    )
    for ascending in (False, True):
        window = {
            (r["metric"], r["_min_rank"], r["_ties"])
            for r in _value_ranks(
                df, "metric", ascending, max_window_distinct=10**9
            ).collect()
        }
        parted = {
            (r["metric"], r["_min_rank"], r["_ties"])
            for r in _value_ranks(
                df, "metric", ascending, max_window_distinct=1
            ).collect()
        }
        assert window == parted


def test_pandas_int_rank_scales_to_near_unique_doubles(spark):
    """10^6 distinct doubles through the guarded rank: the partitioned path
    engages (cardinality above RANK_WINDOW_MAX_DISTINCT) and produces an
    exact permutation of 1..n — no single-partition distinct-value window
    ever materializes the full value set on one core."""
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.operators.ranks import (
        RANK_WINDOW_MAX_DISTINCT,
        pandas_int_rank,
    )

    n = 1_000_000
    assert n > RANK_WINDOW_MAX_DISTINCT
    df = spark.range(0, n).selectExpr("cast(id as double) * 1.0000001 as metric")
    ranked = pandas_int_rank(df, "metric", out_col="rank", ascending=False)
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
        F.sum("rank").alias("s"),
        F.countDistinct("rank").alias("d"),
    ).first()
    # distinct metric => ranks are exactly the permutation 1..n
    assert (stats["n"], stats["mn"], stats["mx"]) == (n, 1, n)
    assert stats["d"] == n
    assert stats["s"] == n * (n + 1) // 2
    # spot-check orientation: the largest metric holds rank 1
    top = ranked.orderBy(F.col("metric").desc()).select("rank").first()["rank"]
    assert top == 1


# ---------------------------------------------------------------------------
# text-dedup pairing contracts (operators/text_dedup.py)

docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=30).map(
        lambda s: " ".join(s.split()) or "a"
    ),
    min_size=2,
    max_size=10,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy)
def test_simhash_banding_equals_bruteforce(spark, texts):
    """Pigeonhole banding is EXACT: a pair within hamming <= h differs in
    at most h of the h+1 bands, so candidate generation cannot miss it,
    and the verification predicate is the brute-force predicate — the
    banded operator must equal the all-pairs scan on any input."""
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.operators.text_dedup import (
        simhash_pairs,
        simhash_values,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["i"], r["j"], r["hamming"])
        for r in simhash_pairs(df, "doc_id", "text", bits=16, max_hamming=2).collect()
    }
    sig = {r["doc_id"]: r["simhash"] for r in simhash_values(df, "doc_id", "text", 16).collect()}
    exp = set()
    ids = sorted(sig)
    for a in ids:
        for b in ids:
            if a < b:
                h = bin(sig[a] ^ sig[b]).count("1")
                if h <= 2:
                    exp.add((a, b, h))
    assert got == exp


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy)
def test_minhash_lsh_sound_and_complete_for_identical_sets(spark, texts):
    """LSH verification contract: every reported pair carries the EXACT
    token-set Jaccard (soundness — no false positives survive the mask
    verification), and identical token sets are ALWAYS found (identical
    signatures collide in every band)."""
    from research_data_pipeline_spark.operators.text_dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["i"], r["j"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9).collect()
    }
    sets = {i: frozenset(t.split()) for i, t in enumerate(texts)}

    def jac(a, b):
        return len(sets[a] & sets[b]) / len(sets[a] | sets[b])

    # soundness: reported jaccard is the exact set jaccard and >= 0.9
    for (a, b), j in got.items():
        assert a < b
        assert abs(j - jac(a, b)) < 1e-12
        assert j >= 0.9
    # completeness for identical sets: same set -> same signature ->
    # collision in every band -> must be reported (jaccard 1.0)
    for a in sets:
        for b in sets:
            if a < b and sets[a] == sets[b]:
                assert (a, b) in got, (a, b)


# ---------------------------------------------------------------------------
# Round-5 operators vs independent Python references


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy, terms=st.lists(words, min_size=1, max_size=3, unique=True))
def test_bm25_matches_python_reference(spark, texts, terms):
    """bm25_topk vs a direct Python BM25 with the same floor-scaled
    integer scoring — doc set, scores, and rank order must all agree."""
    import math

    from research_data_pipeline_spark.operators.search import (
        BM25_B,
        BM25_K1,
        SCALE,
        bm25_topk,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["score_e6"], r["rank"])
        for r in bm25_topk(df, list(terms), k=len(texts)).collect()
    }

    toks = [t.split(" ") for t in texts]
    n = len(texts)
    avgdl = float(sum(len(ts) for ts in toks)) / n
    dfreq = {
        q: sum(1 for ts in toks if q in ts) for q in terms
    }
    ref = {}
    for i, ts in enumerate(toks):
        score = 0
        matched = False
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            matched = True
            sat = tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(ts) / avgdl))
            )
            idf = math.log(1.0 + ((n - dfreq[q]) + 0.5) / (dfreq[q] + 0.5))
            score += math.floor(sat * idf * SCALE)
        if matched:
            ref[i] = score
    assert set(got) == set(ref)
    for i, s in ref.items():
        assert got[i][0] == s, (i, got[i], s)
    order = sorted(ref, key=lambda i: (-ref[i], i))
    for rank, i in enumerate(order, 1):
        assert got[i][1] == rank


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy)
def test_bigram_nll_matches_python_reference(spark, texts):
    """bigram_nll vs a direct Python add-one bigram LM in the same
    integer micro-nat domain."""
    import math

    from research_data_pipeline_spark.operators.search import SCALE, bigram_nll

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e6"])
        for r in bigram_nll(df).collect()
    }

    toks = [t.split(" ") for t in texts]
    c2: dict[tuple[str, str], int] = {}
    vocab = set()
    for ts in toks:
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len(vocab)
    ref = {}
    for i, ts in enumerate(toks):
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        nll = sum(
            math.floor(math.log((c1[a] + V) / (c2[(a, b)] + 1.0)) * SCALE)
            for a, b in pairs
        )
        ref[i] = (len(pairs), nll)
    assert got == ref


def test_bigram_nll_counts_singleton_doc_tokens_in_vocab(spark):
    """V derives from the c2 table plus single-token docs (round-7 vocab
    optimization): a token appearing ONLY in a 1-token doc is in no
    bigram, but must still enlarge V for every smoothed denominator."""
    import math

    from research_data_pipeline_spark.operators.search import SCALE, bigram_nll

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "zeta"), (3, "beta gamma")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.nll_e6 for r in bigram_nll(df).collect()}
    # V = {alpha, beta, gamma, zeta} = 4; doc 3: ln((c1(beta)+4)/(1+1))
    assert got[3] == math.floor(math.log((2 + 4) / 2.0) * SCALE)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    stored=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=30, unique=True),
    probes=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=30),
)
def test_bloom_never_false_negative(spark, stored, probes):
    """Any probe that IS in the stored set must test positive, whatever
    the strings look like (unicode, near-collisions, duplicates)."""
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.operators import bloom

    filt = bloom.build(
        spark.createDataFrame([(v,) for v in stored], "v string"),
        "v",
        n_bits=1 << 10,
    ).localCheckpoint()
    res = bloom.with_might_contain(
        spark.createDataFrame([(p,) for p in probes], "v string"),
        "v",
        filt,
        n_bits=1 << 10,
    ).collect()
    stored_set = set(stored)
    for r in res:
        if r["v"] in stored_set:
            assert r["might_contain"], r["v"]


# ---------------------------------------------------------------------------
# q36's multiplicity compression: the distinct-name-pair plan must equal
# the naive row-level self-join for ANY name multiset, not just the part
# fixture — duplicates, singleton blocks, and names identical across
# blocks are the edge cases.
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    names=st.lists(
        st.sampled_from(
            ["ax one", "ax two", "ax two", "bz one", "bz onne", "bz x", "ax o"]
        ),
        min_size=2,
        max_size=40,
    )
)
def test_fuzzy_block_compression_matches_rowlevel(spark, names):
    from pyspark.sql import functions as F

    rows = [(i, n) for i, n in enumerate(names)]
    p = spark.createDataFrame(rows, "p_partkey long, p_name string").select(
        "p_partkey", "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    )
    a, b = p.alias("a"), p.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.blk").alias("blk"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .where(F.col("dist") <= 3)
        .groupBy("blk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("fuzzy_pairs"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.sum("dist").cast("bigint").alias("sum_dist"),
        )
    )

    nm = p.groupBy("blk", "p_name").agg(F.count(F.lit(1)).alias("cnt"))
    na, nb = nm.alias("a"), nm.alias("b")
    cross = na.join(
        nb,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("mult"),
    )
    selfp = nm.where(F.col("cnt") >= 2).select(
        "blk",
        F.lit(0).alias("dist"),
        F.expr("cnt * (cnt - 1) div 2").alias("mult"),
    )
    compressed = (
        cross.unionByName(selfp)
        .where(F.col("dist") <= 3)
        .groupBy("blk")
        .agg(
            F.sum("mult").cast("bigint").alias("fuzzy_pairs"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.sum(F.col("dist") * F.col("mult")).cast("bigint").alias("sum_dist"),
        )
    )

    lhs = sorted(map(tuple, naive.collect()))
    rhs = sorted(map(tuple, compressed.collect()))
    assert lhs == rhs


def _bpe_reference(words: dict[str, int], k: int) -> list[tuple]:
    """Plain-Python BPE trainer: greedy left-to-right merge, top pair by
    (count desc, lhs asc, rhs asc). The ground truth for d32b."""
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for step in range(1, k + 1):
        counts: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0
                ) + f
        if not counts:
            break
        (lhs, rhs), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, n))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_training_matches_reference_on_overlap_heavy_corpus(spark, tmp_path):
    """Overlap-heavy words (aaa, abab, aabaa) are exactly where a wrong
    merge scan diverges: greedy left-to-right must give aaa+(a,a)->[aa,a].
    Run d32b's Spark loop on a crafted corpus vs the Python reference."""
    from research_data_pipeline_spark.queries.docs import (
        _bpe_merge_round,
        _BPE_ITERS,
    )
    from pyspark.sql import functions as F

    corpus = {
        "aaa": 50, "aaaa": 30, "abab": 40, "aabaa": 20,
        "banana": 25, "low": 60, "lower": 35, "lowest": 15, "a": 10,
    }
    words = spark.createDataFrame(
        [(list(w), f) for w, f in corpus.items()], "s array<string>, f bigint"
    )
    got = []
    for step in range(1, _BPE_ITERS + 1):
        top1, words = _bpe_merge_round(words)
        r = top1.collect()[0]
        got.append((step, r.lhs, r.rhs, int(r.n)))
    assert got == _bpe_reference(corpus, _BPE_ITERS)
    # the vocabulary itself must match after all merges
    final_ref = {}
    vocab = {tuple(w): f for w, f in corpus.items()}
    for step, lhs, rhs, _ in got:
        nv = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    got_vocab = {
        tuple(r.s): int(r.f)
        for r in words.groupBy("s").agg(F.sum("f").alias("f")).collect()
    }
    assert got_vocab == vocab


# ---------------------------------------------------------------------------
# binned_interval_join ≡ naive BETWEEN join, including bin-boundary
# points, zero-length intervals, and bin widths smaller/larger than the
# intervals (the two degradation modes the docstring promises stay
# correct)


ivl_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 40)),
    min_size=1, max_size=10,
)
pt_rows = st.lists(
    st.tuples(st.integers(100, 199), st.integers(0, 140)),
    min_size=0, max_size=15,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ivls=ivl_rows, pts=pt_rows, bin_width=st.sampled_from([1, 7, 50, 1000]))
def test_binned_interval_join_matches_naive(spark, ivls, pts, bin_width):
    from research_data_pipeline_spark.operators.rangejoin import (
        binned_interval_join,
    )

    intervals = spark.createDataFrame(
        [(k, s, s + l) for k, s, l in ivls], "ikey long, lo long, hi long"
    )
    points = spark.createDataFrame(pts, "pkey long, t long")
    got = sorted(
        map(
            tuple,
            binned_interval_join(intervals, points, "lo", "hi", "t", bin_width)
            .select("ikey", "lo", "hi", "pkey", "t")
            .collect(),
        )
    )
    want = sorted(
        (k, lo, hi, pk, t)
        for (k, lo, l) in [(k, s, l) for k, s, l in ivls]
        for hi in [lo + l]
        for (pk, t) in pts
        if lo <= t <= hi
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24), min_size=2, max_size=8
    )
)
def test_containment_pairs_match_python_sets(spark, docs):
    """containment_ppm equals the exact set computation |A∩B|·10⁶ div |A|
    over 3-gram shingle sets, for every ordered pair above threshold."""
    from research_data_pipeline_spark.operators.text_dedup import (
        containment_pairs,
    )

    def shingles(text: str) -> set:
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["i"], r["j"]): r["containment_ppm"]
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold_ppm=1
        ).collect()
    }
    want = {}
    sh = {i: shingles(t) for i, t in enumerate(docs)}
    for i in sh:
        for j in sh:
            if i != j and sh[i] and (sh[i] & sh[j]):
                ppm = len(sh[i] & sh[j]) * 1_000_000 // len(sh[i])
                if ppm >= 1:
                    want[(i, j)] = ppm
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
        min_size=2, max_size=8,
    ),
    pair_idx=st.data(),
)
def test_exact_jaccard_ppm_matches_python_sets(spark, docs, pair_idx):
    # the helper's integer-ppm Jaccard (bitmask fast path — vocab here is
    # tiny) must equal the python set computation on every pair,
    # including identical docs (ppm = 1e6) and disjoint ones (0)
    from research_data_pipeline_spark.operators.text_dedup import (
        exact_jaccard_ppm,
    )

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = [(i, j) for i in range(len(texts)) for j in range(len(texts)) if i < j]
    pdf = spark.createDataFrame(pairs, "i long, j long")
    got = {
        (r["i"], r["j"]): r["jaccard_ppm"]
        for r in exact_jaccard_ppm(pdf, df, "doc_id", "text").collect()
    }
    for i, j in pairs:
        a, b = set(docs[i]), set(docs[j])
        expect = 1000000 * len(a & b) // len(a | b)
        assert got[(i, j)] == expect, (i, j, docs[i], docs[j])


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2),        # user
                  st.integers(0, 20),       # ts seconds (ties likely)
                  st.integers(0, 2)),       # event type index
        min_size=1, max_size=16,
    ),
)
def test_streaming_scd2_matches_python_islands(spark, events):
    # the stateful drain (midpoint split + flush sentinel) must equal a
    # pure-python gaps-and-islands build on adversarial sequences: tie
    # timestamps (ordered by event_id), single-user bursts, type runs.
    # (tempfile, not the tmp_path fixture: hypothesis re-runs the body
    # per example and needs a fresh dir each time)
    import tempfile
    import uuid as _uuid

    from research_data_pipeline_spark.streaming.jobs import (
        run_scd2_stream_to_batch,
    )

    rows = [
        (eid, _ts(s), int(u), f"t{k}")
        for eid, (u, s, k) in enumerate(events)
    ]
    path = tempfile.mkdtemp(prefix="scd2_prop_") + f"/ev_{_uuid.uuid4().hex[:8]}" 
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).coalesce(1).write.parquet(path)
    got = sorted(
        (r["user_id"], r["version"], r["state"], r["valid_from_us"],
         r["valid_to_us"], r["is_current"], r["n_events"])
        for r in run_scd2_stream_to_batch(spark, path).collect()
    )
    # python reference
    expect = []
    byu: dict[int, list] = {}
    for eid, ts, u, t in sorted(rows, key=lambda r: (r[1], r[0])):
        byu.setdefault(u, []).append((int(ts.timestamp() * 1_000_000), t))
    for u, seq in byu.items():
        islands = []
        for us, t in seq:
            if not islands or islands[-1][0] != t:
                islands.append([t, us, 0])
            islands[-1][2] += 1
        for v, (t, us, n) in enumerate(islands, start=1):
            nxt = islands[v][1] if v < len(islands) else None
            expect.append((u, v, t, us, nxt, nxt is None, n))
    expect = sorted((u, v, t, f, to, cur, n) for u, v, t, f, to, cur, n in expect)
    assert got == expect


# ---------------------------------------------------------------------------
# Round-8 operators
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    weights=st.lists(st.integers(0, 10_000), min_size=1, max_size=8),
    budget=st.integers(1, 100_000),
)
def test_largest_remainder_allocation_sums_exactly(spark, weights, budget):
    """Hamilton apportionment invariants on arbitrary weights: quotas sum
    to the budget EXACTLY, every quota is floor or floor+1 of its real
    share, and zero-weight sources get zero (when any weight is
    positive)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if sum(weights) == 0:
        weights = [w + 1 for w in weights]
    s = spark.createDataFrame(
        [(f"s{i:02d}", w) for i, w in enumerate(weights)],
        "source string, w_e6 long",
    )
    tw = sum(weights)
    base = s.select(
        "source", "w_e6",
        F.expr(f"{budget} * w_e6 div {tw}").alias("floor_alloc"),
        F.expr(f"{budget} * w_e6 % {tw}").alias("rem"),
    )
    leftover = budget - sum(budget * w // tw for w in weights)
    rk = base.withColumn(
        "r",
        F.row_number().over(W.orderBy(F.col("rem").desc(), F.col("source"))),
    )
    alloc = {
        r["source"]: r["floor_alloc"] + (1 if r["r"] <= leftover else 0)
        for r in rk.collect()
    }
    assert sum(alloc.values()) == budget
    for i, w in enumerate(weights):
        lo = budget * w // tw
        assert alloc[f"s{i:02d}"] in (lo, lo + 1)
        if w == 0:
            assert alloc[f"s{i:02d}"] == 0 or leftover >= len(weights)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    changes=st.lists(
        st.tuples(
            st.integers(0, 5),      # key
            st.integers(1, 6),      # lsn (may repeat -> total order rule)
            st.booleans(),          # is_delete
            st.integers(0, 999),    # payload cents
        ),
        min_size=1, max_size=24,
    ),
    dup_factor=st.integers(1, 3),
)
def test_cdc_apply_idempotent_under_replay(spark, changes, dup_factor):
    """Applying a change stream once, twice, or three times produces the
    SAME snapshot (at-least-once safety), and the snapshot equals a
    driver-side fold over the deterministic total order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        (k, lsn, "D" if d else "U", cents) for k, lsn, d, cents in changes
    ]
    df = spark.createDataFrame(
        rows * dup_factor, "key long, lsn long, op string, cents long"
    )
    ranked = df.distinct().select(
        "key", "lsn", "op", "cents",
        F.row_number().over(
            W.partitionBy("key").orderBy(
                F.col("lsn").desc(), F.col("op").desc(), F.col("cents").desc()
            )
        ).alias("rn"),
    )
    got = {
        r["key"]: (r["lsn"], r["cents"])
        for r in ranked.where("rn = 1 AND op <> 'D'").collect()
    }
    # reference fold: max by (lsn, op, cents) over the DEDUPED set
    ref: dict[int, tuple] = {}
    for k, lsn, op, cents in set(rows):
        cur = ref.get(k)
        cand = (lsn, op, cents)
        if cur is None or cand > cur:
            ref[k] = cand
    exp = {k: (v[0], v[2]) for k, v in ref.items() if v[1] != "D"}
    assert got == exp


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    hashes=st.lists(
        st.tuples(*[st.integers(0, 65535)] * 4), min_size=2, max_size=24
    ),
)
def test_phash_band_join_complete_for_low_hamming(spark, hashes):
    """Pigeonhole completeness for m13's widened 64-bit hash (four
    16-bit band columns): every pair within hamming ≤ 3 MUST surface
    from the 4-band equi-join (≤3 differing bits cannot touch all 4
    bands), and nothing outside the threshold survives the filter."""
    from pyspark.sql import functions as F

    ph = spark.createDataFrame(
        [(i, *h) for i, h in enumerate(hashes)],
        "doc_id long, b0 long, b1 long, b2 long, b3 long",
    )
    bands = ph.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (b, v)"),
    )
    a = bands.select(
        F.col("doc_id").alias("i"),
        *[F.col(f"b{k}").alias(f"pa{k}") for k in range(4)], "b", "v")
    bb = bands.select(
        F.col("doc_id").alias("j"),
        *[F.col(f"b{k}").alias(f"pb{k}") for k in range(4)], "b", "v")
    ham = F.expr(
        "bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)"
        " + bit_count(pa2 ^ pb2) + bit_count(pa3 ^ pb3)"
    )
    got = {
        (r["i"], r["j"])
        for r in a.join(bb, ["b", "v"]).where("i < j")
        .select("i", "j", ham.alias("h"))
        .where("h <= 3").distinct().collect()
    }

    def full(h):
        return h[0] | (h[1] << 16) | (h[2] << 32) | (h[3] << 48)

    exp = {
        (i, j)
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if bin(full(hashes[i]) ^ full(hashes[j])).count("1") <= 3
    }
    assert got == exp


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    train=st.lists(st.text(alphabet="abc ", min_size=1, max_size=20),
                   min_size=1, max_size=6),
    evald=st.lists(st.text(alphabet="abc ", min_size=1, max_size=20),
                   min_size=1, max_size=4),
)
def test_heldout_nll_matches_python_reference(spark, train, evald):
    """bigram_nll_heldout agrees with a literal python reference on
    arbitrary corpora, including eval bigrams/words never seen in
    train (the smoothing path)."""
    import math

    from research_data_pipeline_spark.operators.search import (
        SCALE,
        bigram_nll_heldout,
    )

    def toks(s):
        return s.split(" ")

    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(evald)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_unseen"], r["nll_e6"])
        for r in bigram_nll_heldout(tr, ev).collect()
    }
    c2: dict[tuple, int] = {}
    vocab = set()
    for t in train:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len(vocab)
    exp = {}
    for i, t in enumerate(evald):
        ws = toks(t)
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            continue
        nll = 0
        unseen = 0
        for a, b in bgs:
            cc2 = c2.get((a, b), 0)
            cc1 = c1.get(a, 0)
            if (a, b) not in c2:
                unseen += 1
            nll += math.floor(math.log((cc1 + V) / (cc2 + 1.0)) * SCALE)
        exp[100 + i] = (len(bgs), unseen, nll)
    assert got == exp


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    spans=st.lists(
        st.tuples(st.integers(1, 40), st.integers(0, 10)).map(
            lambda t: (t[0], t[0] + t[1])
        ),
        min_size=0, max_size=10,
    ),
    n_tokens=st.integers(50, 60),
)
def test_span_weight_interval_union(spark, spans, n_tokens):
    """d70's island fold must compute the exact interval-UNION length
    for ANY span set (overlapping, nested, adjacent) — compare against
    a literal set-of-positions reference, and weights stay in
    [0, 1e6]."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, s, e) for s, e in spans]
    df = spark.createDataFrame(
        rows, "doc_id long, span_start long, span_end long"
    ) if rows else spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long"
    )
    wdoc = Window.partitionBy("doc_id").orderBy("span_start")
    s2 = df.select(
        "doc_id", "span_start", "span_end",
        F.max("span_end").over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("prev_max"),
    )
    isl = s2.select(
        "doc_id", "span_start", "span_end",
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("span_start") > F.col("prev_max")), 1
            ).otherwise(0)
        ).over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    got = (
        isl.groupBy("doc_id", "island")
        .agg(F.min("span_start").alias("mn"), F.max("span_end").alias("mx"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("mx") - F.col("mn") + 1).alias("dup"))
        .collect()
    )
    want = len({p for s, e in spans for p in range(s, e + 1)})
    dup = got[0]["dup"] if got else 0
    assert dup == want
    assert 0 <= 1_000_000 - dup * 1_000_000 // n_tokens <= 1_000_000 or want > n_tokens


def test_cusum_fold_matches_python_reference(spark):
    """s22's JVM aggregate fold must walk Page's recursion exactly —
    pin it against a literal python loop on a crafted day series with a
    mid-series level shift and negative slack."""
    from pyspark.sql import functions as F

    xs = [100, 90, 110, 95, 300, 320, 310, 50, 400]
    mu = sum(xs) // len(xs)
    k = mu // 20
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)],
        "event_type string, day long, x long",
    )
    per = df.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("ds"),
        F.expr("CAST(sum(x) div count(*) AS BIGINT)").alias("mu"),
    )
    folded = per.select(
        F.expr(
            "aggregate(ds, CAST(array() AS array<struct<day:bigint,"
            "x:bigint,s:bigint>>), (acc, e) -> concat(acc, array(struct("
            "e.day AS day, e.x AS x, GREATEST(CAST(0 AS BIGINT),"
            " coalesce(get(acc, size(acc) - 1).s, CAST(0 AS BIGINT))"
            " + e.x - mu - mu div 20) AS s))))"
        ).alias("walk")
    ).collect()[0]["walk"]
    s = 0
    for i, x in enumerate(xs):
        s = max(0, s + x - mu - k)
        assert folded[i]["s"] == s, (i, folded[i]["s"], s)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=8, max_size=14),
        min_size=2, max_size=8,
    ),
)
def test_decontamination_matches_bruteforce(spark, docs):
    """d69's hashed-gram join must match a literal python set
    intersection of 8-gram sets on arbitrary tiny corpora (docs are
    token lists; split train/val by parity to force both directions)."""
    import hashlib

    from pyspark.sql import functions as F

    N = 8
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def grams(toks):
        return {
            " ".join(toks[i:i + N]) for i in range(len(toks) - N + 1)
        }

    train_g = set()
    for i, toks in enumerate(docs):
        if i % 2 == 0 and len(toks) >= N:
            train_g |= grams(toks)

    # the registered query's gram-hash pipeline, split by parity here
    occ = df.where(F.size(F.split("text", " ")) >= N).select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(1, size(split(text, ' ')) - {N - 1}),"
            " i -> CAST(conv(substring(md5("
            f"array_join(slice(split(text, ' '), i, {N}), ' ')"
            "), 1, 15), 16, 10) AS BIGINT))"
        )).alias("gh"),
    ).distinct()
    tr = occ.where(F.col("doc_id") % 2 == 0).select("gh").distinct()
    va = occ.where(F.col("doc_id") % 2 == 1)
    got = {
        r["doc_id"]: r["ns"]
        for r in va.join(tr.withColumn("_h", F.lit(1)), "gh", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("_h", F.lit(0))).alias("ns"))
        .collect()
    }
    for i, toks in enumerate(docs):
        if i % 2 == 1 and len(toks) >= N:
            want = len(grams(toks) & train_g)
            assert got.get(i, 0) == want, (i, got.get(i), want)


def test_keyframe_extraction_matches_python_reference(spark):
    """m16's detector+extractor against a literal python walk on a
    crafted video: frame sums with one large jump and one repeat —
    exactly one cut keyframe plus the opening frame, with the right
    bytes extracted."""
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.multimodal import ops

    # 4 frames of 4 bytes: f0=low, f1=low (repeat -> no cut),
    # f2=high (cut), f3=high (no cut)
    payload = bytes([1, 1, 1, 1] * 2 + [200, 200, 200, 200] * 2)
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload), 4)],
        "doc_id long, kind string, payload binary, n_frames int",
    )
    fs = ops.frame_sums(media)
    from pyspark.sql import Window as W
    d = fs.select(
        "doc_id", "frame_idx", "frame_len", "frame_sum",
        F.lag("frame_sum").over(
            W.partitionBy("doc_id").orderBy("frame_idx")
        ).alias("prev"),
    )
    cut_ppm = 30_000
    is_cut = F.col("prev").isNotNull() & (
        F.expr("CAST(abs(frame_sum - prev) * 1000000 div (255 * frame_len)"
               " AS BIGINT)") >= cut_ppm
    )
    keys = d.where((F.col("frame_idx") == 0) | is_cut).select(
        "doc_id", "frame_idx"
    )
    got = sorted(
        (r["frame_idx"], r["offset"], r["first_byte"])
        for r in ops.extract_frames(media, keys).collect()
    )
    # python reference
    L = len(payload) // 4
    sums = [sum(payload[i * L:(i + 1) * L]) for i in range(4)]
    want_idx = [0] + [
        i for i in range(1, 4)
        if abs(sums[i] - sums[i - 1]) * 1_000_000 // (255 * L) >= cut_ppm
    ]
    want = sorted((i, i * L, payload[i * L]) for i in want_idx)
    assert got == want
    assert [i for i, _, _ in got] == [0, 2]  # opening + the one cut


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(1, 9),
    edge_pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=14
    ),
)
def test_scc_distributed_matches_driver_tarjan(spark, n, edge_pairs):
    """FW-BW coloring (distributed) vs iterative Tarjan (driver) on
    random DIRECTED graphs — plus a pure-python reference: label(v) =
    min{u : v ->* u and u ->* v}."""
    from research_data_pipeline_spark.graph.build import (
        strongly_connected_components,
    )

    edge_pairs = sorted({(a, b) for a, b in edge_pairs
                         if a < n and b < n and a != b})
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = (
        spark.createDataFrame(edge_pairs, "src bigint, dst bigint")
        if edge_pairs
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    # python reference via transitive closure
    reach = {(a, b) for a, b in edge_pairs}
    changed = True
    while changed:
        changed = False
        for (a, b) in list(reach):
            for (c, d) in list(reach):
                if b == c and (a, d) not in reach:
                    reach.add((a, d))
                    changed = True
    want = {
        v: min([v] + [u for u in range(n)
                      if (v, u) in reach and (u, v) in reach])
        for v in range(n)
    }
    got = {
        r["node"]: r["label"]
        for r in strongly_connected_components(
            vertices, edges, id_col="node"
        ).collect()
    }
    got_dist = {
        r["node"]: r["label"]
        for r in strongly_connected_components(
            vertices, edges, id_col="node", driver_max_edges=0
        ).collect()
    }
    assert got == want
    assert got_dist == want


def test_scc_directed_cycle_vs_chain(spark):
    """A 12-cycle is ONE SCC; the same edges as a chain are 12
    singletons — direction is load-bearing (this is exactly what
    undirected CC gets wrong). Also pins the multi-round outer loop:
    a cycle feeding a chain resolves tail nodes in later FW-BW rounds."""
    from research_data_pipeline_spark.graph.build import (
        strongly_connected_components,
    )

    n = 12
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    cycle = [(i, (i + 1) % n) for i in range(n)]
    chain = [(i, i + 1) for i in range(n - 1)]
    for edge_list, want in [
        (cycle, {i: 0 for i in range(n)}),
        (chain, {i: i for i in range(n)}),
    ]:
        edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
        for dme in (1_000_000, 0):
            got = {
                r["node"]: r["label"]
                for r in strongly_connected_components(
                    vertices, edges, id_col="node", driver_max_edges=dme
                ).collect()
            }
            assert got == want, (edge_list is cycle, dme)
    # cycle {3,4,5} + tail 0<-1<-2... : tail hangs off, plus a second
    # cycle {0,1} reachable FROM the first — forces >1 outer round on
    # the distributed path (SCC-DAG depth 2)
    edges2 = spark.createDataFrame(
        [(3, 4), (4, 5), (5, 3), (5, 0), (0, 1), (1, 0), (1, 2)],
        "src bigint, dst bigint",
    )
    v2 = spark.createDataFrame([(i,) for i in range(6)], "node bigint")
    stats: dict = {}
    got2 = {
        r["node"]: r["label"]
        for r in strongly_connected_components(
            v2, edges2, id_col="node", driver_max_edges=0, stats=stats
        ).collect()
    }
    assert got2 == {3: 3, 4: 3, 5: 3, 0: 0, 1: 0, 2: 2}
    assert stats["algorithm"] == "fwbw_coloring"
    assert stats["outer_rounds"] >= 2


def test_scc_fixpoint_is_loud_not_truncated(spark):
    """Phase-1 coloring must reach fixpoint or RAISE: a directed cycle
    longer than max_iter would otherwise be silently split into wrong
    labels (the min-id needs cycle-length rounds to reach every node).
    A 25-cycle with max_iter=20 raises; with the default cap it resolves
    to the single correct SCC on the distributed path."""
    import pytest

    from research_data_pipeline_spark.graph.build import (
        strongly_connected_components,
    )

    n = 25
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        strongly_connected_components(
            vertices, edges, id_col="node", driver_max_edges=0, max_iter=20
        ).collect()
    got = {
        r["node"]: r["label"]
        for r in strongly_connected_components(
            vertices, edges, id_col="node", driver_max_edges=0
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_scc_dangling_edge_endpoints_share_contract(spark):
    """Edges touching ids absent from the vertex table are dropped BEFORE
    either path runs (r10 advisor): a cycle through a non-vertex id must
    not smuggle a non-vertex label into the output, and the driver and
    distributed paths must agree. Vertex 1 cycles only through the
    non-vertex id 9 (1->9->1), so it labels itself; 2<->3 is a real SCC."""
    from research_data_pipeline_spark.graph.build import (
        strongly_connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(5)], "node bigint")
    edges = spark.createDataFrame(
        [(1, 9), (9, 1), (2, 3), (3, 2), (9, 2)], "src bigint, dst bigint"
    )
    want = {0: 0, 1: 1, 2: 2, 3: 2, 4: 4}
    for dme in (1_000_000, 0):  # driver-Tarjan path, then distributed
        got = {
            r["node"]: r["label"]
            for r in strongly_connected_components(
                vertices, edges, id_col="node", driver_max_edges=dme
            ).collect()
        }
        assert got == want, dme
        assert set(got.values()) <= set(range(5)), dme


# ---------------------------------------------------------------------------
# Round-12: int-id verification in the open-vocabulary LSH path


def _open_vocab_corpus(n_groups=350):
    # vocab > 512 distinct tokens (the r12 max_vocab JIT budget) forces
    # the open-vocabulary path — this corpus's ~4,900 far exceed it (the
    # dictionary bitmask table bails), with exact dups and 27/28-token
    # near-dups so the pair stream is non-trivial at threshold 0.9; the
    # stride-14 overlap gives neighbor groups jaccard ~0.33 so band
    # buckets genuinely chain across groups (the escalation test needs
    # over-bar buckets whose members differ on the extended key)
    rows = []
    for d in range(n_groups):
        base = [f"tok{d * 14 + k}" for k in range(28)]
        rows.append((3 * d, " ".join(base)))
        rows.append((3 * d + 1, " ".join(base[:-1])))  # jaccard 27/28
        if d % 4 == 0:
            rows.append((3 * d + 2, " ".join(base)))  # exact dup
    return rows


def test_minhash_int_id_verification_is_pair_for_pair_identical(spark):
    """The injectivity-guarded xxhash64 token encode must not change ONE
    emitted pair or jaccard double vs the string path (output invariance
    of SCALE.md's round-11 int-id lever), and the guard must report the
    int path was actually taken on an open-vocabulary corpus."""
    from research_data_pipeline_spark.operators import decisions
    from research_data_pipeline_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )

    rows = _open_vocab_corpus()
    vocab = {t for _, txt in rows for t in txt.split()}
    assert len(vocab) > 512  # over the max_vocab JIT budget: open-vocab path
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got_int = {
        (r["i"], r["j"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9).collect()
    }
    assert decisions.LAST["verify_token_encoding"]["path"] == "int_ids"
    got_str = {
        (r["i"], r["j"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.9, verify_encoding="strings"
        ).collect()
    }
    assert decisions.LAST["verify_token_encoding"]["path"] == "strings"
    assert got_int == got_str  # pair-for-pair, double-for-double
    # and the reported jaccards are the exact set jaccards
    sets = {i: frozenset(t.split()) for i, t in rows}
    for (a, b), j in got_int.items():
        exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert abs(j - exact) < 1e-12
        assert j >= 0.9
    # exact dups always collide (identical signature -> every band)
    assert all(
        (3 * d, 3 * d + 2) in got_int for d in range(0, 350, 4)
    )


@pytest.mark.parametrize("corpus", ["open_vocab", "dict_vocab"])
def test_band_escalation_rule_matches_oracle_and_has_teeth(
    spark, tmp_path, corpus
):
    """Engine and DuckDB oracle must apply the SAME mega-bucket
    escalation rule (band match AND (pop <= bar OR extended-key match)),
    pinned at a tiny bar where buckets actually exceed it — on both
    verification paths (dictionary bitmask and open-vocab int-id). And
    the rule must have teeth: strictly fewer pairs than the plain band
    join on a corpus with over-bar buckets, while staying a subset."""
    import duckdb

    from research_data_pipeline_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )
    from research_data_pipeline_spark.queries.docs import (
        _DTOKS,
        _band_cand_ctes,
        _mh_cols,
    )

    if corpus == "open_vocab":
        rows = _open_vocab_corpus()
    else:
        # 6-word vocab -> bitmask path; groups of sharing docs so band
        # buckets exceed a bar of 2
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        rows = []
        for d in range(40):
            base = [words[(d + k) % 6] for k in range(5)]
            rows.append((3 * d, " ".join(base)))
            rows.append((3 * d + 1, " ".join(base[:-1])))
            rows.append((3 * d + 2, " ".join(base)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # threshold 0.0: every verified candidate is emitted, so the compare
    # pins the full candidate set (the thing escalation changes), not
    # just the >=0.9 survivors
    bar = 2
    got = {
        (r["i"], r["j"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.0, escalate_pop=bar
        ).collect()
    }
    plain = {
        (r["i"], r["j"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.0, escalate_pop=10**9
        ).collect()
    }
    assert got <= plain
    d = str(tmp_path / f"docs_{corpus}")
    df.write.mode("overwrite").parquet(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    jac = (
        "len(list_intersect(ta.tokens, tb.tokens)) * 1.0 / "
        "(len(ta.tokens) + len(tb.tokens) "
        "- len(list_intersect(ta.tokens, tb.tokens)))"
    )
    exp = {
        (i, j)
        for i, j in con.execute(f"""
            WITH toks AS (SELECT doc_id, {_DTOKS} AS tokens FROM documents),
            tok AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
            mh AS (SELECT doc_id, {_mh_cols} FROM tok GROUP BY doc_id),
            {_band_cand_ctes(bar)}
            SELECT c.i, c.j FROM cand c
            JOIN toks ta ON ta.doc_id = c.i
            JOIN toks tb ON tb.doc_id = c.j
            WHERE {jac} >= 0.0
        """).fetchall()
    }
    con.close()
    assert got == exp
    # teeth: these corpora have over-bar buckets with sub-extended-key
    # near-dup pairs, so escalation must actually drop some
    assert len(got) < len(plain), (len(got), len(plain))


# ---------------------------------------------------------------------------
# Round-13: the loud money helpers are byte-identical to the inline
# idioms they replace — property over arbitrary finite doubles. The r14
# batch swaps nine more sites onto these helpers, so the equivalence
# claim deserves more than hand-picked boundary values.


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                allow_nan=False, allow_infinity=False, width=64,
                min_value=-9.9e7, max_value=9.9e7,
            ),
        ),
        min_size=1, max_size=40,
    )
)
def test_money_helpers_match_inline_idioms_on_finite_doubles(spark, vals):
    from pyspark.sql import functions as F

    from research_data_pipeline_spark.functions.core import (
        money_cents_decimal,
        money_dec,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.select(
        money_cents_decimal("v").alias("c4"),
        money_cents_decimal("v", dec="decimal(12,2)").alias("c2"),
        money_dec("v").alias("d4"),
    ).collect()
    ref = df.select(
        F.expr("CAST(CAST(v AS DECIMAL(12,4)) * 100 AS BIGINT)").alias("c4"),
        F.expr("CAST(CAST(v AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("c2"),
        F.expr("CAST(v AS DECIMAL(12,4))").alias("d4"),
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
