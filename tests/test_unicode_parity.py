"""Unicode parity: the cross-engine primitives every text operator
builds on (char-based length/substr, UTF-8-byte md5, whitespace split)
must agree between Spark and DuckDB on multibyte input — accents, CJK,
astral-plane emoji. A byte-based substring in either engine would break
d38's char splitting and every md5 fingerprint silently."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

ROWS = [
    (1, "héllo wörld héllo"),
    (2, "日本語 テスト 日本語"),
    (3, "emoji 🙂 test 🙂 x"),
    (4, "mixé 混合 mix"),
]


def test_unicode_primitives_agree_with_duckdb(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_chars, r.sub, r.h, r.n_tok)
        for r in df.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.substring("text", 2, 3).alias("sub"),
            F.md5("text").alias("h"),
            F.size(F.split("text", " ")).alias("n_tok"),
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, text in ROWS:
        want = con.execute(
            "SELECT length(?), substr(?, 2, 3), md5(?),"
            " len(string_split(?, ' '))",
            [text] * 4,
        ).fetchone()
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_bpe_char_split_is_codepoint_based(spark):
    # d38/d32b split words into "characters" via substr(t, i, 1): on CJK
    # this must yield one CODEPOINT per element in both engines
    df = spark.createDataFrame([("日本語",)], "t string")
    chars = df.select(
        F.transform(
            F.sequence(F.lit(1), F.length("t")),
            lambda i: F.col("t").substr(i, F.lit(1)),
        ).alias("s")
    ).first()["s"]
    assert chars == ["日", "本", "語"]
    want = duckdb.connect().execute(
        "SELECT list_transform(generate_series(1, length(t)),"
        " i -> substring(t, i, 1)) FROM (SELECT '日本語' AS t)"
    ).fetchone()[0]
    assert chars == want


def test_integer_split_division_parity_on_negatives(spark):
    # e41 splits purchase cents as `cents div n + CASE last THEN cents % n`
    # (Spark) vs `cents // n + ...` (DuckDB). Both engines TRUNCATE BIGINT
    # division toward zero (DuckDB floors only on DOUBLE), and both pair
    # it with a truncating %, so n·(c div n) + c % n == c holds on BOTH
    # sides for refund/chargeback-shaped NEGATIVE cents — pin it.
    cases = [(-7, 2), (-7, 3), (7, 3), (-100, 7), (-1, 4), (0, 3)]
    df = spark.createDataFrame(cases, "c long, n long")
    got = {
        (r["c"], r["n"]): (r["q"], r["m"])
        for r in df.selectExpr("c", "n", "c div n AS q", "c % n AS m")
        .collect()
    }
    con = duckdb.connect()
    for c, n in cases:
        want = con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT),"
            " CAST(? AS BIGINT) % CAST(? AS BIGINT)", [c, n, c, n]
        ).fetchone()
        assert got[(c, n)] == want, ((c, n), got[(c, n)], want)
        q, m = got[(c, n)]
        assert n * q + m == c  # the exact-split invariant e41 relies on
