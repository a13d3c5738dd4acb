"""Core scalar functions needing custom code (SURVEY §2.7).

Only ``unaccent`` needs Python (a Pandas UDF — Arrow-batched, not
row-at-a-time); everything else in the reference's cleaning pipeline maps
to JVM builtins and lives inline in the transforms.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the reference uses unidecode (raw_to_tables.py:104-105)
    from unidecode import unidecode as _unidecode

    _HAVE_UNIDECODE = True
except ImportError:  # stdlib fallback; see divergence note below
    _HAVE_UNIDECODE = False


def _ascii_fold(s: str) -> str:
    if _HAVE_UNIDECODE:
        return _unidecode(s)
    # NFKD + drop combining marks. Divergence from unidecode: characters
    # with no compatibility decomposition (ø, ß, đ …) are dropped rather
    # than transliterated. The downstream [^a-zA-Z0-9] strip
    # (raw_to_tables.py:108-110) removes them in both cases, so author-id
    # construction agrees except for names consisting solely of such
    # characters.
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


@F.pandas_udf(T.StringType())
def unaccent(s: pd.Series) -> pd.Series:
    """Unicode→ASCII transliteration (F1; raw_to_tables.py:104-105)."""
    return s.map(lambda x: _ascii_fold(x) if isinstance(x, str) else x)


def strip_non_alnum(c: Column) -> Column:
    """``str.replace('[^a-zA-Z0-9]','').strip()`` (raw_to_tables.py:108-110)."""
    return F.trim(F.regexp_replace(c, "[^a-zA-Z0-9]", ""))


def strip_punct(c: Column) -> Column:
    """``str.replace('[,.;-]','')`` (raw_to_tables.py:106)."""
    return F.regexp_replace(c, "[,.;-]", "")


def author_id_expr(last: Column, first: Column) -> Column:
    """author_id = cleaned last name + first initial
    (raw_to_tables.py:113).

    pandas ``str[0]`` of an empty string yields NaN, so an empty cleaned
    first name must produce NULL (not just the last name) — the NaN later
    drives row removal (raw_to_tables.py:178-181).
    """
    return F.when(
        (F.length(first) > 0) & last.isNotNull(),
        F.concat(last, F.substring(first, 1, 1)),
    )


def year_from_date_string(c: Column) -> Column:
    """Split-on-'-' year extraction (F6/F9; raw_to_tables.py:152) —
    string-split parity rather than date parsing."""
    return F.split(c, "-").getItem(0).cast("int")


def pct_string(c: Column) -> Column:
    """Postgres ``TO_CHAR(x,'fm99%')`` parity (F11; README.md:198)."""
    return F.concat(c.cast("int").cast("string"), F.lit("%"))


def money_cents(c: Column | str) -> Column:
    """Exact cents from a double money column, LOUD on NaN.

    The repo-wide idiom ``CAST(FLOOR(v*100 + 0.5) AS BIGINT)`` is exact
    for every representable money value — but Spark's ``floor(double)``
    maps NaN to 0 SILENTLY even under ANSI mode (pinned by
    tests/test_nan_inputs.py), so one malformed upstream event corrupts
    money totals without a trace, while the DuckDB oracle refuses the
    NaN→INT64 conversion loudly. This helper restores the loud contract:
    a NaN raises (matching the oracle's behavior class), a NULL passes
    through as NULL, everything else is the exact idiom. The NaN branch
    is never taken on contract-conforming data, so it costs one codegen
    comparison per row and changes no output anywhere NaN is absent.

    Scheduled to replace the ~18 inline Spark-side cents/e4 call sites
    across r12-r13 rotation budgets (SURVEY round-11 NaN triage); new
    code should use it from day one.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.isnan(col),
        F.expr(
            "raise_error('NaN money value: quarantine upstream — "
            "silent floor(NaN)=0 would corrupt exact-cents totals')"
        ).cast("bigint"),
    ).otherwise(F.floor(col * 100 + F.lit(0.5)).cast("bigint"))


def money_cents_decimal(c: Column | str, dec: str = "decimal(12,4)") -> Column:
    """Exact cents via the DECIMAL(12,4) idiom, LOUD on NaN.

    The sibling idiom ``CAST(CAST(v AS DECIMAL(12,4)) * 100 AS BIGINT)``
    (HALF_UP round at 4 decimals, then truncate at cents) has a
    DIFFERENT silent NaN failure than the floor shape: Spark's
    double→DECIMAL cast maps NaN to NULL, so a NaN money value silently
    vanishes from sums instead of corrupting them — still a trace-less
    data loss the DuckDB oracle refuses loudly. Same remedy, same
    never-taken codegen branch; the non-NaN arithmetic is byte-identical
    to the inline idiom (rounding semantics preserved — this is NOT
    floor+0.5; parity on cents-boundary values pinned by
    tests/test_nan_inputs.py). ``dec`` pins the site's exact decimal
    shape — e42's stream uses DECIMAL(12,2) and the swap must stay
    byte-identical to its inline idiom on clean corpora."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.isnan(col),
        F.expr(
            "raise_error('NaN money value: quarantine upstream — "
            "silent DECIMAL(NaN)=NULL would drop rows from exact-cents "
            "totals')"
        ).cast("bigint"),
    ).otherwise((col.cast(dec) * F.lit(100)).cast("bigint"))


def money_dec(c: Column | str, dec: str = "decimal(12,4)") -> Column:
    """Loud double→DECIMAL money cast — the summable-value sibling of
    :func:`money_cents_decimal` for sites that keep the DECIMAL itself
    (``SUM(CAST(v AS DECIMAL(12,4)))`` revenue shapes, q01/q15-class).

    Spark's double→DECIMAL cast maps NaN to NULL even under ANSI mode,
    so one poisoned price silently VANISHES from revenue totals — a
    trace-less row-loss at 100 TB — while the DuckDB oracle refuses
    NaN→DECIMAL loudly (measured: `scripts/probe_corpus.py nanmoney`).
    This helper matches the oracle's behavior class: NaN raises, NULL
    passes through, everything else is the plain cast. The NaN branch is
    never taken on contract-conforming data (one codegen comparison per
    row; sum unchanged anywhere NaN is absent — parity pinned by
    tests/test_nan_inputs.py both ways)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.isnan(col),
        F.expr(
            "raise_error('NaN money value: quarantine upstream — "
            "silent DECIMAL(NaN)=NULL would drop rows from money totals')"
        ).cast(dec),
    ).otherwise(col.cast(dec))
