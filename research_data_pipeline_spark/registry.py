"""Query registry: every implemented operator exposes a (Spark fn, oracle SQL)
pair consumed by ``__spark_entry__`` and by the parity tests.

Oracle SQL is ANSI SQL runnable by DuckDB over the same parquet tables.
Numeric discipline (so Spark and DuckDB hash identically):

- Sums/products of doubles go through ``DECIMAL`` casts (exact,
  order-independent) and are cast back to DOUBLE at the end. A decimal sum
  is associative, so shuffle/partition order cannot perturb the result —
  this is also the right call at 100 TB, where non-deterministic float
  totals break retries and audits.
- Averages divide the exact decimal sum (as double) by the exact count —
  one IEEE division, identical in both engines.
- Timestamps in outputs are emitted as epoch microseconds (BIGINT).
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


class Registry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def add(self, name: str, oracle: str | None, *tags: str):
        def deco(fn: QueryFn) -> QueryFn:
            if name in self._specs:
                raise ValueError(f"duplicate query name {name}")
            self._specs[name] = QuerySpec(name, fn, oracle, tags)
            return fn

        return deco

    def specs(self) -> dict[str, QuerySpec]:
        return dict(self._specs)

    def queries(self) -> dict[str, QueryFn]:
        return {n: s.fn for n, s in self._specs.items()}

    def oracle_sql(self) -> dict[str, str]:
        return {n: s.oracle for n, s in self._specs.items() if s.oracle is not None}


REGISTRY = Registry()


def all_specs() -> dict[str, QuerySpec]:
    # import side-effect registration
    from .queries import docs, events, graph_analytics, media, relational, sampling  # noqa: F401

    return REGISTRY.specs()
