"""Registry wiring query callables to their DuckDB oracle SQL.

``queries()``/``oracle_sql()`` in ``__spark_entry__.py`` are thin views over
these dicts.  A query registered with ``oracle=None`` is deliberately
oracle-less (approximate or hash-seeded semantics that no other engine can
reproduce bit-for-bit); the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
