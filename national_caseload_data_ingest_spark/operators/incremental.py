"""Incremental aggregate maintenance: merge a persisted aggregate state
with a delta batch instead of rescanning the base table — the
materialized-view-maintenance shape that makes daily 100 TB loads cheap.

The algebra: every measure kept in the state is a COMMUTATIVE MONOID
(count, decimal sum, min, max), so ``merge(state, agg(delta))`` is
``groupBy(key).agg(sum(n), sum(sum), min(min), max(max))`` over the
union of the two partial relations, and derived measures (avg) are
recomputed from the merged components.  The money sum is carried as
``decimal(18,2)`` (the repo's exact-money convention, relational.py) so
the two-level summation is EXACTLY equal to a full rescan — which is
precisely what the oracle does: DuckDB recomputes the aggregate over
the whole table in one pass, and the hash must match the merged path
bit-for-bit.  A float sum could not promise that (two-level vs
one-level grouping reorders the additions); the decimal type is what
makes incremental maintenance auditable.

At 100 TB: the state relation is key-sized, the delta scan is
partition-pruned to the new partition (here the ``o_orderdate`` split
predicate — pushdown-visible in the scan), and the merge shuffle moves
only per-key partials.

The reference recomputes everything from scratch per load
(/root/reference/ncd/load_all.py drops and reloads); incremental
maintenance is the scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# Loads before the cutoff are "already aggregated" state; the rest is
# the incoming delta batch.
CUTOFF = "2000-01-01"


def partial_agg(orders: DataFrame) -> DataFrame:
    """Per-priority monoid state: (key, n, total, min_date, max_date)."""
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states and derive the final measures."""
    out = states[0]
    for s in states[1:]:
        out = out.unionAll(s)
    return out.groupBy("o_orderpriority").agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("min_date").alias("min_date"),
        F.max("max_date").alias("max_date"),
    ).select(
        "o_orderpriority",
        "n",
        # exact decimal internally; the OUTPUT casts to double (one
        # deterministic conversion) so both engines print identically
        F.col("total").cast("double").alias("total"),
        (F.col("total").cast("double") / F.col("n")).alias("avg_price"),
        "min_date",
        "max_date",
    )


@query(
    "incremental_priority_stats",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           MIN(o_orderdate) AS min_date,
           MAX(o_orderdate) AS max_date
    FROM orders
    GROUP BY o_orderpriority
    -- the oracle is a FULL single-pass recompute ({CUTOFF} split unseen):
    -- the merged incremental path must equal it bit-for-bit
    """,
)
def incremental_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain per-priority order statistics incrementally: aggregate
    the pre-{CUTOFF} partition into a state, aggregate the post-cutoff
    delta separately, and MERGE the partials — never rescanning the
    base.  The oracle recomputes from scratch; exact-decimal sums make
    the two paths bit-identical.  See module docstring."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    cutoff = F.lit(CUTOFF).cast("timestamp")
    state = partial_agg(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial_agg(o.filter(F.col("o_orderdate") >= cutoff))
    return merge_states(state, delta)
