"""TPC-H query shapes 7-22 (adapted to the synthetic schema, which has no
``partsupp`` table and trims some columns).

These complete the relational coverage contract of SURVEY.md §2.2 — the
arbitrary-Presto-SQL surface the reference reaches through
``Athena.execute_query`` (``/root/reference/ncd/athena.py:57-79``).  Each
query exercises an operator archetype the rest of the catalog doesn't:

- q7: self-aliased dim (nation twice) + disjunctive pair predicate
- q8: conditional market-share ratio over a multi-region star join
- q9: LIKE-filtered part join with computed profit expression
- q13: outer join with ON-clause filter + two-level aggregation
- q14: conditional aggregate ratio (promo share)
- q15: aggregate view joined against its own MAX (scalar subquery)
- q17: correlated per-group average threshold (decorrelated to a join)
- q19: OR-of-ANDs predicate across both join sides
- q22: scalar subquery threshold + anti join + aggregate

Scale notes (100 TB): every dim here (nation, region, supplier, part at
these SFs, per-part averages, per-supplier revenue) broadcasts; the only
shuffles are fact-fact joins on their natural keys and the final small
aggregations.  Money aggregates go through the exact-decimal helpers
(:mod:`national_caseload_data_ingest_spark.functions`) so results are
deterministic cross-engine — see that module's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.functions import dec, dsum
from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables


def _ts(s: str) -> F.Column:
    return F.to_timestamp(F.lit(s))


def _one_minus_discount() -> F.Column:
    return (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,2)")


def _revenue() -> F.Column:
    return dec("l_extendedprice") * _one_minus_discount()


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* CAST(1.0 - l_discount AS DECIMAL(8,2))"
)


@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation joined twice under different roles.

    Both nation copies broadcast; the disjunctive pair predicate runs after
    both dim joins so Catalyst can still push the shipdate range to the
    scan.  Shuffles: lineitem⋈orders and orders⋈customer only.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                         THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY year(o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share of one supplier nation per year.

    Numerator and denominator are both exact-decimal sums computed in ONE
    aggregation pass (a conditional sum, not a self-join); the ratio is a
    single double division.  part/supplier/nation/region broadcast.
    """
    t = load_tables(
        spark, sf_dir,
        "lineitem", "part", "supplier", "nation", "orders", "customer", "region",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    vol = _revenue()
    share_num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("c_nk"), "inner")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(share_num).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1.0 - l_discount AS DECIMAL(8,2))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.1 AS DECIMAL(8,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts whose
    name matches a LIKE pattern.

    Without ``partsupp``, supply cost is modeled as 10% of retail price per
    unit — the expression shape (product minus product, aggregated exactly)
    is what Q9 exercises.  part (LIKE-filtered), supplier, nation broadcast.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    amount = _revenue() - dec("p_retailprice") * dec("l_quantity") * F.lit(
        0.1
    ).cast("decimal(8,2)")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%gear%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause residual filter, then
    a distribution-of-counts double aggregation.

    The filter must live in the join condition (not a WHERE) so customers
    whose only orders are urgent still appear with count 0 — the left-join
    semantics Q13 exists to test.  Second aggregation is over ≤|customer|
    rows — trivially small at any SF.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE))
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global conditional-aggregate ratio (promo share of
    one month's revenue).  One broadcast join + one partial-agg reduction
    to a single row; the month filter is pushed to the lineitem scan."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    vol = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-09-01"))
            & (F.col("l_shipdate") < _ts("1997-10-01"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view joined against its own MAX.

    The revenue view is computed once and reused for both the scalar MAX
    and the equality filter (same exact-decimal→double value on both
    sides, so the double equality is deterministic).  The one-row MAX and
    the supplier dim both broadcast.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(t["supplier"]),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold, decorrelated
    into a grouped aggregate joined back to the fact rows.

    The per-part averages are computed only over lineitems of the filtered
    brand's parts (the join restricts parts, not lineitems, so the average
    matches the correlated-subquery semantics exactly).  Quantities are
    small integers, so the double AVG is order-independent and the `<`
    threshold compare is deterministic cross-engine.  The averages relation
    is |parts-of-brand| rows — broadcasts at any SF.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    brand_parts = (
        t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    )
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    limits = li.groupBy(F.col("p_partkey").alias("lim_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(limits), F.col("p_partkey") == F.col("lim_pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate straddling both join sides.

    Catalyst extracts the common-to-all-branches conjuncts per side (brand
    IN (..), size ≤ 35 → part scan; quantity ∈ [1,30] → lineitem scan) so
    both scans still prune, and evaluates the residual disjunction after
    the broadcast join.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")

    def branch(brand: str, max_size: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & (q >= qlo)
            & (q <= qhi)
        )

    pred = (
        branch("Brand#1", 15, 1, 11)
        | branch("Brand#2", 25, 10, 20)
        | branch("Brand#3", 35, 20, 30)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join.

    (Adapted: every synthetic customer has *some* order, so the EXISTS side
    is restricted to recent urgent orders to keep the anti join
    non-vacuous.)  The positive-balance average is an exact-decimal sum
    over a double count (deterministic), broadcast as a one-row literal
    relation.  The NOT EXISTS decorrelates to a left-anti join on custkey —
    at scale this is the one shuffle (orders filtered and projected to its
    join key first).
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderdate") >= _ts("1999-01-01"))
            )
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
