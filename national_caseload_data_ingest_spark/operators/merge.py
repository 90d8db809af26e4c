"""Multi-clause MERGE (SQL:2003 MERGE INTO / Delta-style CDC apply).

``temporal.upsert_latest`` covers the latest-wins special case; real
change feeds need the full clause algebra in ONE pass:

* ``WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE``
* ``WHEN NOT MATCHED [AND cond] THEN INSERT ...``
* ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE ... | DELETE``
  (the retention-purge clause — rows the feed no longer mentions)

Semantics follow the standard: clauses are evaluated IN ORDER and the
first whose condition holds wins; a target row matched by MORE THAN ONE
source row is an error (SQL:2003 cardinality rule — silently picking
one is how CDC pipelines corrupt), enforced by a per-key count window
on the source whose violation branch raises inside the merge plan
(one source pass, no separate guard job — r14).

Plan shape: ONE full-outer join on the merge keys (presence markers on
both sides, null-safe key equality), then pure column algebra — a
nested CASE resolves each row to an action tag in clause order, a
filter drops deletes, and each output column is a CASE over the tag.
That is the same join-shaped core as Delta Lake's merge; at 100 TB the
join is the only shuffle, it bucket-co-locates like any equi join
(``catalog.write_bucketed``), and partition-pruning the target by the
source's key range (when the feed is narrow) happens before the join
via Catalyst as usual.  The cardinality guard is a source-keyed count
window inside the same plan, not a second pass over data rows.

The reference has no merge surface (its loader overwrites partitions
wholesale — ``/root/reference/ncd/normal_table.py``); this is the
standard warehouse capability a Spark engine must carry.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# clause: (action, condition | None, assignments | None)
#   matched:               ("update", cond, {col: Column}) | ("delete", cond, None)
#   not_matched:           ("insert", cond, {col: Column} | None)
#   not_matched_by_source: ("update", cond, {col: Column}) | ("delete", cond, None)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    matched: list[tuple] = (),
    not_matched: list[tuple] = (),
    not_matched_by_source: list[tuple] = (),
) -> DataFrame:
    """Apply a multi-clause merge and return the post-merge table.

    Assignment/condition Columns reference the two sides as ``__t.col``
    and ``__s.col`` (``F.col("__s.price")`` etc.).  Insert clauses with
    ``None`` assignments insert the source row's same-named columns;
    missing target columns insert NULL.
    """
    # SQL:2003 cardinality rule: at most one source row per key.  The
    # guard rides IN the merge plan (r14): a per-key count window on
    # the source feeds a raise_error branch of the action resolver, so
    # a violation still fails loudly (at execution, the same place
    # Delta's merge detects it) but the source is computed ONCE and
    # there is no separate pre-pass job + driver sync — the old eager
    # one-row aggregate re-ran the whole source lineage per call.
    from pyspark.sql.window import Window as W  # noqa: PLC0415

    t = target.withColumn("__tp", F.lit(1)).alias("__t")
    s = (
        source.withColumn("__sp", F.lit(1))
        .withColumn(
            "__scnt", F.count(F.lit(1)).over(W.partitionBy(*on))
        )
        .alias("__s")
    )
    key_eq = functools.reduce(
        operator.and_,
        [
            F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
            for k in on
        ],
    )
    j = t.join(s, key_eq, "full_outer")

    is_matched = F.col("__t.__tp").isNotNull() & F.col("__s.__sp").isNotNull()
    src_only = F.col("__t.__tp").isNull()
    tgt_only = F.col("__s.__sp").isNull()

    def _true(cond: Column | None) -> Column:
        return F.lit(True) if cond is None else cond

    # resolve each row to an action tag, clause order = priority order
    action = F.lit(None).cast("string")
    cases: list[tuple[Column, str]] = []
    for i, (act, cond, _a) in enumerate(matched):
        cases.append((is_matched & _true(cond), f"m{i}_{act}"))
    cases.append((is_matched, "keep"))
    for i, (act, cond, _a) in enumerate(not_matched):
        if act != "insert":
            raise ValueError("not_matched clauses must be inserts")
        cases.append((src_only & _true(cond), f"i{i}_insert"))
    cases.append((src_only, "ignore_src"))
    for i, (act, cond, _a) in enumerate(not_matched_by_source):
        cases.append((tgt_only & _true(cond), f"n{i}_{act}"))
    # tgt_only fallthrough: keep
    expr = F.when(
        F.col("__s.__sp").isNotNull() & (F.col("__s.__scnt") > 1),
        F.raise_error(
            F.lit(
                "merge_into: a target row is matched by more than one "
                "source row (MERGE cardinality violation)"
            )
        ).cast("string"),
    ).when(cases[0][0], F.lit(cases[0][1]))
    for cond, tag in cases[1:]:
        expr = expr.when(cond, F.lit(tag))
    action = expr.otherwise(F.lit("keep"))
    j = j.withColumn("__action", action)

    # drop deletes and unmatched source rows
    drop_tags = ["ignore_src"] + [
        f"m{i}_delete" for i, (a, _c, _x) in enumerate(matched)
        if a == "delete"
    ] + [
        f"n{i}_delete"
        for i, (a, _c, _x) in enumerate(not_matched_by_source)
        if a == "delete"
    ]
    j = j.filter(~F.col("__action").isin(drop_tags))

    src_cols = set(source.columns)
    out = []
    for c in target.columns:
        col = F.col(f"__t.{c}")
        for i, (act, _cond, assigns) in enumerate(matched):
            if act == "update":
                col = F.when(
                    F.col("__action") == f"m{i}_update",
                    assigns[c] if c in assigns else F.col(f"__t.{c}"),
                ).otherwise(col)
        for i, (_act, _cond, assigns) in enumerate(not_matched):
            if assigns is not None and c in assigns:
                ins = assigns[c]
            elif c in src_cols:
                ins = F.col(f"__s.{c}")
            else:
                ins = F.lit(None)
            col = F.when(
                F.col("__action") == f"i{i}_insert", ins
            ).otherwise(col)
        for i, (act, _cond, assigns) in enumerate(not_matched_by_source):
            if act == "update":
                col = F.when(
                    F.col("__action") == f"n{i}_update",
                    assigns[c] if c in assigns else F.col(f"__t.{c}"),
                ).otherwise(col)
        out.append(col.alias(c))
    return j.select(*out)


@query(
    "merge_apply_changes",
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS k, o_custkey AS cust, 'D' AS op,
               CAST(NULL AS DOUBLE) AS price
        FROM orders WHERE o_orderkey % 9 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U', o_totalprice * 2
        FROM orders WHERE o_orderkey % 9 IN (1, 2)
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'I', o_totalprice
        FROM orders WHERE o_orderkey % 9 = 3
    ),
    joined AS (
        SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
               t.o_totalprice, s.op, s.price
        FROM orders t LEFT JOIN src s ON t.o_orderkey = s.k
    )
    SELECT o_orderkey,
           o_custkey,
           CASE WHEN op = 'U' THEN 'U' ELSE o_orderstatus END AS status,
           CAST(CAST(CASE WHEN op = 'U' THEN price ELSE o_totalprice END
                AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM joined
    WHERE (op IS NULL OR op <> 'D')
      AND NOT (op IS NULL AND o_orderkey % 1000 = 999)
    UNION ALL
    SELECT k, cust, 'I', CAST(CAST(price AS DECIMAL(18,2)) AS DOUBLE)
    FROM src WHERE op = 'I'
    """,
)
def merge_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE clause algebra in one statement over a deterministic
    change feed built from orders: deletes (keys ≡ 0 mod 9), updates
    (≡ 1,2 — doubled price, status 'U'), inserts (new keys +1e8 from
    ≡ 3), plus a NOT MATCHED BY SOURCE retention purge (unmentioned
    target keys ≡ 999 mod 1000 are dropped).  The oracle restates the
    merge as a LEFT JOIN + CASE + UNION in DuckDB, so a wrong clause
    order, a missed tombstone, a mis-scoped purge, or a dropped insert
    breaks the hash.  One full-outer shuffle join plus the in-plan
    cardinality window; everything else is column algebra."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    target = o.select(
        "o_orderkey", "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    k = F.col("o_orderkey")
    # ONE scan for the whole change feed (r14): the D/U/I classes are
    # disjoint residues mod 9, so a single filtered projection with
    # CASE-built op/key/price columns emits the identical row multiset
    # the old three-scan union did — two fewer orders scans per run
    m = k % 9
    src = o.filter(m <= 3).select(
        F.when(m == 3, k + 100000000).otherwise(k).alias("o_orderkey"),
        F.col("o_custkey").alias("cust"),
        F.when(m == 0, F.lit("D"))
        .when(m.isin(1, 2), F.lit("U"))
        .otherwise(F.lit("I")).alias("op"),
        F.when(m.isin(1, 2), F.col("o_totalprice") * 2)
        .when(m == 3, F.col("o_totalprice"))
        .otherwise(F.lit(None).cast("double")).alias("new_price"),
    )
    merged = merge_into(
        target,
        src,
        on=["o_orderkey"],
        matched=[
            ("delete", F.col("__s.op") == "D", None),
            ("update", F.col("__s.op") == "U", {
                "status": F.lit("U"),
                "price": F.col("__s.new_price"),
            }),
        ],
        not_matched=[
            ("insert", F.col("__s.op") == "I", {
                "o_orderkey": F.col("__s.o_orderkey"),
                "o_custkey": F.col("__s.cust"),
                "status": F.lit("I"),
                "price": F.col("__s.new_price"),
            }),
        ],
        not_matched_by_source=[
            ("delete", F.col("__t.o_orderkey") % 1000 == 999, None),
        ],
    )
    return merged.select(
        "o_orderkey", "o_custkey", "status",
        F.col("price").cast("decimal(18,2)").cast("double").alias("price"),
    )
