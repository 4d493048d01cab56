"""Relational query group — joins, aggregations, set ops (SURVEY.md
§2.3/§2.4/§2.7) over the TPC-H-ish tables, plus TPC-H-style headline
queries that exercise scan+join+agg at scale (these three are the
bench.py workhorses).

Scale notes baked into each builder:
- dimension tables (region/nation/customer at these SFs; corpus/model
  dims in the real pipeline) are broadcast — the fact side never
  shuffles for the join;
- aggregates over doubles are rounded identically on both sides so
  partial-agg order can't flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import anti_join, get_or_create, semi_join
from ..operators.topk import top_k_frequent
from ..sources.tables import load_table
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "model_resolution",
    """
    SELECT c_custkey, o_orderkey, o_orderdate, n_name, r_name FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, n.n_name, r.r_name,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ) WHERE rn = 1
    """,
    doc="J5/W1: per-key current-model resolution — 3-way join + recency window "
    "(ref retrieve_data_from_database.py:330-358)",
)
def model_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    joined = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .join(region, region.r_regionkey == nation.n_regionkey)
    )
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "o_orderkey", "o_orderdate", "n_name", "r_name")
    )


@register(
    "semi_join_recent_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    doc="J6: left-semi join (ref retrieve_data_from_database.py:386-403)",
)
def semi_join_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(cust, recent, on="c_custkey").select("c_custkey", "c_name")


@register(
    "anti_join_stale_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    doc="J7/J11: left-anti join / NOT EXISTS (ref document_classifier.py:157-159, "
    "BackFiller SQL)",
)
def anti_join_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, recent, on="c_custkey").select("c_custkey", "c_name")


@register(
    "keyword_get_or_create",
    """
    WITH dim AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\\w+')) AS keyword
      FROM documents WHERE lang = 'en'
    ), incoming AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\\w+')) AS keyword
      FROM documents WHERE lang = 'fr'
    )
    SELECT keyword, md5(keyword) AS id
    FROM (SELECT keyword FROM incoming EXCEPT SELECT keyword FROM dim)
    """,
    doc="J8: keyword get-or-create — new keys only, deterministic ids "
    "(ref keywords_extractor.py:91-101)",
)
def keyword_get_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = lambda lang: (
        docs.filter(F.col("lang") == lang)
        .select(F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)).alias("keyword"))
        .dropDuplicates(["keyword"])
    )
    dim = toks("en").withColumn("id", F.md5("keyword"))
    merged = get_or_create(dim, toks("fr"), key="keyword", id_col="id")
    # report only the created rows (merged minus pre-existing dim keys)
    return anti_join(merged, dim.select("keyword"), on="keyword").select("keyword", "id")


@register(
    "except_churned_signups",
    """
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-03'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND ts >= TIMESTAMP '2024-01-03'
    """,
    doc="T1: EXCEPT set difference (ref BackFiller update_doi_from_details.sql)",
)
def except_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-03").cast("timestamp")
    early = ev.filter((F.col("event_type") == "signup") & (F.col("ts") < cut)).select("user_id")
    late = ev.filter((F.col("event_type") == "signup") & (F.col("ts") >= cut)).select("user_id")
    return early.distinct().exceptAll(late.distinct())


@register(
    "union_tagged_states",
    """
    SELECT event_id, 'error' AS tag FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, 'big_purchase' AS tag FROM events
    WHERE event_type = 'purchase' AND value > 150
    """,
    doc="T2: UNION ALL of tagged state rows (ref update_doi_from_details.sql)",
)
def union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    errs = ev.filter(F.col("event_type") == "error").select("event_id", F.lit("error").alias("tag"))
    big = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).select(
        "event_id", F.lit("big_purchase").alias("tag")
    )
    return errs.unionByName(big)


@register(
    "group_counts",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
    doc="A4/A6: count / countDistinct / sum / avg per group "
    "(ref batch_generator.py:80-101, document_classifier.py:64-72)",
)
def group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "any_true_per_user",
    """
    SELECT user_id,
           bool_or(event_type = 'purchase' AND value > 190) AS has_big_purchase
    FROM events GROUP BY user_id
    """,
    doc="A7: any-over-group / bool_or (ref sdgs_classifiers.py:16-28 "
    "bi_classify 'any slice is SDG')",
)
def any_true_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bool_or((F.col("event_type") == "purchase") & (F.col("value") > 190)).alias(
            "has_big_purchase"
        )
    )


@register(
    "top2_event_types",
    """
    SELECT user_id, event_type, cnt, rnk FROM (
      SELECT user_id, event_type, cnt,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY cnt DESC, event_type ASC) AS INT) AS rnk
      FROM (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id, event_type)
    ) WHERE rnk <= 2
    """,
    doc="A2/W4: top-2 most frequent value per group with deterministic "
    "tiebreak (ref qdrant_syncronizer.py:164-171 Counter.most_common(2))",
)
def top2_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return top_k_frequent(ev, "user_id", "event_type", k=2, count_col="cnt", rank_col="rnk")


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Headline scan+agg (TPC-H Q1 shape): full-table scan, map-side "
    "partial aggregation, 4-group output",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT o_orderkey, revenue, o_orderdate, o_orderpriority FROM (
      SELECT l.l_orderkey AS o_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ) ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="Headline join+agg+topN (TPC-H Q3 shape): selective filters "
    "pushed to every scan, ordered limit. orders/customer scale with "
    "SF, so they carry NO broadcast hint — AQE picks broadcast-hash "
    "at small SF from runtime sizes and falls back to shuffle joins "
    "at 100 TB instead of OOMing a forced broadcast.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"), F.col("o_orderdate"), F.col("o_orderpriority")
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_region_revenue",
    """
    SELECT r.r_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    doc="Headline multi-join rollup (TPC-H Q5 shape): fact join chain "
    "with only the BOUNDED dims (nation 25 rows, region 5) broadcast "
    "by hint; customer scales with SF so its join strategy is left to "
    "AQE/autoBroadcastJoinThreshold.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), orders.o_custkey == F.col("c_custkey"))
        .join(nation, nation.n_nationkey == F.col("c_nationkey"))
        .join(region, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "rollup_revenue",
    """
    SELECT r.r_name, n.n_name,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Extension (reference has no grouping sets — SURVEY §2.4): "
    "ROLLUP subtotals over the region→nation hierarchy; Spark's "
    "rollup() and SQL ROLLUP agree on NULL-filled subtotal rows",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # customer scales with SF — no broadcast hint (AQE decides)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .join(region, region.r_regionkey == nation.n_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "event_type_pivot",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
    doc="Extension: pivot — per-user event-type counts as columns. "
    "Spark's pivot() with EXPLICIT values (never let pivot scan for "
    "distinct values at 100 TB); oracle is portable conditional "
    "aggregation",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "rolling_avg_value",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) + 5e-10, 4) AS rolling_avg
    FROM events
    """,
    doc="Extension: bounded-frame rolling aggregate — 4-row trailing "
    "average per user in event-time order (the smoothing shape for "
    "metric streams); shared epsilon before rounding, see "
    "plans/registry.py float discipline",
)
def rolling_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w) + F.lit(5e-10), 4).alias("rolling_avg"),
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated-EXISTS as a LEFT SEMI join with a "
    "non-equi residual (ship >60d after order), then priority counts. "
    "The semi join shuffles both sides on the order key once; no "
    "dedup pass is needed because semi-join emits each order at most "
    "once regardless of matching lineitem multiplicity.",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q13_cust_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with a join-side predicate (the "
    "filter must ride the join condition, not a WHERE, to keep "
    "zero-order customers), per-customer count, then the distribution "
    "of counts. Second agg is tiny (|distinct counts| keys) — the "
    "only real shuffle is the first, on the customer key.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    joined = cust.join(
        orders,
        (orders.o_custkey == cust.c_custkey) & (orders.o_orderstatus != "F"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_promo_share",
    """
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-10, 4
           ) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1999-09-01'
      AND l.l_shipdate < TIMESTAMP '1999-10-01'
    GROUP BY ALL
    """,
    doc="TPC-H Q14 shape: conditional aggregation over a dimension "
    "join; the CASE folds the promo split into one aggregation pass. "
    "part scales with SF (200k rows/SF) so it carries no broadcast "
    "hint — at small SF AQE broadcasts it from runtime sizes, at "
    "100 TB the join degrades gracefully to shuffle-hash.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
                + F.lit(5e-10),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_count",
    """
    SELECT p.p_brand, p.p_size, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 4, 7, 10, 13)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: dimension filter join + ANTI join (exclude "
    "deficit suppliers) + COUNT DISTINCT per group. part and supplier "
    "both scale with SF, so neither is hint-broadcast — AQE chooses "
    "broadcast while their filtered sizes fit and shuffle-hash "
    "beyond; the distinct-agg stays the only guaranteed wide stage.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#2") & F.col("p_size").isin(1, 4, 7, 10, 13))
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: HAVING-driven key selection (orders whose "
    "total quantity clears a threshold) applied back to the 3-way "
    "join as a LEFT SEMI on the fact key, then re-aggregation. No "
    "forced broadcasts: the qualifying-key set, orders, and customer "
    "all scale with SF. The semi-join probe side is an AQE-visible "
    "shuffle-stage output, so AQE converts it to a broadcast (or a "
    "runtime semi-join bloom filter) exactly while it is small.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
      SELECT c.c_custkey, c.c_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-10, 2) AS revenue,
             c.c_acctbal, n.n_name
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-04-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-items revenue per customer over a "
    "date slice, 3 fact-side joins + bounded nation broadcast, "
    "top-20 by revenue. orders/customer/lineitem all scale with SF "
    "so none carries a hint; the quarter-date filter pushes into "
    "the orders scan and prunes before any join.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(5e-10),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume) + 5e-10, 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume by year — a 5-way join "
    "with TWO roles of the same bounded nation dim (both broadcast) "
    "and a disjunctive cross-nation predicate evaluated after the "
    "joins; the ship-date band pushes into the lineitem scan.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(5e-10), 2
        ).alias("revenue")
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-10, 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (adapted to the synthetic part schema: size "
    "brackets instead of container lists): disjunctive multi-bracket "
    "predicate across both join sides. Catalyst extracts the common "
    "brand/size constraints toward the part scan and quantity bounds "
    "toward lineitem; the join itself stays a plain equi-join on "
    "p_partkey with the residual OR evaluated post-join.",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(5e-10),
                2,
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount) + 5e-10, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure predicate+agg — every filter (date band, "
    "discount bracket, quantity cap) must reach PushedFilters on the "
    "single lineitem scan; zero joins, one map-side partial sum.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")) + F.lit(5e-10), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume) + 5e-10, 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    ) GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — a 7-way join with the "
    "nation dim in two roles plus the region rollup (all bounded → "
    "broadcast) over three SF-scaling facts, then a conditional-share "
    "aggregate (SUM(CASE)/SUM) per order year.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
            / F.sum(volume)
            + F.lit(5e-10),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH avg_qty AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0 + 5e-10, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.threshold
    """,
    doc="TPC-H Q17 shape: the correlated scalar subquery (per-part "
    "average quantity) DECORRELATED into a pre-aggregate + equi-join "
    "— the rewrite Catalyst's subquery planning would produce, stated "
    "explicitly: one map-side-combined agg over lineitem keyed by "
    "partkey, then a join that AQE may broadcast, never a per-row "
    "subquery execution.",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0 + F.lit(5e-10), 2).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (round 6): the remaining decorrelation / nested
# semi-anti shapes a relational user hits. The synthetic schema has no
# partsupp table and no l_commitdate/l_receiptdate/l_shipmode columns,
# so — exactly like the q17/q19 adaptations above — each query keeps
# the ORIGINAL query's *plan shape* (what the optimizer must do) while
# substituting schema-available surrogates:
#   partsupp            -> per-(l_partkey, l_suppkey) aggregates of lineitem
#   ps_supplycost       -> min unit price  l_extendedprice / l_quantity
#   ps_availqty         -> all-time shipped quantity for the pair
#   receipt>commit late -> l_shipdate > o_orderdate + N days
#   l_shipmode          -> l_linestatus
#   c_phone country     -> nation name
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           ROUND(ps.unit_cost + 5e-10, 4) AS unit_cost
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 1 AND 15 AND p.p_type = 'STANDARD'
      AND r.r_name = 'EUROPE'
      AND ps.unit_cost = (
        SELECT MIN(ps2.unit_cost)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery (cheapest EUROPE "
    "supplier per part) DECORRELATED into a per-part min aggregate "
    "joined back on (partkey, unit_cost) equality. partsupp is "
    "synthesized as the per-(part,supplier) min unit price from "
    "lineitem; MIN over identical doubles is order-independent, so "
    "the cross-engine equality join is exact (no summation drift). "
    "nation/region broadcast; the per-part min is a second agg over "
    "the same shuffle key (partkey) so it reuses the exchange.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey"))
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(1, 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    # EUROPE-supplier offers only (the correlated subquery's domain)
    eu_ps = (
        ps.join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .join(region, region.r_regionkey == nation.n_regionkey)
    )
    # correlated MIN realized as a window over the SAME partition key
    # instead of a per-part aggregate joined back (r16 opt, guide §2.4:
    # the agg+equality-join-back evaluated the eu_ps subtree twice and
    # paid two exchanges; min() OVER (PARTITION BY l_partkey) computes
    # the identical per-part minimum in one exchange over one
    # evaluation). Equivalence: the part join below filters WHOLE
    # l_partkey groups (its only key is l_partkey), so the window min
    # after the join equals the min over all EU offers for that part;
    # rows achieving the min (ties included) pass the filter exactly
    # as they matched the old (partkey, unit_cost) equality join —
    # oracle-gated, hash-identical.
    return (
        eu_ps.join(part, eu_ps.l_partkey == part.p_partkey)
        .withColumn(
            "min_cost",
            F.min("unit_cost").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round(F.col("unit_cost") + F.lit(5e-10), 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    """
    SELECT nation, o_year, ROUND(SUM(amount) + 5e-10, 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.5 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%bolt%'
    ) GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-type profit by supplier nation and "
    "order year — a 5-way star join over the fact with a LIKE filter "
    "on the part dim (supply cost surrogate: half retail price). "
    "Only bounded nation is hint-broadcast; part/supplier/orders "
    "scale with SF and are left to AQE. One fact shuffle per join "
    "key; the final agg keys are tiny (nation x year).",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount) + F.lit(5e-10), 2).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    """
    WITH val AS (
      SELECT l.l_partkey, SUM(l.l_extendedprice * l.l_quantity) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(part_value + 5e-10, 2) AS part_value
    FROM val
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
    """,
    doc="TPC-H Q11 shape: HAVING over a global scalar — per-part value "
    "held by NATION_1 suppliers, kept only when it exceeds a fraction "
    "of the nation-wide total. The scalar total is a second agg over "
    "the first agg's output (tiny) cross-joined back as a broadcast "
    "1-row frame — never a per-row subquery. The only real shuffle "
    "is the partkey agg.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    )
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
    )
    total = F.broadcast(val.agg((F.sum("part_value") * 0.001).alias("threshold")))
    return (
        val.join(total)
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value") + F.lit(5e-10), 2).alias("part_value"),
        )
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: late-shipment priority split (shipmode "
    "surrogate: l_linestatus; late-receipt surrogate: shipped >30d "
    "after order). The year band pushes into the lineitem scan; the "
    "lateness predicate is a non-equi residual on the equi-join; the "
    "priority split folds into one conditional-agg pass.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-10, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: view + scalar max — quarterly revenue per "
    "supplier (the view), suppliers tied for the maximum. Revenue is "
    "ROUNDED INSIDE the view on both sides so the scalar-max equality "
    "compares engine-stable values (raw double sums could straddle an "
    "ulp across partial-agg orders). The max is a 1-row broadcast; "
    "the supplier join side is tiny after the agg.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(5e-10), 2
        ).alias("total_revenue")
    )
    max_rev = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_revenue")))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(max_rev)
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q20_potential_promotion",
    """
    WITH allq AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), yq AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS yr_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT a.l_suppkey FROM allq a
      JOIN yq y ON y.l_partkey = a.l_partkey AND y.l_suppkey = a.l_suppkey
      WHERE a.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND a.total_qty > 1.5 * y.yr_qty
    )
    AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
    """,
    doc="TPC-H Q20 shape: nested semi chain — suppliers (semi) holding "
    "a qualifying part (inner semi on a LIKE-filtered part set) whose "
    "all-time shipped quantity exceeds 1.5x their 1996 shipments "
    "(availqty surrogate: all-time pair quantity; the correlated "
    "yearly-sum threshold is decorrelated into a pre-agg equi-join "
    "on the same (partkey,suppkey) grouping key, so the two aggs "
    "share one exchange). Nation filter is a third semi on a "
    "broadcast 1-row set.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    allq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("total_qty"))
    yq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("y_partkey"), F.col("l_suppkey").alias("y_suppkey"))
        .agg(F.sum("l_quantity").alias("yr_qty"))
    )
    small_parts = (
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    qualifying = (
        allq.join(
            yq,
            (allq.l_partkey == F.col("y_partkey")) & (allq.l_suppkey == F.col("y_suppkey")),
        )
        .join(small_parts, allq.l_partkey == F.col("p_partkey"), "left_semi")
        .filter(F.col("total_qty") > 1.5 * F.col("yr_qty"))
        .select("l_suppkey")
    )
    nation2 = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2").select(
        "n_nationkey"
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation2), supp.s_nationkey == nation2.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: the multi-EXISTS/NOT-EXISTS anti chain — "
    "suppliers in NATION_1 who were the SOLE late shipper on a "
    "finished multi-supplier order (late surrogate: shipped >60d "
    "after order date). Both correlated EXISTS clauses are "
    "decorrelated into ONE per-order aggregate (distinct supplier "
    "count, distinct late-supplier count) joined back on the order "
    "key: EXISTS(other supplier) ≡ n_supp >= 2; NOT EXISTS(other "
    "late) ≡ n_late_supp = 1 given l1 itself is late. One extra "
    "shuffle on o_orderkey replaces two correlated scans.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    base = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = base.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    nation1 = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select(
        "n_nationkey"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    return (
        base.filter(late)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation1), supp.s_nationkey == nation1.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal) + 5e-10, 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, avg_bal
    WHERE n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7', 'NATION_9')
      AND c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22 shape: anti join + global scalar avg — customers "
    "with above-average balance and no RECENT orders (every synthetic "
    "customer has some order, so 'never ordered' is adapted to 'no "
    "order since 1999' — same 7-years-dormant spirit as the "
    "original), counted per country (country-code surrogate: nation "
    "name over an IN-list). The avg is a 1-row broadcast cross join; "
    "the NOT EXISTS is a LEFT ANTI on the customer key; nation is a "
    "bounded broadcast dim.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9"))
        .select("n_nationkey", "n_name")
    )
    avg_bal = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(nation, nation.n_nationkey == cust.c_nationkey)
        .join(avg_bal)
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal") + F.lit(5e-10), 2).alias("totacctbal"),
        )
    )
