"""Relational core (SURVEY §2.B: joins, aggregation, windows, sort/
limit/top-k, set ops, grouping sets, scalar functions).

The reference has none of these (SURVEY §2.A "Not implemented") — this
module is the declared breadth of the target engine, each query a thin
Catalyst-planned DataFrame/SQL program paired with a DuckDB oracle.

Plan-shape conventions (checked in tests/bench via .explain):
* dimension tables (region, nation, small part subsets) are broadcast;
* aggregations rely on Catalyst's partial/final split — no manual
  combiners;
* top-k = window rank + filter (no global sort of the fact table);
* every filter is expressed on base columns so it pushes into the
  parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_word2vec_spark.plans.catalog import register
from mapreduce_word2vec_spark.sources.readers import read_testdata as rt


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → 8-agg hash aggregation."""
    li = rt(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           CAST(sum(l_linenumber) AS BIGINT) AS sum_lines
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — Catalyst expands to two-phase aggregation."""
    li = rt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.sum("l_linenumber").cast("long").alias("sum_lines"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). The sketch ESTIMATE is
    implementation-defined (DuckDB can't reproduce Spark's HLL++
    value), but the sketch's CONTRACT is oracle-checkable: the
    estimate is deterministic for a fixed input + rsd, so asserting
    |approx − exact| ≤ 10%·exact (5× the configured rsd=0.02) as a
    boolean column gives the driver a real value check instead of the
    rows-only fallback this query carried through rounds 1–2."""
    li = rt(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agged.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.1 * F.col("exact_parts")
        ).alias("within_10pct"),
    )


@register(
    "rollup_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals incl. grand total (NULL rows)."""
    li = rt(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "cube_part",
    oracle="""
    SELECT p_brand, p_type, count(*) AS n, avg(p_retailprice) AS avg_price
    FROM part GROUP BY CUBE (p_brand, p_type)
    """,
)
def cube_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    p = rt(spark, sf_dir, "part")
    return p.cube("p_brand", "p_type").agg(
        F.count("*").alias("n"), F.avg("p_retailprice").alias("avg_price")
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst Expand
    operator as rollup/cube)."""
    rt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-dim joins + agg + deterministic top-10."""
    c = rt(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = rt(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = rt(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffled on
    join keys only."""
    c = rt(spark, sf_dir, "customer")
    o = rt(spark, sf_dir, "orders", parallelize="o_orderkey")
    li = rt(spark, sf_dir, "lineitem", parallelize="l_orderkey")
    s = rt(spark, sf_dir, "supplier")
    n = rt(spark, sf_dir, "nation")
    r = rt(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           coalesce(sum(o_totalprice), 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: customers kept with zero orders."""
    c = rt(spark, sf_dir, "customer")
    o = rt(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER between two aggregates (nations with only customers
    or only suppliers survive)."""
    c = rt(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    s = rt(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS; no fan-out, left columns only."""
    s = rt(spark, sf_dir, "supplier")
    li = rt(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS: customers who never ordered."""
    c = rt(spark, sf_dir, "customer")
    o = rt(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two dims (both tiny → broadcast NL join)."""
    r = rt(spark, sf_dir, "region")
    n = rt(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@register(
    "join_range",
    oracle="""
    SELECT p_partkey, l_orderkey, l_linenumber, l_extendedprice, p_retailprice
    FROM lineitem JOIN part
      ON p_size = 1
     AND l_extendedprice BETWEEN p_retailprice * 2.0 AND p_retailprice * 2.5
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join via bin-index equi-join (operators/
    range_join.py): intervals explode to ~2-3 fixed-width price bins,
    points map to one bin, hash join on the bin, exact BETWEEN as the
    residual filter. No broadcast of a full side and no nested loop —
    unlike the naive BroadcastNestedLoopJoin form, this survives the
    interval side growing with the corpus. Bin width 500 ~= the
    typical interval width (0.5 * p_retailprice, retailprice ~900-2100),
    bounding replication at <= 3 copies per part row."""
    from mapreduce_word2vec_spark.operators.range_join import binned_range_join

    li = rt(spark, sf_dir, "lineitem")
    p = rt(spark, sf_dir, "part").where(F.col("p_size") == 1)
    return binned_range_join(
        li,
        p,
        value=F.col("l_extendedprice"),
        lo=F.col("p_retailprice") * 2.0,
        hi=F.col("p_retailprice") * 2.5,
        bin_width=500.0,
    ).select(
        "p_partkey", "l_orderkey", "l_linenumber", "l_extendedprice", "p_retailprice"
    )


@register(
    "join_asof",
    oracle="""
    WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                    WHERE event_type = 'click'),
         purch AS (SELECT user_id, ts,
                          event_id AS purchase_event_id,
                          value AS purchase_value
                   FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.ts, c.event_id, c.value,
           p.purchase_event_id, p.purchase_value, p.ts AS ts_right
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks; DuckDB `ASOF JOIN` is the
    oracle): each click event enriched with the same user's most recent
    prior-or-equal purchase. Union-then-window formulation — a single
    shuffle on user_id, no inequality-join pair explosion (operators/
    asof.py)."""
    from mapreduce_word2vec_spark.operators.asof import asof_join

    ev = rt(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purch,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_topk_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — no global sort."""
    o = rt(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense
    FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank with real ties (prices repeat per brand)."""
    p = rt(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time per user."""
    e = rt(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_ok,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window family: ntile, percent_rank,
    cume_dist, first/last/nth_value. last/nth use an explicit
    UNBOUNDED FOLLOWING frame (the default frame stops at CURRENT ROW,
    which silently gives the running last — a classic correctness
    trap)."""
    o = rt(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w_full).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_ok"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
           avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + bounded moving window (rowsBetween)."""
    o = rt(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running_spend"
        ),
        F.avg("o_totalprice").over(w.rowsBetween(-2, 0)).alias("moving_avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS n_within_1k
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based bounds).
    PySpark's ``rangeBetween`` only takes integer offsets, so the
    double-valued frame goes through the SQL API (same plan)."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               count(*) OVER (ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS n_within_1k
        FROM orders
        """
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject, not a full
    sort."""
    o = rt(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT nationkey, kind FROM (
      SELECT c_nationkey AS nationkey, 'cust' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supp' AS kind FROM supplier
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no dedup, no shuffle)."""
    c = rt(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("cust").alias("kind")
    )
    s = rt(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supp").alias("kind")
    )
    return c.unionAll(s)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (dedup via hash aggregation)."""
    c = rt(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = rt(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = rt(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = rt(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers."""
    c = rt(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = rt(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           concat(p_brand, ':', p_type) AS brand_type,
           (p_name LIKE '%widget%') AS is_widget,
           regexp_matches(p_name, '^[a-z]+ widget$') AS simple_widget
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (upper/substring/length/replace/concat/
    LIKE/rlike)."""
    p = rt(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.col("p_name").rlike("^[a-z]+ widget$").alias("simple_widget"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(l_discount, 2), 6) AS disc_sq,
           l_linenumber % 3 AS line_mod
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (abs/ceil/floor/sqrt/ln/pow/mod)."""
    li = rt(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp function family."""
    o = rt(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
    )


@register(
    "scalar_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS plus_45d,
           CAST(date_part('dow', o_orderdate) AS INT) AS dow,
           CAST(date_part('doy', o_orderdate) AS INT) AS doy,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date family: month arithmetic (both engines clamp
    Jan 31 + 1 month to Feb 28), last_day, day offsets, day-of-week/
    year, and formatting. Spark dayofweek is 1=Sunday; DuckDB dow is
    0=Sunday — aligned via -1."""
    o = rt(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        # timestamp, not date: Spark DATE surfaces as datetime.date in
        # pandas while DuckDB DATE coarsens to Timestamp midnight —
        # the driver's pandas canonicalizer would hash them apart.
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 45).cast("timestamp").alias("plus_45d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "sql_direct_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_direct_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: temp views + ``spark.sql`` with the SAME
    ANSI text the oracle runs — demonstrating that every catalog
    operator is equally reachable through SQL (one parser, one
    optimizer, identical plans to the DataFrame API)."""
    rt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "scalar_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'FURNITURE'), 'OTHER') AS seg_masked,
           (c_nationkey IS NOT DISTINCT FROM 7) AS is_nation7
    FROM customer
    """,
)
def scalar_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / null-safe equality."""
    c = rt(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.col("c_nationkey").eqNullSafe(F.lit(7)).alias("is_nation7"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events WHERE event_type IN ('click', 'view')
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    e = rt(spark, sf_dir, "events")
    return e.where(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@register(
    "agg_statistics",
    oracle="""
    WITH mu AS (SELECT l_returnflag, avg(l_quantity) AS mu FROM lineitem GROUP BY 1),
    s AS (
      SELECT l.l_returnflag,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
             round(stddev_samp(l_quantity), 6) AS sd_qty,
             avg(pow(l_quantity - mu, 2)) AS m2,
             avg(pow(l_quantity - mu, 3)) AS m3,
             avg(pow(l_quantity - mu, 4)) AS m4,
             median(l_quantity) AS med_qty,
             mode(l_linestatus) AS mode_status
      FROM lineitem l JOIN mu USING (l_returnflag) GROUP BY 1
    )
    SELECT l_returnflag, corr_qty_price, covar_qty_price, sd_qty,
           round(m3 / pow(m2, 1.5), 5) AS skew_qty,
           round(m4 / pow(m2, 2) - 3.0, 5) AS kurt_qty,
           med_qty, mode_status
    FROM s
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: corr / covar_pop / stddev /
    skewness / kurtosis / exact median / mode. Spark's skewness and
    kurtosis are POPULATION (biased) moments — the oracle recomputes
    them from raw moments because DuckDB's built-ins are
    sample-corrected (systematically off by ~3/n)."""
    li = rt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.skewness("l_quantity"), 5).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 5).alias("kurt_qty"),
        F.median("l_quantity").alias("med_qty"),
        F.mode("l_linestatus").alias("mode_status"),
    )


@register(
    "fuzzy_name_pairs",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name,
             regexp_extract(p_name, '(\\S+)$', 1) AS block
      FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: near-duplicate product names by edit
    distance ≤ 3. Blocked self-join (block = last word), never
    all-pairs — the standard entity-resolution shape: candidate
    generation by a cheap equi-key, verification by the expensive
    metric. Names deduplicated BEFORE pairing so the edit distance
    runs once per distinct pair."""
    names = (
        rt(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.regexp_extract("p_name", r"(\S+)$", 1))
    )
    a = names.select(F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("p_name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 3)
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )


@register(
    "unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(val AS DOUBLE) AS val
    FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
                   FROM lineitem WHERE l_orderkey < 1000)
          ON l_quantity, l_extendedprice, l_discount INTO NAME metric VALUE val)
    """,
)
def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): three measure columns melted into
    (metric, val) rows — ``DataFrame.unpivot``, a pure narrow
    projection (no shuffle)."""
    li = rt(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on linestatus with explicit values."""
    li = rt(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_o"),
        F.col("F").alias("qty_f"),
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER: all nations kept, suppliers where present."""
    s = rt(spark, sf_dir, "supplier")
    n = rt(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


@register(
    "subquery_in_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
    """,
)
def subquery_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + correlated EXISTS subqueries (SQL API; Catalyst rewrites
    both to semi-joins)."""
    for t in ("orders", "customer", "lineitem"):
        rt(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        """
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal,
           round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 6) AS bal_vs_avg
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast)."""
    rt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 6) AS bal_vs_avg
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, [0.25, 0.5, 0.75])[1], 6) AS qty_q25,
           round(quantile_cont(l_quantity, [0.25, 0.5, 0.75])[2], 6) AS qty_q50,
           round(quantile_cont(l_quantity, [0.25, 0.5, 0.75])[3], 6) AS qty_q75,
           round(median(l_extendedprice), 6) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (≡ DuckDB `quantile_cont`; the
    sketch-based approx variant is agg_approx_percentile). Computed by
    `operators.quantiles.exact_quantiles` — one distributed sort per
    value column + continuous-rank interpolation — NOT Spark's exact
    `percentile` aggregate, which buffers every group value in task
    memory and OOMs on unbounded groups (the round-7 sf10 lesson;
    l_returnflag has 3 groups, the worst case). Two sorted value
    columns → two sort passes, joined broadcast (3 rows each)."""
    from mapreduce_word2vec_spark.operators.quantiles import exact_quantiles

    li = rt(spark, sf_dir, "lineitem")
    qty = exact_quantiles(
        li, "l_returnflag", "l_quantity", {"q25": 0.25, "q50": 0.5, "q75": 0.75}
    )
    price = exact_quantiles(li, "l_returnflag", "l_extendedprice", {"p50": 0.5})
    return qty.join(F.broadcast(price), "l_returnflag").select(
        "l_returnflag",
        F.round("q25", 6).alias("qty_q25"),
        F.round("q50", 6).alias("qty_q50"),
        F.round("q75", 6).alias("qty_q75"),
        F.round("p50", 6).alias("median_price"),
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
    FROM orders
    ORDER BY price_or_null ASC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST global sort (engines disagree on the
    default: Spark = nulls first, DuckDB = nulls last — the operator
    surface exposes both; the oracle pins one)."""
    o = rt(spark, sf_dir, "orders")
    price_or_null = F.when(F.col("o_orderstatus") == "P", None).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.select(
            "o_orderkey", "o_orderstatus", price_or_null.alias("price_or_null")
        )
        .orderBy(F.col("price_or_null").asc_nulls_first(), "o_orderkey")
        .limit(50)
    )


@register(
    "array_functions",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_orderkey, sum(l_quantity) AS qty
      FROM lineitem WHERE l_orderkey < 100 GROUP BY l_returnflag, l_orderkey
    ),
    a AS (
      SELECT l_returnflag,
             list_sort(list(qty ORDER BY l_orderkey)) AS qtys_sorted,
             CAST(len(list(qty)) AS BIGINT) AS n,
             round(list_sum(list(qty)), 6) AS total,
             list_contains(list(l_orderkey), 42) AS has_42
      FROM g GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, total, has_42,
           round(list_sum(qtys_sorted[1:3]), 6) AS smallest3_sum,
           CAST(unnest(range(0, len(qtys_sorted))) AS INT) AS pos,
           round(CAST(unnest(qtys_sorted) AS DOUBLE), 6) AS qty
    FROM a
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: collect → sort → slice/contains/
    aggregate (collect_list is order-nondeterministic, so everything
    order-sensitive goes through array_sort). The sorted array itself
    leaves as posexploded (pos, qty) rows — doubles stay doubles on
    both engines, and the driver canonicalizer only ever sees scalar
    columns."""
    li = rt(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    g = li.groupBy("l_returnflag", "l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    agged = g.groupBy("l_returnflag").agg(
        F.array_sort(F.collect_list("qty")).alias("qtys_sorted"),
        F.count("*").cast("long").alias("n"),
        F.round(F.aggregate(F.collect_list("qty"), F.lit(0.0), lambda a, x: a + x), 6).alias(
            "total"
        ),
        F.array_contains(F.collect_list("l_orderkey"), 42).alias("has_42"),
    )
    return (
        agged.select(
            "l_returnflag",
            "n",
            "total",
            "has_42",
            F.round(
                F.aggregate(
                    F.slice(F.col("qtys_sorted"), 1, 3), F.lit(0.0), lambda a, x: a + x
                ),
                6,
            ).alias("smallest3_sum"),
            F.posexplode("qtys_sorted").alias("pos", "qty"),
        )
        .withColumn("qty", F.round("qty", 6))
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed aggregation via explicit two-phase salting (events has
    only a handful of event_type values — the classic hot-key shape).
    Result is bit-identical to the plain groupBy; the plan differs:
    the first exchange spreads each hot key over 16 salt buckets."""
    from mapreduce_word2vec_spark.operators.skew import salted_agg

    e = rt(spark, sf_dir, "events")
    out = salted_agg(
        e,
        ["event_type"],
        [
            (F.count("*"), F.sum("n"), "n"),
            (F.sum("value"), F.sum("sum_value"), "sum_value"),
            (F.max("value"), F.max("max_value"), "max_value"),
        ],
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, every predicate
    pushed to parquet; the canonical pushdown benchmark."""
    li = rt(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking, top-20."""
    c = rt(spark, sf_dir, "customer")
    o = rt(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = rt(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = rt(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi join (late shipments,
    adapted: shipped >60 days after order) then count by priority.
    Catalyst plans the EXISTS as a left-semi hash join on l_orderkey."""
    o = rt(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = rt(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact-dim
    join; part broadcast, shipdate range pushed to the scan."""
    li = rt(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = rt(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM orders
      JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 210) big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery joined back
    to orders/customer, top-100. The aggregate runs BEFORE the join, so
    only the tiny qualifying set joins — order matters at 100 TB."""
    li = rt(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 210)
    )
    o = rt(spark, sf_dir, "orders")
    c = rt(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates. Catalyst extracts the common p_partkey = l_partkey
    equi-condition so this stays a hash join (not a nested loop), with
    the residual OR as a join filter."""
    li = rt(spark, sf_dir, "lineitem")
    p = rt(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    return j.where(
        branch("Brand#1", 5, 1, 11)
        | branch("Brand#13", 10, 10, 20)
        | branch("Brand#20", 15, 20, 30)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "revenue"
        )
    )


@register(
    "scalar_misc",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_padded,
           trim(concat('  ', p_name, '  ')) AS name_trimmed,
           translate(p_type, 'AEO', 'aeo') AS type_translated,
           greatest(p_size, 25) AS size_hi,
           least(p_size, 25) AS size_lo,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS price_sign,
           CAST(floor(p_retailprice) AS DOUBLE) AS price_trunc
    FROM part
    """,
)
def scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar family: padding/trim/translate/greatest/least/
    sign/trunc."""
    p = rt(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.translate("p_type", "AEO", "aeo").alias("type_translated"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
        F.signum(F.col("p_retailprice") - 1000.0).alias("price_sign"),
        F.floor("p_retailprice").cast("double").alias("price_trunc"),
    )


@register(
    "merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice * 1.1, 6) AS o_totalprice
      FROM orders WHERE o_orderkey < 100
      UNION ALL
      SELECT -1, 0, 'N', 123.456
    ),
    tgt AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders)
    SELECT * FROM (
      SELECT t.* FROM tgt t LEFT JOIN src s USING (o_orderkey) WHERE s.o_orderkey IS NULL
      UNION ALL
      SELECT * FROM src
    )
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (no Delta in this environment): update the
    first 100 orders' prices and insert one new order — the
    anti-join + union formulation MERGE INTO lowers to."""
    from mapreduce_word2vec_spark.operators.merge import merge_upsert

    o = rt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.where(F.col("o_orderkey") < 100).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 6)
    )
    # Literal insert row built JVM-side (spark.range), not via a
    # driver-side createDataFrame: an ExistingRDD has unknown stats and
    # blocks the broadcast decision for the whole source union.
    inserts = spark.range(1).select(
        F.lit(-1).cast("bigint").alias("o_orderkey"),
        F.lit(0).cast("bigint").alias("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(123.456).alias("o_totalprice"),
    )
    return merge_upsert(
        o, updates.unionByName(inserts), "o_orderkey", small_source=True
    )


@register(
    "map_functions",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag,
           CAST(cardinality(map_from_entries(list({'k': l_linestatus, 'v': qty}))) AS INT) AS n_statuses,
           array_to_string(list_sort(map_keys(map_from_entries(list({'k': l_linestatus, 'v': qty})))), ',') AS statuses,
           map_from_entries(list({'k': l_linestatus, 'v': qty}))['O'][1] AS qty_open
    FROM g GROUP BY l_returnflag
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: build a status→qty map per return flag
    (map_from_entries), then size / sorted keys / lookup. Raw maps
    never appear in the output (map ordering is engine-dependent) —
    only scalars derived from them; the sorted key list leaves as a
    comma-joined string (strings render identically on both engines,
    and the driver canonicalizer only handles scalars)."""
    li = rt(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("qty")
    )
    m = F.map_from_entries(F.collect_list(F.struct("l_linestatus", "qty")))
    return g.groupBy("l_returnflag").agg(
        F.size(m).alias("n_statuses"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("statuses"),
        F.element_at(m, "O").alias("qty_open"),
    )


@register(
    "udtf_split_priority",
    oracle="""
    SELECT o_orderkey, CAST(split_part(o_orderpriority, '-', 1) AS INT) AS priority_num,
           split_part(o_orderpriority, '-', 2) AS priority_name
    FROM orders WHERE o_orderkey < 500
    """,
)
def udtf_split_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): splits '3-MEDIUM'-style priority
    strings into (num, name) rows — the UDTF surface of the engine
    (lateral-join shape), deterministic so fully oracle-able."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, priority_num int, priority_name string")
    class SplitPriority:
        def eval(self, key: int, prio: str):
            num, _, name = (prio or "").partition("-")
            yield key, (int(num) if num.isdigit() else None), name

    spark.udtf.register("split_priority", SplitPriority)
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT t.o_orderkey, t.priority_num, t.priority_name
        FROM orders, LATERAL split_priority(o_orderkey, o_orderpriority) t
        WHERE orders.o_orderkey < 500
        """
    )


# ---------------------------------------------------------------------------
# Classic decision-support suite, part 2 (adapted to the synthetic
# schema: no partsupp table, no comment/phone/container columns — each
# docstring names the adaptation). These widen the SQL surface with the
# multi-fact join + correlated-subquery shapes the first nine queries
# don't exercise.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (nation pair NATION_1/NATION_2, ship years
    1996-97): two fact joins shuffled on their keys, both nation dims
    broadcast, the disjunctive nation-pair predicate applied AFTER the
    joins — Catalyst pushes the shipdate range into the lineitem scan,
    and the pair filter touches only broadcast-joined columns."""
    li = rt(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = rt(spark, sf_dir, "orders")
    c = rt(spark, sf_dir, "customer")
    s = rt(spark, sf_dir, "supplier")
    n1 = rt(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = rt(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (supplier-nation NATION_3 share of EUROPE PROMO
    volume by order year): the deepest join tree in the suite (8-way).
    The selective part filter (1/6 of parts) broadcasts and prunes
    lineitem FIRST; conditional aggregation computes the share in one
    pass instead of two grouped sums joined back together."""
    p = rt(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = rt(spark, sf_dir, "lineitem")
    o = rt(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = rt(spark, sf_dir, "customer")
    s = rt(spark, sf_dir, "supplier")
    n1 = rt(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = rt(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = rt(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume")
            ).alias("mkt_share")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (order-count histogram; the comment-pattern
    exclusion becomes an o_orderstatus filter — no comment column in
    the synthetic schema): two-level aggregation where the second
    group-by runs on the tiny (custkey, count) output of the first —
    the histogram exchange carries one row per customer, never the
    fact table."""
    c = rt(spark, sf_dir, "customer").select("c_custkey")
    o = (
        rt(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): the
    revenue CTE aggregates the filtered fact once; the max is a
    window over that small per-supplier aggregate (one extra exchange
    of supplier-cardinality rows) instead of a second scan via scalar
    subquery. Revenue is rounded to 4 digits BEFORE the max/equality
    comparison (not just in the output projection) — the two engines
    sum in different orders, and an unquantized float equality could
    tie in one engine and miss by an ulp in the other, changing the
    returned row set."""

    li = rt(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    top = rev.withColumn(
        "_mx", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("_mx"))
    s = rt(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue for one brand; the
    container filter is dropped — no container column): the correlated
    per-part average decorrelates into a window mean over the SAME
    brand-pruned scan — one exchange on partkey, no self-join, no
    second lineitem scan. NOTE the per-part average must be computed
    over ALL lineitems of the part (the correlated subquery has no
    brand filter), so the brand filter applies after the partkey
    broadcast-prune but the window runs before any quantity filter."""

    p = (
        rt(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = rt(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Broadcast-prune lineitem to the brand's parts FIRST (the inner
    # correlated average only ever references those parts), then the
    # per-part mean is a window over the pruned rows.
    pruned = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    flagged = pruned.withColumn("_avg_qty", F.avg("l_quantity").over(w))
    return (
        flagged.where(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "q22_prospect_customers",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    cutoff AS (
      SELECT avg(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 6) AS totacctbal
    FROM eligible CROSS JOIN cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (high-balance DORMANT customers; the
    phone-prefix filter becomes a nation-key set — no phone column —
    and "no orders" becomes "no orders since 2000", because every
    synthetic customer has at least one order, which would make the
    pure anti-join vacuously empty): scalar aggregate broadcast via
    1-row crossJoin, then an ANTI join against date-pruned orders —
    the dormancy check shuffles only custkeys, and the avg-balance
    cutoff costs one metadata-light scan of the eligible slice."""
    eligible = (
        rt(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    cutoff = eligible.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        rt(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


@register(
    "agg_hll_sketch",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem
    """,
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL):
    per-group part cardinality plus a global row built by MERGING the
    group sketches — never rescanning the fact. This is the 100 TB
    incremental-statistics pattern: sketch each partition/day once,
    union sketches for any rollup later. Register-max semantics make
    the estimate order- and partitioning-independent (deterministic
    across runs); DuckDB's HLL differs, so the oracle checks the
    sketch's CONTRACT instead of its value — exact distinct counts
    plus |est − exact| ≤ 5%·exact as a boolean (same pattern as
    agg_approx_distinct; the error-bound property test in
    test_graph_and_misc stays)."""
    li = rt(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    per = sk.select(
        "l_returnflag",
        "exact_parts",
        F.hll_sketch_estimate("sk").cast("long").alias("est_parts"),
    )
    merged = (
        sk.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"),
        )
        .crossJoin(
            F.broadcast(li.agg(F.countDistinct("l_partkey").alias("exact_parts")))
        )
        .select(
            F.lit("ALL").alias("l_returnflag"),
            "exact_parts",
            F.col("e").cast("long").alias("est_parts"),
        )
    )
    return per.unionByName(merged).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("est_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_5pct"),
    )


@register(
    "merge_scd2",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS seg,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (SELECT c_custkey, 'VIP' AS seg FROM customer WHERE c_acctbal > 9000),
    changed AS (
      SELECT d.c_custkey FROM dim d JOIN upd u USING (c_custkey)
      WHERE d.valid_to IS NULL AND d.seg <> u.seg
    )
    SELECT c_custkey, seg, valid_from, valid_to FROM (
      SELECT d.c_custkey, d.seg, d.valid_from,
             CASE WHEN d.valid_to IS NULL
                       AND d.c_custkey IN (SELECT c_custkey FROM changed)
                  THEN TIMESTAMP '2024-01-01 00:00:00' ELSE d.valid_to END AS valid_to
      FROM dim d
      UNION ALL
      SELECT u.c_custkey, u.seg,
             TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
      FROM upd u
      WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
    )
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension apply (the MERGE WHEN MATCHED
    ... INSERT pattern warehouses run on every dimension load): a
    deterministic VIP-segment update closes each changed key's current
    row at the batch timestamp and appends the open-ended new version;
    history and unchanged keys pass through untouched. Scale shape:
    one key-shuffled join to find changed keys, one semi-join for the
    inserts, unions shuffle-free — the anti/semi-join decomposition
    Delta/Iceberg MERGE lowers to (operators/merge.py)."""
    from mapreduce_word2vec_spark.operators.merge import scd2_apply

    c = rt(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = c.where(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.lit("VIP").alias("seg")
    )
    return scd2_apply(
        dim, upd, key="c_custkey", tracked_cols=["seg"],
        batch_time="2024-01-01 00:00:00",
    )


@register(
    "diff_snapshots",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 97 <> 3
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS price,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 97 <> 5
    )
    SELECT COALESCE(old.k, new.k) AS k,
           CASE WHEN old.k IS NULL THEN 'added'
                WHEN new.k IS NULL THEN 'removed'
                ELSE 'modified' END AS change,
           round(old.price, 6) AS old_price,
           round(new.price, 6) AS new_price
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE old.k IS NULL OR new.k IS NULL
       OR old.price <> new.price OR old.status <> new.status
    """,
)
def diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: two snapshots of `orders` (simulated by
    deterministic key filters + a value perturbation) compared into
    added / removed / modified rows — the audit step between training
    -data releases. One full outer join hashed on the key; unchanged
    rows (the overwhelming majority at scale) are filtered INSIDE the
    join's output before anything else materializes. At 100 TB both
    snapshots bucket by key, making the join zero-exchange; a
    cheaper first pass can compare per-bucket xxhash64 digests and
    skip identical buckets entirely."""
    o = rt(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 97 != 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    new = o.where(F.col("o_orderkey") % 97 != 5).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    changed = (
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.price") != F.col("n.price"))
        | (F.col("o.status") != F.col("n.status"))
    )
    return j.where(changed).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .otherwise("modified")
        .alias("change"),
        F.round(F.col("o.price"), 6).alias("old_price"),
        F.round(F.col("n.price"), 6).alias("new_price"),
    )


@register(
    "agg_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_extendedprice) AS med_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(any_value(med.med_price), 6) AS med_price,
           round(median(abs(l.l_extendedprice - med.med_price)), 6) AS mad_price
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of price per return flag — the
    robust spread statistic outlier filters use where stddev is
    distorted by the very outliers being hunted. Two passes (group
    median, then median of absolute deviations) with the tiny
    per-group median table broadcast back. Both medians are EXACT and
    scale-safe via `operators.quantiles.exact_quantiles` (sort +
    rank interpolation) — previously this used Spark's exact
    `percentile` aggregate, whose per-group value buffering OOMs on
    unbounded groups (the round-7 sf10 lesson); the sketch variant
    (`approx_percentile`, mergeable t-digest-style) remains the
    production default when ±1% rank error is acceptable."""
    from mapreduce_word2vec_spark.operators.quantiles import exact_quantiles

    li = rt(spark, sf_dir, "lineitem")
    med = exact_quantiles(li, "l_returnflag", "l_extendedprice", {"med_price": 0.5})
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "med_price",
        F.abs(F.col("l_extendedprice") - F.col("med_price")).alias("adev"),
    )
    mad = exact_quantiles(dev, "l_returnflag", "adev", {"mad": 0.5})
    return med.join(F.broadcast(mad), "l_returnflag").select(
        "l_returnflag",
        F.round("med_price", 6).alias("med_price"),
        F.round("mad", 6).alias("mad_price"),
    )


@register(
    "q12_priority_delay",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS ontime_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q12_priority_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to the synthetic schema (no l_shipmode /
    l_receiptdate): per order priority, lines shipped more than 60
    days after the order date vs on time. Conditional partial
    aggregation over the fact join — the orders side projects two
    columns and shuffles by key (Q12's plan shape; the CASE sums
    fold into one agg pass)."""
    li = rt(spark, sf_dir, "lineitem")
    o = rt(spark, sf_dir, "orders")
    # Interval arithmetic, not date_add: F.date_add truncates the
    # timestamp to DATE while the oracle's + INTERVAL keeps time-of-
    # day — masked only because the frozen fixture is midnight-only
    # (q4_order_priority already does this correctly).
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("late_lines"),
            F.sum(F.when(~late, 1).otherwise(0)).cast("bigint").alias("ontime_lines"),
        )
    )


@register(
    "q21_late_suppliers",
    oracle="""
    WITH ls AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, l_suppkey, is_late,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supps,
             sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late_supps
      FROM ls
    )
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON l_suppkey = s_suppkey
    WHERE is_late = 1 AND n_supps >= 2 AND n_late_supps = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (late = shipped > 90 days after order date):
    suppliers who were the SOLE late supplier on a multi-supplier
    finalized order.

    The classic spelling is a self-join + EXISTS + NOT EXISTS over
    lineitem (three scans). Here the double correlation collapses
    into ONE aggregation per (order, supplier) followed by two
    windows on the same order partitioning — lineitem is read once,
    shuffles once on (orderkey, suppkey), and the windows reuse the
    orderkey exchange. The supplier name join broadcasts."""

    li = rt(spark, sf_dir, "lineitem")
    o = rt(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = rt(spark, sf_dir, "supplier")
    ls = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    per_order = ls.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count("*").over(w).alias("n_supps"),
        F.sum("is_late").over(w).alias("n_late_supps"),
    )
    return (
        per_order.where(
            (F.col("is_late") == 1)
            & (F.col("n_supps") >= 2)
            & (F.col("n_late_supps") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus, count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus AS mode_status, cnt AS mode_count
    FROM (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, l_linestatus) AS rn
      FROM c
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, ties broken by the
    LOWEST value): count per (group, value), then a rank window over
    the counted table — unlike the built-in `mode()`, whose tie
    winner is partitioning-dependent, this is reproducible across
    engines and runs. The window consumes the aggregated (group,
    value, cnt) table (value-cardinality-sized), not the fact
    table."""
    li = rt(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))

    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_linestatus")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact join: the lineitem side carries a salt, the
    orders side explodes across all 8 salt values, and the join key
    becomes (orderkey, salt) — each hot order's lines spread over 8
    reducers instead of one. Result is bit-identical to the plain
    join (property-tested in test_scale_patterns); this registration
    proves it against the SQL oracle end to end. At 100 TB the salt
    count scales with the measured hot-key row count, or AQE's
    skew-join split handles it adaptively from runtime stats."""
    from mapreduce_word2vec_spark.operators.skew import salted_join

    li = rt(spark, sf_dir, "lineitem")
    o = rt(spark, sf_dir, "orders")
    j = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue"),
    )


# --------------------------------------------------------------------------
# Remaining TPC-H adaptations (Q2/Q9/Q11/Q16/Q20) — the testdata has no
# partsupp table, so the part<->supplier relation is DERIVED from the
# lineitem fact (distinct (l_partkey, l_suppkey) pairs) and
# ps_supplycost is stood in for by s_acctbal (Q2) or a fixed fraction
# of p_retailprice (Q9/Q11), mirroring how q12/q21 adapted the missing
# commit/receipt dates. With these five, all 22 TPC-H query shapes are
# registered (ref has none — SURVEY §2.A "Not implemented": this is
# declared target breadth).
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name,
             min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
      FROM part
        JOIN ps ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 25 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT p_partkey, p_type, s_suppkey, s_name,
           round(s_acctbal, 2) AS s_acctbal, n_name
    FROM cand WHERE s_acctbal = min_bal
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part in a region;
    ps_supplycost -> s_acctbal, partsupp -> distinct lineitem pairs).
    The correlated min-cost subquery decorrelates into a window min
    over the candidate set, so the fact is scanned ONCE: lineitem is
    pruned by a broadcast of the size/type-filtered parts before the
    distinct (the 100 TB-critical step — distinct runs on the pruned
    pairs, not 100 TB of raw pairs), and supplier/nation/region are
    broadcast dims. No self-join, one exchange for the distinct, one
    for the per-part window."""
    p = (
        rt(spark, sf_dir, "part")
        .where((F.col("p_size") == 25) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    pairs = (
        rt(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_type", "l_suppkey")
        .distinct()
    )
    s = rt(spark, sf_dir, "supplier")
    n = rt(spark, sf_dir, "nation")
    r = rt(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        pairs.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("_min_bal"))
        .select(
            "p_partkey",
            "p_type",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity), 4) AS sum_profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier-nation and order year for
    parts matching a name pattern; ps_supplycost -> 0.5*p_retailprice
    per unit). Join order matters at 100 TB: lineitem is broadcast-
    pruned by the name-filtered parts FIRST (the only selective
    predicate), then orders joins on the surviving orderkeys — a
    shuffled join on the big-big pair, with supplier/nation broadcast.
    The aggregate is low-cardinality (nation x year) so the partial
    agg collapses nearly everything map-side."""
    p = (
        rt(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = rt(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    o = rt(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = rt(spark, sf_dir, "supplier")
    n = rt(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                4,
            ).alias("sum_profit")
        )
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH stock AS (
      SELECT l_partkey, sum(l_quantity * 0.5 * p_retailprice) AS value
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey IN (2, 4, 6)
      GROUP BY l_partkey
    ),
    total AS (SELECT sum(value) AS tv FROM stock)
    SELECT l_partkey AS p_partkey, round(value, 4) AS value
    FROM stock CROSS JOIN total
    WHERE value > 0.001 * tv
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts representing a significant fraction of
    total stock value held by a nation group; partsupp availqty*cost
    -> lineitem quantity * half retail price). The global-total
    threshold is the classic scalar-subquery trap: computed here as a
    1-row aggregate OVER THE ALREADY-AGGREGATED per-part table (part
    cardinality, not fact cardinality) and broadcast back via
    crossJoin — no second scan of lineitem, no driver-side collect.
    The per-part table is persisted: two consumers reference it (the
    total and the filter), and without materialization Spark
    recomputes the subtree, scanning the fact twice (plan-asserted
    in test_tpch_completion_plan_shapes)."""
    from mapreduce_word2vec_spark.runtime import tracked_persist

    s = (
        rt(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(2, 4, 6))
        .select("s_suppkey")
    )
    p = rt(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    stock = (
        rt(spark, sf_dir, "lineitem")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity") * 0.5 * F.col("p_retailprice")
            ).alias("value")
        )
    )
    stock = tracked_persist(stock)
    total = stock.agg(F.sum("value").alias("tv"))
    return (
        stock.crossJoin(F.broadcast(total))
        .where(F.col("value") > 0.001 * F.col("tv"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 4).alias("value"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0.0)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN ok_supp ON l_suppkey = s_suppkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct suppliers able to supply each
    brand/type/size bucket, excluding flagged suppliers; the
    complaints NOT-IN becomes a negative-balance exclusion, partsupp
    -> distinct lineitem pairs). lineitem is broadcast-pruned by the
    filtered part slice BEFORE the distinct so the dedup exchange
    carries only qualifying pairs; the count(DISTINCT) then rides
    Catalyst's expand+two-phase rewrite — no joins after the prune,
    both dims broadcast."""
    p = (
        rt(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ok = (
        rt(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") >= 0.0)
        .select("s_suppkey")
    )
    pairs = (
        rt(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(ok), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_name, n_name, round(qty, 2) AS qty
    FROM supplier
      JOIN shipped ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 2 AND qty > 50.0
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers in a region who moved significant
    volume of promo-named parts in a year; the availqty>half-shipped
    check becomes a shipped-quantity threshold — no partsupp). The
    name-filtered part slice broadcast-prunes lineitem, the date
    filter pushes into the parquet scan, and the per-supplier
    aggregate (supplier cardinality, tiny) joins broadcast dims.
    One wide-fact exchange total, keyed on l_suppkey."""
    p = (
        rt(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = rt(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50.0)
    )
    s = rt(spark, sf_dir, "supplier")
    n = rt(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        shipped.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", F.round("qty", 2).alias("qty"))
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                    WHERE event_type = 'click'),
         purch AS (SELECT user_id, ts,
                          event_id AS purchase_event_id,
                          value AS purchase_value
                   FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.ts, c.event_id, c.value,
           p.purchase_event_id, p.purchase_value, p.ts AS ts_right
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click enriched with the same user's
    NEXT purchase at-or-after it (attribution's "time to conversion"
    direction, vs join_asof's last-prior). Same union-then-window
    single-shuffle shape — the window just looks forward."""
    from mapreduce_word2vec_spark.operators.asof import asof_join

    ev = rt(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purch,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        direction="forward",
    )


@register(
    "window_distinct_cumulative",
    oracle="""
    SELECT event_id, event_type,
           CAST(count(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_users
    FROM events
    """,
)
def window_distinct_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user count per event type (audience-reach
    curve). Spark windows reject DISTINCT aggregates; the naive
    rewrite — size of a collect_set over the frame — keeps an O(distinct
    users) set in the window operator's state — the same
    unbounded-state class as the round-7 exact-percentile OOM. The
    EXACT O(1)-state formulation used here: a user contributes to the
    cumulative distinct count from their FIRST event onward, so mark
    each row that is the first occurrence of its (event_type, user_id)
    and take a running SUM of the 0/1 flag. Two window passes (one
    per-user ranking, one running sum) instead of one, constant state,
    bit-identical to count(DISTINCT) cumulative — no HLL approximation
    needed even at 100 TB."""
    ev = rt(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.sum("is_first").over(w_cum).cast("bigint").alias("distinct_users"),
    )


@register(
    "basket_part_lift",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    pf AS (SELECT l_partkey, count(*) AS n_p FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           round((CAST(n_ab AS DOUBLE) / n_orders)
                 / ((CAST(pa.n_p AS DOUBLE) / n_orders)
                    * (CAST(pb.n_p AS DOUBLE) / n_orders)), 6) AS lift
    FROM pairs
    JOIN pf pa ON part_a = pa.l_partkey
    JOIN pf pb ON part_b = pb.l_partkey
    CROSS JOIN n
    WHERE n_ab >= 2
    """,
)
def basket_part_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association lift: for part pairs co-occurring in
    >= 2 orders, lift = P(ab) / (P(a)·P(b)) (the Apriori screening
    step). Pair enumeration is an order-keyed self-join — pairs per
    order are quadratic in BASKET size (bounded, ~7 for TPC-H), never
    in table size; part frequencies join on part keys with no
    broadcast hint (part dimension outgrows thresholds at scale); the
    order count rides a broadcast 1-row aggregate."""
    li = rt(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    pf = items.groupBy("l_partkey").agg(F.count("*").alias("n_p"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    pa = pf.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a"))
    pb = pf.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b"))
    lift = F.round(
        (F.col("n_ab").cast("double") / F.col("n_orders"))
        / (
            (F.col("n_a").cast("double") / F.col("n_orders"))
            * (F.col("n_b").cast("double") / F.col("n_orders"))
        ),
        6,
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", F.col("n_ab").cast("bigint").alias("n_ab"), lift.alias("lift"))
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS d_max FROM orders),
    base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(o_orderdate), d_max) AS recency_days,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders CROSS JOIN mx
      GROUP BY o_custkey, d_max
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score || f_score || m_score AS VARCHAR) AS segment
    FROM (
      SELECT custkey, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days ASC, custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, custkey) AS m_score
      FROM base
    )
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores on recency /
    frequency / monetary (2-dp monetary + custkey tie-breaks ⇒
    engine-exact ntiles), concatenated into the classic segment code.
    The ntile windows run GLOBAL — but over the customer-level
    aggregate, not the orders table; at billions of customers the
    same scores come from an approx_percentile threshold broadcast
    (documented alternative), identical output schema."""

    o = rt(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("d_max"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("d_max"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    r = F.ntile(4).over(Window.orderBy(F.asc("recency_days"), "custkey"))
    f = F.ntile(4).over(Window.orderBy(F.desc("frequency"), "custkey"))
    m = F.ntile(4).over(Window.orderBy(F.desc("monetary"), "custkey"))
    scored = base.select(
        "custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firstm AS (
      SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month,
           CAST(date_diff('month', cohort_month,
                          date_trunc('month', o_orderdate)) AS BIGINT) AS age_months,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN firstm USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue and active count tracked by month age — the
    orders-side companion of events_retention. The cohort dimension
    joins back on custkey with no broadcast hint (customer cardinality
    outgrows thresholds); both aggregations are partial map-side."""
    o = rt(spark, sf_dir, "orders")
    # timestamp, not date: the driver's pandas canonicalizer hashes
    # Spark datetime.date apart from DuckDB's DATE→Timestamp coarsening.
    firstm = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = o.join(firstm, "o_custkey")
    age = F.months_between(
        F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
    ).cast("bigint")
    return (
        joined.select("o_custkey", "o_totalprice", "cohort_month", age.alias("age_months"))
        .groupBy("cohort_month", "age_months")
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("active_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "merge_delete_apply",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
    """,
)
def merge_delete_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC delete application — the D in CDC, completing the merge
    family (upsert / SCD2 / compact / delete): a tombstone batch
    (finished orders with key % 7 = 0, standing in for a changelog's
    delete set) is applied to the target as a LEFT ANTI join on the
    key. Delta/Iceberg MERGE ... WHEN MATCHED THEN DELETE executes
    this same anti-join underneath; the tombstone side is a fraction
    of the target and broadcastable when small — left unhinted so AQE
    decides from its actual size."""
    o = rt(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    tombstones = o.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0)
    ).select("o_orderkey")
    return o.join(tombstones, "o_orderkey", "left_anti")


@register(
    "window_moving_median",
    oracle="""
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS med7
    FROM events
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-event moving median per user — the robust smoother
    that mean-based running aggregates can't provide (one outlier
    poisons a mean window; the median shrugs). Exact percentile over
    a bounded row frame: per-row cost is the 7-element frame, state
    bounded by the frame, partitions keyed by user."""

    ev = rt(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med7"),
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH s AS (
      SELECT p_type, l_suppkey, sum(l_extendedprice) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, l_suppkey
    ),
    t AS (SELECT p_type, sum(rev) AS total FROM s GROUP BY p_type)
    SELECT p_type,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((rev / total) * (rev / total)), 6) AS hhi
    FROM s JOIN t USING (p_type)
    GROUP BY p_type
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration index: Herfindahl–Hirschman (Σ share²) of
    supplier revenue within each part type — the supply-chain-risk
    rollup (HHI → 1 means one supplier owns the type). Two keyed
    aggregations sharing the (p_type, suppkey) exchange; the per-type
    totals join back keyed, part dimension broadcast by size."""
    li = rt(spark, sf_dir, "lineitem")
    p = rt(spark, sf_dir, "part").select("p_partkey", "p_type")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    t = s.groupBy("p_type").agg(F.sum("rev").alias("total"))
    share = F.col("rev") / F.col("total")
    return (
        s.join(t, "p_type")
        .groupBy("p_type")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
    )


@register(
    "orders_backlog_curve",
    oracle="""
    WITH ship AS (
      SELECT l_orderkey, max(l_shipdate) AS shipped_date FROM lineitem GROUP BY l_orderkey
    ),
    deltas AS (
      SELECT o_orderdate AS d, 1 AS delta FROM orders
      UNION ALL
      SELECT shipped_date AS d, -1 AS delta
      FROM orders JOIN ship ON o_orderkey = l_orderkey
    )
    SELECT CAST(d AS TIMESTAMP) AS d,
           CAST(sum(sum(delta)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_orders
    FROM deltas GROUP BY d
    """,
)
def orders_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time — the interval-concurrency
    pattern (how many orders are simultaneously in flight): +1 at
    order date, −1 at final ship date, daily net deltas, then one
    running sum. The per-day pre-aggregation bounds the ordered
    window's input to distinct dates (≤ a few thousand rows at any
    order volume) — the global cumsum never sees the fact table."""

    o = rt(spark, sf_dir, "orders")
    li = rt(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("shipped_date"))
    plus = o.select(F.col("o_orderdate").alias("d"), F.lit(1).alias("delta"))
    minus = (
        o.join(ship, o.o_orderkey == ship.l_orderkey)
        .select(F.col("shipped_date").alias("d"), F.lit(-1).alias("delta"))
    )
    daily = plus.unionByName(minus).groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # timestamp output (not date): the driver's pandas canonicalizer
    # hashes Spark datetime.date apart from DuckDB DATE→Timestamp.
    return daily.select(
        F.col("d").cast("timestamp").alias("d"),
        F.sum("net").over(w).cast("bigint").alias("open_orders"),
    )


@register(
    "customer_order_streaks",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey,
             date_trunc('month', o_orderdate) AS m
      FROM orders
    ),
    grp AS (
      SELECT o_custkey, m,
             date_diff('month', DATE '1990-01-01', m)
               - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS island
      FROM months
    ),
    runs AS (
      SELECT o_custkey, count(*) AS run_len, min(m) AS run_start
      FROM grp GROUP BY o_custkey, island
    )
    SELECT o_custkey AS custkey,
           CAST(max(run_len) AS BIGINT) AS longest_streak_months,
           CAST(min(run_start) FILTER (WHERE run_len = (
             SELECT max(run_len) FROM runs r2 WHERE r2.o_custkey = runs.o_custkey
           )) AS TIMESTAMP) AS best_streak_start
    FROM runs GROUP BY o_custkey
    """,
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's longest streak of CONSECUTIVE
    order months (month ordinal minus row_number is constant within an
    island — the classic trick, no self-join). Distinct months first
    (bounded rows per customer), one rank window, two keyed
    aggregations; earliest start breaks ties deterministically."""

    o = rt(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).distinct()
    ordinal = F.months_between(F.col("m"), F.lit("1990-01-01").cast("timestamp")).cast(
        "long"
    )
    rn = F.row_number().over(Window.partitionBy("o_custkey").orderBy("m"))
    grp = months.select("o_custkey", "m", (ordinal - rn).alias("island"))
    runs = grp.groupBy("o_custkey", "island").agg(
        F.count("*").alias("run_len"), F.min("m").alias("run_start")
    )
    best = runs.groupBy("o_custkey").agg(F.max("run_len").alias("longest"))
    return (
        runs.join(best, "o_custkey")
        .where(F.col("run_len") == F.col("longest"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("run_len").cast("bigint").alias("longest_streak_months"),
            F.min("run_start").cast("timestamp").alias("best_streak_start"),
        )
    )


@register(
    "customer_pareto_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM rev
    ),
    t AS (SELECT sum(rev) AS total FROM rev)
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(rev), 2) AS decile_rev,
           round(sum(sum(rev)) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 / any_value(total), 6) AS cum_share
    FROM ranked CROSS JOIN t
    GROUP BY decile, total
    """,
)
def customer_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/Lorenz): customers in revenue
    deciles with each decile's cumulative share of total — the
    \"top 10% drive X%\" curve. The ntile runs over the customer-level
    aggregate (2-dp revenue + custkey tie-break ⇒ engine-exact);
    the final cumsum window sees only 10 rows."""

    o = rt(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    decile = F.ntile(10).over(Window.orderBy(F.desc("rev"), "o_custkey"))
    ranked = rev.select("rev", decile.alias("decile"))
    t = rev.agg(F.sum("rev").alias("total"))
    per = (
        ranked.groupBy("decile")
        .agg(F.count("*").cast("bigint").alias("n_customers"),
             F.round(F.sum("rev"), 2).alias("decile_rev"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "decile_rev",
            F.round(F.sum("decile_rev").over(w) / F.col("total"), 6).alias("cum_share"),
        )
    )


@register(
    "orders_mom_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             round(sum(o_totalprice), 2) AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           round(revenue / lag(revenue) OVER (ORDER BY month) - 1.0, 6) AS mom_growth
    FROM m
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting staple: one
    monthly aggregate (map-side partial over the fact table), then a
    lag window over the bounded month table (hundreds of rows at any
    order volume; the global order-by never touches facts)."""

    o = rt(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        "revenue",
        "n_orders",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1.0, 6).alias(
            "mom_growth"
        ),
    )


_Z_TERMS = " + ".join(
    f"((( l_partkey & 255) >> {j} & 1) * {1 << (2 * j)})"
    f" + (((l_suppkey & 255) >> {j} & 1) * {1 << (2 * j + 1)})"
    for j in range(8)
)


@register(
    "layout_zorder",
    oracle=f"""
    WITH g AS (
      SELECT l_partkey & 255 AS px, l_suppkey & 255 AS sy,
             CAST({_Z_TERMS} AS BIGINT) AS z
      FROM lineitem
    )
    SELECT CAST(z >> 8 AS INT) AS file_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(px) AS INT) AS px_min, CAST(max(px) AS INT) AS px_max,
           CAST(min(sy) AS INT) AS sy_min, CAST(max(sy) AS INT) AS sy_max
    FROM g GROUP BY 1
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering manifest — the write-side layout
    operator behind multi-dimensional file skipping (what Delta's
    OPTIMIZE ZORDER BY computes): interleave the low 8 bits of two
    join keys into a 16-bit Morton code, group rows into 256 file
    buckets by its top byte, and emit each bucket's per-dimension
    min/max — the footer stats a reader prunes against.

    The manifest itself PROVES the layout property: every bucket's
    (px, sy) ranges span at most a 16x16 grid cell, so a predicate on
    EITHER key dimension eliminates ~15/16 of files — against the
    1-dimensional sort where the secondary key's range per file is
    unbounded. At 100 TB this replaces the groupBy with
    repartitionByRange(z) + sortWithinPartitions(z) before the
    parquet write; the aggregation here is the deterministic,
    oracle-able core (pure integer bit arithmetic, one exchange on
    the 8-bit bucket id)."""
    li = rt(spark, sf_dir, "lineitem")
    px = F.col("l_partkey").bitwiseAND(F.lit(255))
    sy = F.col("l_suppkey").bitwiseAND(F.lit(255))
    z = F.lit(0).cast("long")
    for j in range(8):
        z = z + F.shiftrightunsigned(px, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j))
        z = z + F.shiftrightunsigned(sy, j).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * j + 1)
        )
    g = li.select(px.alias("px"), sy.alias("sy"), z.alias("z"))
    return (
        g.groupBy(F.shiftrightunsigned("z", 8).cast("int").alias("file_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("px").cast("int").alias("px_min"),
            F.max("px").cast("int").alias("px_max"),
            F.min("sy").cast("int").alias("sy_min"),
            F.max("sy").cast("int").alias("sy_max"),
        )
    )


@register(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           TRUE AS missing_is_null
    FROM events WHERE event_type = 'purchase'
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access (Spark 4's native JSON
    path, ~8x faster than string re-parsing per field): parse_json
    once in the scan projection, then typed variant_get extraction.
    The variant itself never leaves the query (engine-specific binary
    encoding) — only extracted scalars; the oracle re-derives them
    with DuckDB's JSON functions. try_variant_get of an absent path
    must be NULL, asserted as a boolean so the null-semantics contract
    is hash-checked, not just typed."""
    e = rt(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_value"),
        F.try_variant_get(v, "$.absent_key", "int").isNull().alias("missing_is_null"),
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) l
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the SQL-standard top-N-per-group
    join surface (each customer's 2 largest orders). Catalyst
    decorrelates the LATERAL + LIMIT into a partitioned rank window
    over ONE orders exchange — the same physical plan the explicit
    row_number formulation produces, which is why this stays viable
    when the per-group subquery would naively re-scan orders once per
    customer."""
    rt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) l
        """
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '[0-9]+') AS cust_digits,
           regexp_matches(c_name, '^Customer#') AS is_customer,
           CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
           regexp_replace(c_name, '0+', '#', 'g') AS compressed,
           array_to_string(regexp_extract_all(c_name, '[0-9]{3}'), ',') AS triplets_csv
    FROM customer WHERE c_custkey < 500
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: extract / match / count / global replace /
    extract-all. Two cross-engine contracts pinned here: Spark's
    regexp_replace is global by default while DuckDB needs the
    explicit 'g' flag (a measured round-2 class of oracle bug), and
    extract-all results leave as a joined CSV (never a raw array —
    driver canonicalizer contract)."""
    c = rt(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "[0-9]+", 0).alias("cust_digits"),
        F.col("c_name").rlike("^Customer#").alias("is_customer"),
        F.regexp_count(F.col("c_name"), F.lit("0")).cast("int").alias("n_zeros"),
        F.regexp_replace(F.col("c_name"), "0+", "#").alias("compressed"),
        F.array_join(
            F.regexp_extract_all(F.col("c_name"), F.lit("[0-9]{3}"), 0), ","
        ).alias("triplets_csv"),
    )


@register(
    "scalar_try_functions",
    oracle="""
    SELECT o_orderkey,
           round(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE o_totalprice / (o_orderkey % 3) END, 6) AS safe_ratio,
           TRY_CAST(o_orderpriority AS INT) AS prio_as_int,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
           CAST(NULL AS BIGINT) AS overflow_add
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* ANSI-safe scalar family (Spark 4's graceful-null
    error handling, matching DuckDB TRY_CAST semantics): try_divide by
    a sometimes-zero denominator, try_cast of a non-numeric string
    (NULL, not error — '5-LOW' has no leading-int cast), try_cast of
    its numeric prefix (succeeds), and try_add at bigint overflow
    (NULL; the oracle states the contract as a literal). These are the
    operators that let a 100 TB pipeline survive dirty rows without
    per-row exception handling."""
    o = rt(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3), 6
        ).alias("safe_ratio"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_as_int"),
        F.expr("try_cast(split_part(o_orderpriority, '-', 1) AS INT)").alias(
            "prio_num"
        ),
        F.try_add(F.col("o_orderkey") + 1, F.lit(9223372036854775807)).alias(
            "overflow_add"
        ),
    )


@register(
    "table_stats_profile",
    oracle="""
    SELECT 'l_quantity' AS column_name, count(*) AS n,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
           count(DISTINCT l_quantity) AS ndv,
           round(min(l_quantity), 6) AS min_num, round(max(l_quantity), 6) AS max_num
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           CAST(count(*) - count(l_extendedprice) AS BIGINT),
           count(DISTINCT l_extendedprice),
           round(min(l_extendedprice), 6), round(max(l_extendedprice), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*),
           CAST(count(*) - count(l_returnflag) AS BIGINT),
           count(DISTINCT l_returnflag), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*),
           CAST(count(*) - count(l_shipdate) AS BIGINT),
           count(DISTINCT l_shipdate), NULL, NULL
    FROM lineitem
    """,
)
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiling — the ANALYZE TABLE pass that feeds
    a cost-based optimizer and every data-quality dashboard: per
    column row count / null count / distinct count / numeric min-max.
    All metrics fold in ONE scan of the fact table (a single
    aggregate row, melted to per-column rows afterwards) — the
    n-columns-n-scans formulation this replaces is the naive trap at
    100 TB. Non-numeric min/max stay NULL rather than round-tripping
    engine-specific value rendering. ndv is exact here (oracle
    determinism); the approx_count_distinct swap for wide tables is
    the documented production path (agg_approx_distinct's contract)."""
    li = rt(spark, sf_dir, "lineitem")
    row = li.agg(
        F.count("*").alias("n"),
        *[
            a
            for c in ("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
            for a in (
                (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}_nulls"),
                F.countDistinct(c).alias(f"{c}_ndv"),
            )
        ],
        F.round(F.min("l_quantity"), 6).alias("l_quantity_min"),
        F.round(F.max("l_quantity"), 6).alias("l_quantity_max"),
        F.round(F.min("l_extendedprice"), 6).alias("l_extendedprice_min"),
        F.round(F.max("l_extendedprice"), 6).alias("l_extendedprice_max"),
    )
    return row.selectExpr(
        """stack(4,
             'l_quantity', n, l_quantity_nulls, l_quantity_ndv,
                 l_quantity_min, l_quantity_max,
             'l_extendedprice', n, l_extendedprice_nulls, l_extendedprice_ndv,
                 l_extendedprice_min, l_extendedprice_max,
             'l_returnflag', n, l_returnflag_nulls, l_returnflag_ndv,
                 CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             'l_shipdate', n, l_shipdate_nulls, l_shipdate_ndv,
                 CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           ) AS (column_name, n, n_null, ndv, min_num, max_num)"""
    )


@register(
    "table_quality_checks",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders_status_accepted',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer_name_not_null',
           CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    """,
)
def table_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the dbt-test /
    Deequ shape): key uniqueness, referential integrity (anti-join
    count), accepted values, range, and not-null — one row per check
    with its violation count. ALL plain-aggregate rules over one table
    fold into a SINGLE agg pass melted to rows via stack() — orders is
    scanned once for its two rules, not once per rule — so a 100 TB
    nightly validation costs one aggregate pass per fact table plus
    the one join the referential-integrity rule inherently needs (its
    orders side is a single pruned key column)."""
    o = rt(spark, sf_dir, "orders")
    li = rt(spark, sf_dir, "lineitem")
    c = rt(spark, sf_dir, "customer")

    def melt(agg_df: DataFrame, names: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{n}', `{n}`" for n in names)
        return agg_df.selectExpr(
            f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"
        ).select("check_name", F.col("n_violations").cast("bigint").alias("n_violations"))

    o_rules = melt(
        o.agg(
            (F.count("*") - F.countDistinct("o_orderkey")).alias("orders_pk_unique"),
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ).alias("orders_status_accepted"),
        ),
        ["orders_pk_unique", "orders_status_accepted"],
    )
    checks = [
        o_rules,
        melt(
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count("*").alias("lineitem_fk_orders")),
            ["lineitem_fk_orders"],
        ),
        melt(
            li.agg(
                F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias(
                    "lineitem_qty_positive"
                )
            ),
            ["lineitem_qty_positive"],
        ),
        melt(
            c.agg(
                F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias(
                    "customer_name_not_null"
                )
            ),
            ["customer_name_not_null"],
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS exact_p99,
           TRUE AS p50_within_band,
           TRUE AS p99_within_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the mergeable
    percentile the production path uses when exact percentile state
    would blow task memory. Like agg_approx_distinct, the ESTIMATE is
    engine-specific but the CONTRACT is oracle-checkable: at accuracy
    10000 the sketch guarantees rank error <= n/10000, so the estimate
    must land within the exact p±1% quantile band — asserted as
    booleans next to the exact values.

    The EXACT band values are computed scale-safely by
    ``operators.quantiles.exact_quantiles`` — Spark's exact
    ``percentile`` aggregate buffers every value per group in task
    memory (PercentileBase.update; it OOM'd the round-7 sf10 probe at
    60M rows), so the exact arm is one distributed sort + row_number
    + continuous-rank interpolation instead. Constant memory,
    spillable sort — the shape that survives 100 TB. The GK sketch arm
    is untouched (that one is mergeable by construction)."""
    from mapreduce_word2vec_spark.operators.quantiles import exact_quantiles

    li = rt(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")

    # Arm 1 (single agg pass): mergeable sketches.
    sketch = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("a99"),
    )

    # Arm 2 (sort pass): exact quantiles from bracketing ranks.
    exact = exact_quantiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        {"q49": 0.49, "q50": 0.50, "q51": 0.51, "q98": 0.98, "q99": 0.99, "q100": 1.0},
    )

    return (
        sketch.join(F.broadcast(exact), "l_returnflag")
        .select(
            "l_returnflag",
            F.round(F.col("q50"), 6).alias("exact_p50"),
            F.round(F.col("q99"), 6).alias("exact_p99"),
            ((F.col("a50") >= F.col("q49")) & (F.col("a50") <= F.col("q51"))).alias(
                "p50_within_band"
            ),
            ((F.col("a99") >= F.col("q98")) & (F.col("a99") <= F.col("q100"))).alias(
                "p99_within_band"
            ),
        )
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total_exact,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation — the money-column surface: cast the
    2-dp price to DECIMAL(18,2) and sum WITHOUT float drift (a double
    sum of millions of 2-dp values accumulates ulps; a decimal sum is
    exact by construction, and both engines agree digit for digit).
    The decimal leaves as its canonical string — the pandas round-trip
    coarsens Spark decimals to objects and DuckDB decimals to floats,
    so string form is the only driver-stable carrier of exactness."""
    o = rt(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("total_exact"),
        F.count("*").cast("bigint").alias("n"),
    )


# Shared polynomial hash (functions.text.string_hash_expr ≡ the DuckDB
# list_reduce fold) applied to the hashing-trick featurizer below.
_FH_SQL_STRHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)
_FH_BUCKETS = 64


@register(
    "ml_feature_hash_buckets",
    oracle=f"""
    WITH f AS (
      SELECT c.c_custkey,
             'seg=' || c.c_mktsegment AS f1,
             'nation=' || n.n_name AS f2
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    e AS (
      SELECT c_custkey, f1 AS feat FROM f
      UNION ALL
      SELECT c_custkey, f2 FROM f
    ),
    h AS (
      SELECT CAST({_FH_SQL_STRHASH.format(s="feat")} % {_FH_BUCKETS} AS INT) AS bucket
      FROM e
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_hits
    FROM h GROUP BY bucket
    """,
)
def ml_feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing) — fixed-width featurization
    of unbounded categorical vocabularies: each 'name=value' feature
    string hashes into one of 64 buckets, no vocabulary dictionary to
    build, broadcast, or keep consistent across training runs. Uses
    the engine's shared polynomial hash (NOT murmur3 `hash()`, which
    is engine-private and would be oracle-opaque), so bucket ids are
    reproducible across engines and runs — the property that makes
    hashed features joinable between a Spark trainer and any other
    scorer. Scale shape: pure projection + one bucket-keyed count,
    dimension broadcast by size."""
    from mapreduce_word2vec_spark.functions.text import string_hash_expr

    c = rt(spark, sf_dir, "customer")
    n = rt(spark, sf_dir, "nation")
    f = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.concat(F.lit("seg="), F.col("c_mktsegment")).alias("f1"),
        F.concat(F.lit("nation="), F.col("n_name")).alias("f2"),
    )
    e = f.select("c_custkey", F.col("f1").alias("feat")).unionByName(
        f.select("c_custkey", F.col("f2").alias("feat"))
    )
    bucket = (string_hash_expr(F.col("feat")) % _FH_BUCKETS).cast("int")
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )


@register(
    "join_anti_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a NON-EMPTY result (customers with no URGENT
    orders — every fixture customer has SOME order, so the plain
    no-orders anti-join is empty): the original join_anti
    registration verifies the operator but returns zero rows on this
    data, which makes its driver hash trivially satisfied. This
    variant gives the anti-join family a value-verified member."""
    c = rt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = (
        rt(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "set_except_nonempty",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT with a NON-EMPTY result (customers with open orders but
    no finished ones) — the value-verified companion of set_except,
    whose fixture result is empty."""
    o = rt(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics); exceptAll would keep
    # customers whose O-order count merely exceeds their F-order count.
    return open_c.subtract(fin_c)


@register(
    "cte_recursive_series",
    oracle="""
    WITH RECURSIVE days AS (
      SELECT DATE '1995-01-01' AS day
      UNION ALL
      SELECT day + 1 AS day FROM days WHERE day < DATE '1995-03-31'
    ),
    per_day AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS n, sum(o_totalprice) AS tp
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(coalesce(p.n, 0) AS BIGINT) AS n_orders,
           round(coalesce(p.tp, 0), 6) AS total_price
    FROM days d LEFT JOIN per_day p ON p.day = d.day
    """,
)
def cte_recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``, SPARK-24497): a
    90-day date spine generated by recursion, left-joined to per-day
    order aggregates — the gap-preserving calendar join every
    time-series report needs (days with zero orders still appear).

    Scale shape: the fact scan is filtered at the source (predicate
    on o_orderdate pushes into parquet) and aggregated BEFORE the
    join, so the recursion output (90 rows) joins a bounded per-day
    aggregate, never raw orders. The recursion itself is driver-tiny
    and loop-bounded; at 100 TB only the pre-aggregation shuffles.
    The day is emitted as an ISO string so both engines hash the same
    canonical form."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte_v")
    return spark.sql(
        """
        WITH RECURSIVE days AS (
          SELECT DATE'1995-01-01' AS day
          UNION ALL
          SELECT date_add(day, 1) AS day FROM days WHERE day < DATE'1995-03-31'
        ),
        per_day AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 count(*) AS n, sum(o_totalprice) AS tp
          FROM orders_rcte_v
          WHERE o_orderdate >= TIMESTAMP'1995-01-01'
            AND o_orderdate < TIMESTAMP'1995-04-01'
          GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT CAST(d.day AS STRING) AS day,
               CAST(coalesce(p.n, 0) AS BIGINT) AS n_orders,
               round(coalesce(p.tp, 0), 6) AS total_price
        FROM days d LEFT JOIN per_day p ON p.day = d.day
        """
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 1023 AS band,
           o_orderkey | 255 AS bor,
           xor(o_orderkey, o_orderkey >> 3) AS bxor,
           (o_orderkey & 15) << 4 AS shl,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt,
           CAST(bit_count(o_orderkey) % 2 AS INT) AS parity
    FROM orders
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (&, |, xor, shifts, popcount) — the
    primitives under bitmap indexes, bloom probes, and hash mixing.
    All JVM-side codegen expressions; DuckDB spells xor as a function
    (its ``^`` is exponentiation) but the semantics match bit-for-bit
    on two's-complement int64."""
    o = rt(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 1023").alias("band"),
        F.expr("o_orderkey | 255").alias("bor"),
        F.expr("o_orderkey ^ shiftright(o_orderkey, 3)").alias("bxor"),
        F.expr("shiftleft(o_orderkey & 15, 4)").alias("shl"),
        F.expr("CAST(bit_count(o_orderkey) AS INT)").alias("popcnt"),
        F.expr("CAST(bit_count(o_orderkey) % 2 AS INT)").alias("parity"),
    )


# Bloom filter as data: m bits in m/64 int64 lanes, k=2 independent
# affine hashes mod a prime. Shared-arithmetic (not murmur3) so the
# semantics are engine-checkable; the ORACLE doesn't mimic the bloom
# — it runs the plain semi join, asserting the bloom+verify pipeline
# is *exactly* lossless (no false negatives; false positives removed
# by the verify join).
_BLOOM_P = 1_000_000_007
_BLOOM_M = 8192
_BLOOM_HASHES = ((1_000_003, 12_345), (69_069, 54_321))


@register(
    "join_bloom_semi",
    oracle="""
    SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey
                        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                        WHERE n_name = 'NATION_9')
    GROUP BY yr, mo
    """,
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (Bloom) semi join, built from plain SQL
    expressions: the small side's keys are folded into an 8192-bit
    bloom bitmap (128 int64 lanes, k=2 affine hashes), the bitmap —
    ONE row, ~1 KB — is broadcast across the fact scan as a
    pre-filter, and only the survivors reach the exact semi join.

    This is the shape engines use to cut shuffle input on selective
    joins at 100 TB: the fact side is filtered down near the scan by
    a constant-size structure instead of shuffling every row to the
    join. Here both joins are broadcasts anyway (the dim is small);
    the point is the bitmap pipeline is value-lossless — the oracle
    is the PLAIN semi join, so any false negative or surviving false
    positive hash-fails. bit_or aggregation builds the lanes in one
    partial+final pass; probes are codegen'd shift/AND expressions."""
    sup = rt(spark, sf_dir, "supplier")
    nat = rt(spark, sf_dir, "nation")
    keys = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .where(F.col("n_name") == "NATION_9")
        .select("s_suppkey")
    )

    def bucket(col: str, a: int, b: int) -> str:
        return f"CAST((({col} % {_BLOOM_P}) * {a} + {b}) % {_BLOOM_P} % {_BLOOM_M} AS BIGINT)"

    buckets = keys.select(
        F.explode(
            F.array(*[F.expr(bucket("s_suppkey", a, b)) for a, b in _BLOOM_HASHES])
        ).alias("bkt")
    )
    bitmap = (
        buckets.select(
            F.expr("CAST(bkt / 64 AS INT)").alias("lane"),
            F.expr("shiftleft(1L, CAST(bkt % 64 AS INT))").alias("bit"),
        )
        .groupBy("lane")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("lane", "bits"))).alias("bm"))
    )

    li = rt(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    probed = li.join(F.broadcast(bitmap))  # 1-row broadcast cross join
    hit = None
    for a, b in _BLOOM_HASHES:
        bkt = bucket("l_suppkey", a, b)
        cond = F.expr(
            f"(coalesce(element_at(bm, CAST(({bkt}) / 64 AS INT)), 0L)"
            f" & shiftleft(1L, CAST(({bkt}) % 64 AS INT))) != 0"
        )
        hit = cond if hit is None else (hit & cond)
    survivors = probed.where(hit).drop("bm")
    exact = survivors.join(F.broadcast(keys), survivors.l_suppkey == keys.s_suppkey, "left_semi")
    return exact.groupBy(
        F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mo")
    ).agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"),
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a customer appearing 3 times
    among open orders and 2 times among finished ones appears
    min(3,2)=2 times. Catalyst plans the multiplicity bookkeeping as
    a partial-aggregated count join, not a distinct; the DISTINCT
    twin (set_intersect) would collapse these."""
    o = rt(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersectAll(fin_c)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag subtraction: multiplicity max(n_open - n_fin,
    0) per customer, the form that answers 'how many MORE open than
    finished orders' where EXCEPT DISTINCT only answers set
    membership."""
    o = rt(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.exceptAll(fin_c)


@register(
    "subquery_not_in_nulls",
    oracle="""
    SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
      FROM orders)
    UNION ALL
    SELECT 'not_exists' AS variant, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE (CASE WHEN o.o_orderkey % 97 = 0 THEN NULL ELSE o.o_custkey END)
            = c.c_custkey)
    """,
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — ANSI three-valued logic's
    most-shipped production bug, pinned as a query: the subquery list
    contains NULLs (every 97th order contributes one), so NOT IN is
    never TRUE and returns ZERO customers, while the NOT EXISTS twin
    ignores the NULLs and returns the real complement. Both engines
    agree exactly.

    Plan note: Spark compiles the NOT IN into a null-aware anti join
    (a dedicated join mode — not expressible as a plain LeftAnti),
    asserted in test_plans. At scale prefer NOT EXISTS: NAAJ must
    broadcast the whole subquery result to every task."""
    rt(spark, sf_dir, "customer").createOrReplaceTempView("cust_nin_v")
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_nin_v")
    return spark.sql(
        """
        SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n_customers
        FROM cust_nin_v
        WHERE c_custkey NOT IN (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
          FROM orders_nin_v)
        UNION ALL
        SELECT 'not_exists' AS variant, CAST(count(*) AS BIGINT) AS n_customers
        FROM cust_nin_v c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders_nin_v o
          WHERE (CASE WHEN o.o_orderkey % 97 = 0 THEN NULL ELSE o.o_custkey END)
                = c.c_custkey)
        """
    )


@register(
    "observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(o_totalprice), 6) AS sum_price,
           CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM orders
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``df.observe`` + the noop sink: the
    metrics (row count, revenue total, big-order count) are collected
    as ACCUMULATORS DURING the pass — piggybacking the job instead of
    paying a second scan, which is how a 100 TB ingest reports
    data-quality counters without doubling its I/O. The observed
    values are then surfaced as a 1-row DataFrame; the oracle
    recomputes them declaratively, so the accumulator path is
    value-checked against the aggregation path."""
    from pyspark.sql import Observation

    o = rt(spark, sf_dir, "orders")
    obs = Observation("ingest_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        F.count(F.when(F.col("o_totalprice") > 300000, 1)).alias("n_big"),
    )
    # The noop sink drives the pass (full scan, zero output); obs.get
    # blocks until the job's metrics arrive.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), float(m["sum_price"]), int(m["n_big"]))],
        "n_rows bigint, sum_price double, n_big bigint",
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT s_suppkey,
                      CASE WHEN s_nationkey % 7 = 0 THEN NULL
                           ELSE s_nationkey % 5 END AS grp
               FROM supplier),
         r AS (SELECT CASE WHEN n_nationkey % 7 = 0 THEN NULL
                           ELSE n_nationkey % 5 END AS grp,
                      count(*) AS n_nations
               FROM nation GROUP BY 1)
    SELECT l.s_suppkey, l.grp, CAST(r.n_nations AS BIGINT) AS n_nations
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` ≡ SQL IS NOT DISTINCT
    FROM): NULL keys MATCH each other instead of vanishing — the
    semantics needed when NULL is a legitimate group ('unknown
    bucket') rather than absence. A plain equi-join silently drops
    every NULL-keyed row from both sides; pinned here with NULL
    groups manufactured on both inputs. Still hash-partitionable
    (NULLs co-locate like any other key), so the join stays a
    broadcast/hash join, not a nested loop."""
    sup = rt(spark, sf_dir, "supplier")
    nat = rt(spark, sf_dir, "nation")
    grp_l = F.when(F.col("s_nationkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("s_nationkey") % 5
    )
    grp_r = F.when(F.col("n_nationkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("n_nationkey") % 5
    )
    l = sup.select("s_suppkey", grp_l.alias("grp"))
    r = (
        nat.select(grp_r.alias("grp"))
        .groupBy("grp")
        .agg(F.count("*").cast("bigint").alias("n_nations"))
    )
    return l.join(F.broadcast(r), l.grp.eqNullSafe(r.grp)).select(
        "s_suppkey", l.grp.alias("grp"), "n_nations"
    )


@register(
    "agg_percentile_within_group",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_cont,
           round(quantile_disc(o_totalprice, 0.5), 6) AS median_disc,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90_cont
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI inverse-distribution functions (``PERCENTILE_CONT`` /
    ``PERCENTILE_DISC ... WITHIN GROUP``): the standard-SQL spelling
    of exact quantiles, with the cont/disc distinction pinned —
    CONT interpolates between the two straddling rows, DISC returns
    an actual data value (the first with cumulative distribution ≥
    p). Exact quantiles sort within groups; at 100 TB prefer
    approx_percentile (the sketch contract is registered as
    agg_approx_percentile) unless bit-exactness is required."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_pwg_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
                 AS median_cont,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
                 AS median_disc,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6)
                 AS p90_cont
        FROM orders_pwg_v GROUP BY o_orderpriority
        """
    )


@register(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com:8443/corpus/' ||
             lang || '/doc-' || CAST(doc_id AS VARCHAR) ||
             '?page=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=feed#frag' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM u
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with ``parse_url`` — protocol, host, path,
    a single query parameter, and the fragment — the canonicalization
    primitive under web-crawl dedup (strip tracking params, group by
    host). URLs are synthesized deterministically from document
    attributes so the oracle (pure regexp decomposition in DuckDB)
    sees identical inputs; parse_url's HOST excludes the port, which
    the oracle regexp mirrors by stopping at ':'."""
    d = rt(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com:8443/corpus/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?page="), (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=feed#frag"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias("page_param"),
        F.parse_url(F.col("url"), F.lit("REF")).alias("fragment"),
    )


@register(
    "table_ctas_insert",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def table_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-table DDL surface: CREATE TABLE AS SELECT the even
    nations into the session catalog (parquet under the warehouse
    dir), INSERT INTO the odd ones, read the table back by NAME via
    the catalog — the create/append lifecycle of every curated lake
    table, exercised through SQL DDL rather than path-based IO. The
    oracle is the reunited source table, so CTAS + INSERT must be
    exactly additive (no dropped or doubled rows)."""
    import os
    import shutil
    from urllib.parse import urlparse

    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    tbl = f"nation_ctas_{tag}"
    rt(spark, sf_dir, "nation").createOrReplaceTempView("nation_ctas_src")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # A DROP in a fresh session can't see a previous process's catalog
    # entry, but the managed LOCATION survives on disk and would fail
    # the CTAS with LOCATION_ALREADY_EXISTS — purge the stale dir.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        shutil.rmtree(os.path.join(wh.path, tbl.lower()), ignore_errors=True)
    spark.sql(
        f"""CREATE TABLE {tbl} USING parquet AS
            SELECT n_nationkey, n_name, n_regionkey
            FROM nation_ctas_src WHERE n_nationkey % 2 = 0"""
    )
    spark.sql(
        f"""INSERT INTO {tbl}
            SELECT n_nationkey, n_name, n_regionkey
            FROM nation_ctas_src WHERE n_nationkey % 2 = 1"""
    )
    return spark.table(tbl)


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-control surface: the SHUFFLE_HASH hint forces a
    ShuffledHashJoin where Catalyst would default to sort-merge —
    the right call when one side is far smaller than the other but
    too big to broadcast (hash-table build beats sorting BOTH sides;
    no sort spill). Plan-asserted in test_plans; the hint changes
    the physical strategy, never the result (same oracle as the
    unhinted join would have)."""
    li = rt(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = rt(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    # DECIMAL accumulation: a double sum over ~12k rows is
    # summation-order-dependent at the last ulp and hash-diverges
    # across engines; exact decimal is order-independent.
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_price"),
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 6) AS total
    FROM orders
    WHERE o_totalprice > 250000 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named-parameter binding): the
    injection-safe query-template surface — values bind as TYPED
    literals through the parser, never string-spliced, so a
    user-supplied threshold can't alter query structure. Constant
    folding and filter pushdown see the bound literal exactly as if
    it were inlined (pushdown asserted via the same plan checks as
    the static twin)."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 6) AS total
        FROM orders_param_v
        WHERE o_totalprice > :minp AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"minp": 250000, "status": "O"},
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (the ClickHouse/Doris
    bitmap-index technique): each user_id becomes one bit
    (lane=id>>6, bit=id&63), lanes merge with ``bit_or`` — an
    associative, fixed-width partial aggregate — and the distinct
    count is the popcount sum. Two bounded exchanges: (type, lane)
    partials, then per-type popcount rollup whose cardinality is
    |types|·⌈domain/64⌉ regardless of event volume.

    vs the alternatives: count(DISTINCT) shuffles every distinct
    (type, user) pair; HLL (agg_approx_distinct) is fixed-size but
    approximate. Bitmaps are BOTH exact and mergeable when the id
    domain is dense/bounded — precomputed per-segment bitmaps also
    answer audience intersections (AND) and unions (OR) without
    touching rows. The oracle is the plain count(DISTINCT), so the
    whole bit pipeline must be lossless."""
    ev = rt(spark, sf_dir, "events").select("event_type", "user_id")
    lanes = (
        ev.select(
            "event_type",
            F.shiftright(F.col("user_id"), 6).alias("lane"),
            F.expr("shiftleft(1L, CAST(user_id & 63 AS INT))").alias("bit"),
        )
        .groupBy("event_type", "lane")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    counts = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_events"))
    users = lanes.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )
    return users.join(counts, "event_type").select("event_type", "n_users", "n_events")


@register(
    "agg_listagg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
           CAST(count(*) AS BIGINT) AS n_supp
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 ``LISTAGG ... WITHIN
    GROUP``, SPARK-42746 — ANSI's spelling of string_agg): supplier
    names concatenated in explicit sort order per nation. The WITHIN
    GROUP ordering is what makes the result deterministic and
    hash-comparable — a bare collect_list+concat_ws inherits
    partition arrival order and would flap across runs/engines."""
    sup = rt(spark, sf_dir, "supplier")
    nat = rt(spark, sf_dir, "nation")
    j = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
    j.createOrReplaceTempView("supp_nation_la_v")
    return spark.sql(
        """
        SELECT n_name,
               listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name) AS suppliers,
               CAST(count(*) AS BIGINT) AS n_supp
        FROM supp_nation_la_v GROUP BY n_name
        """
    )


@register(
    "scalar_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT min(lower(seg)) AS segment, CAST(count(*) AS BIGINT) AS n
    FROM mixed GROUP BY lower(seg)
    """,
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): market segments
    with manufactured mixed case grouped under ``COLLATE UTF8_LCASE``
    — comparison semantics live in the TYPE, not in per-row lower()
    wrapping. At scale collated grouping lets the optimizer keep
    pushdown/statistics on the original column where a lower()
    expression would opaque them; the oracle reproduces the grouping
    with explicit lower() (DuckDB's engine-level equivalent), so the
    collation must match case-folding exactly."""
    c = rt(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    mixed.createOrReplaceTempView("mixed_coll_v")
    return spark.sql(
        """
        SELECT min(lower(seg)) AS segment, CAST(count(*) AS BIGINT) AS n
        FROM mixed_coll_v GROUP BY seg COLLATE UTF8_LCASE
        """
    )


@register(
    "events_sliding_distinct_bitmap",
    oracle="""
    WITH w AS (
      SELECT CAST(time_bucket(INTERVAL '2 hours', ts) AS TIMESTAMP)
               - k * INTERVAL '2 hours' AS window_start,
             user_id
      FROM events CROSS JOIN (VALUES (0), (1), (2)) t(k)
    )
    SELECT window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w GROUP BY window_start
    """,
)
def events_sliding_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window EXACT distinct users (6h windows, 2h slide) via
    bitmap merge — the composition that makes agg_bitmap_distinct's
    mergeability claim concrete: each event sets one bit in its
    window's (lane, bit) grid, lanes bit_or-merge associatively, and
    the per-window count is a popcount sum. Shuffle cardinality is
    |windows|·⌈domain/64⌉ — NOT |windows|·|distinct users| as
    count(DISTINCT)'s expand would be, and exact, unlike
    approx_count_distinct. Spark's native window() assigns each
    event its 3 containing windows; the oracle reproduces that with
    three shifted 2h tumbling grids."""
    ev = rt(spark, sf_dir, "events").select("ts", "user_id")
    win = F.window("ts", "6 hours", "2 hours")
    lanes = (
        ev.select(
            win["start"].alias("window_start"),
            F.shiftright(F.col("user_id"), 6).alias("lane"),
            F.expr("shiftleft(1L, CAST(user_id & 63 AS INT))").alias("bit"),
        )
        .groupBy("window_start", "lane")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return lanes.groupBy("window_start").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )


@register(
    "agg_hll_union_sketch",
    oracle="""
    WITH per_type AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type
    ),
    total AS (
      SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS exact_users
      FROM events
    )
    SELECT event_type, CAST(exact_users AS BIGINT) AS exact_users,
           true AS est_ok
    FROM (SELECT * FROM per_type UNION ALL SELECT * FROM total)
    """,
)
def agg_hll_union_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL (Spark 3.5 ``hll_sketch_agg`` /
    ``hll_union_agg`` / ``hll_sketch_estimate``): per-type sketches
    built once, then UNIONED — without rescanning — into the global
    cardinality. Mergeability is the operational point: at 100 TB you
    persist per-partition/per-day sketches (KBs each) and answer any
    rollup by sketch union, never touching rows again. Contract
    oracle (sketch bytes are implementation-defined): exact distinct
    count + a 5%-relative-error boolean per row, deterministic for
    fixed input and default lgConfigK."""
    ev = rt(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").cast("bigint").alias("exact_users"),
    )
    total = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    g_exact = ev.agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    per_rows = per_type.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_ok"),
    )
    all_row = g_exact.crossJoin(total).select(
        F.lit("ALL").alias("event_type"),
        "exact_users",
        (F.abs(F.col("est") - F.col("exact_users")) <= 0.05 * F.col("exact_users")).alias(
            "est_ok"
        ),
    )
    return per_rows.unionByName(all_row)


@register(
    "scalar_xpath",
    oracle="""
    SELECT s_suppkey,
           s_name AS name_out,
           CAST(s_nationkey AS INT) AS nation_out,
           CAST(length(s_name) AS INT) AS name_len
    FROM supplier
    """,
)
def scalar_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction (`xpath_string`/`xpath_int` over inline XML)
    — the per-row companion of the XML FileFormat: feeds that arrive
    as XML-in-a-column (SOAP payloads, config blobs) are parsed with
    XPath expressions without a file-level scan. The XML is
    synthesized from the row's own columns, so extraction must be an
    exact identity round-trip against the parquet oracle (XML escape
    + parse + XPath = id on this alphanumeric data)."""
    sup = rt(spark, sf_dir, "supplier")
    xml = F.concat(
        F.lit("<supplier><name>"), F.col("s_name"),
        F.lit("</name><nation>"), F.col("s_nationkey").cast("string"),
        F.lit("</nation></supplier>"),
    )
    withx = sup.select("s_suppkey", xml.alias("x"))
    return withx.select(
        "s_suppkey",
        F.expr("xpath_string(x, '/supplier/name')").alias("name_out"),
        F.expr("xpath_int(x, '/supplier/nation')").alias("nation_out"),
        F.expr("CAST(length(xpath_string(x, '/supplier/name')) AS INT)").alias("name_len"),
    )


@register(
    "grouping_id_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags over ROLLUP — the only reliable way to tell a
    subtotal row from a genuine NULL group (coalescing the key to a
    sentinel is ambiguous the day a real '(all)' value arrives; the
    flag is not). Both engines implement the ANSI semantics: 1 when
    the column is rolled up, 0 when grouped."""
    li = rt(spark, sf_dir, "lineitem")
    rolled = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )
    return rolled.select(
        F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
        F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
        "g_rf",
        "g_ls",
        "n",
    )


_EWMA_ALPHA = 0.3
_EWMA_K = 10


@register(
    "events_ewma",
    oracle=f"""
    WITH o AS (
      SELECT event_type, ts, event_id, value,
             {" ,".join(f"lag(value, {k}) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x{k}" for k in range(1, _EWMA_K))}
      FROM events
    )
    SELECT event_type, event_id,
           round(
             ({" + ".join(f"coalesce({_EWMA_ALPHA} * power({1 - _EWMA_ALPHA}, {k}) * x{k}, 0)" for k in range(1, _EWMA_K))}
              + {_EWMA_ALPHA} * value)
             /
             ({" + ".join(f"CASE WHEN x{k} IS NOT NULL THEN {_EWMA_ALPHA} * power({1 - _EWMA_ALPHA}, {k}) ELSE 0 END" for k in range(1, _EWMA_K))}
              + {_EWMA_ALPHA}), 6) AS ewma
    FROM o
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (span-limited to the
    last 10 observations) per event type — the standard smoother
    for noisy operational metrics. The recursion is unrolled into an
    explicit lag-weighted sum with per-row renormalization over the
    PRESENT terms (series heads don't damp toward zero), which makes
    the value a closed form over a bounded window: deterministic,
    engine-identical, and one partition-ordered exchange — the
    infinite-history recursive form would need sequential state.
    Total order (ts, event_id) pins ties."""

    ev = rt(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    a, b = _EWMA_ALPHA, 1 - _EWMA_ALPHA
    num = F.lit(a) * F.col("value")
    den = F.lit(a)
    cur = ev
    for k in range(1, _EWMA_K):
        xk = F.lag("value", k).over(w)
        cur = cur.withColumn(f"_x{k}", xk)
    for k in range(1, _EWMA_K):
        xk = F.col(f"_x{k}")
        wk = a * (b ** k)
        num = num + F.coalesce(F.lit(wk) * xk, F.lit(0.0))
        den = den + F.when(xk.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
    return cur.select(
        "event_type", "event_id", F.round(num / den, 6).alias("ewma")
    )


_LR_ITERS = 3
_LR_RATE = 0.5


@register(
    "ml_logreg_gd",
    oracle=f"""
    WITH d AS (
      SELECT l_quantity / 50.0 AS x1, l_discount * 10.0 AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      FROM lineitem
    ),
    i0(w0, w1, w2) AS (VALUES (0.0, 0.0, 0.0)),
    {", ".join(f'''
    g{k} AS (
      SELECT avg((1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) * 1.0) AS g0,
             avg((1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) * x1) AS g1,
             avg((1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) * x2) AS g2
      FROM d CROSS JOIN i{k - 1}
    ),
    i{k}(w0, w1, w2) AS (
      SELECT floor((w0 - {_LR_RATE} * g0) * 1e6 + 0.5) / 1e6,
             floor((w1 - {_LR_RATE} * g1) * 1e6 + 0.5) / 1e6,
             floor((w2 - {_LR_RATE} * g2) * 1e6 + 0.5) / 1e6
      FROM i{k - 1} CROSS JOIN g{k}
    )''' for k in range(1, _LR_ITERS + 1))}
    SELECT w0, w1, w2,
           (SELECT round(avg(CASE WHEN (1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) > 0.5)
                                       = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6)
            FROM d CROSS JOIN i{_LR_ITERS}) AS train_acc
    FROM i{_LR_ITERS}
    """,
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An ITERATIVE ML training loop under a full value oracle:
    3 unrolled batch-gradient-descent steps of logistic regression
    (predicting return flags from quantity/discount features), the
    oracle replaying the identical recurrence as chained CTEs.

    The determinism contract that makes a float training loop
    hash-comparable across engines: weights are QUANTIZED to 1e-6
    (explicit half-up: floor(x*1e6+0.5)/1e6) AFTER EVERY STEP, so
    per-step last-ulp noise (libm exp(), double-sum order) and
    round()-tie-break divergence are quenched before they compound
    — the same re-synchronization trick as the engine's decimal
    accumulations, applied to a recurrence.

    Scale shape: the model (3 doubles) lives on the driver and
    enters each pass as literals; every iteration is one partial-
    aggregated scan (gradients = 3 averages), data never shuffles,
    state never exceeds the model. This IS the distributed-training
    loop pattern (parameter broadcast + gradient all-reduce) in
    DataFrame form; k passes = k scans, cacheable at will."""
    import math

    li = rt(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        (F.col("l_discount") * 10.0).alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    w = [0.0, 0.0, 0.0]
    for _ in range(_LR_ITERS):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        p = 1.0 / (1.0 + F.exp(-z))
        err = p - F.col("y")
        g = d.agg(
            F.avg(err).alias("g0"),
            F.avg(err * F.col("x1")).alias("g1"),
            F.avg(err * F.col("x2")).alias("g2"),
        ).collect()[0]
        # Explicit half-up quantization (floor(x*1e6 + 0.5)/1e6), NOT
        # round(): engines tie-break round() differently when the
        # accumulated gradient lands exactly on a 1e-6 boundary
        # (observed at sf0.1), and floor is IEEE-exact in both.
        w = [
            math.floor((w[j] - _LR_RATE * g[f"g{j}"]) * 1e6 + 0.5) / 1e6
            for j in range(3)
        ]
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    acc = d.agg(
        F.round(
            F.avg(
                F.when(
                    ((1.0 / (1.0 + F.exp(-z))) > 0.5) == (F.col("y") == 1.0), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("train_acc")
    )
    return acc.select(
        F.lit(w[0]).alias("w0"), F.lit(w[1]).alias("w1"), F.lit(w[2]).alias("w2"),
        "train_acc",
    )


@register(
    "events_equidepth_histogram",
    oracle="""
    WITH t AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi
    FROM t GROUP BY bucket
    """,
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram via NTILE(10) — the
    statistics shape query optimizers keep per column (bucket
    boundaries adapt to skew where equi-width buckets collapse into
    one hot bin). Tie order pinned by (value, event_id) so bucket
    assignment is total. Scale note: ntile needs a GLOBAL ordering —
    fine for stats builds which sample first (ANALYZE samples, then
    sorts the sample); for full-data quantiles at 100 TB use
    approx_percentile (registered) instead of a global sort."""
    ev = rt(spark, sf_dir, "events")

    w = Window.orderBy("value", "event_id")
    t = ev.select("value", F.ntile(10).over(w).alias("bucket"))
    return t.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "ml_linreg_normal",
    oracle="""
    WITH d AS (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    s AS (
      SELECT count(*) * 1.0 AS n, round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
             round(sum(x * x), 6) AS sxx, round(sum(x * y), 6) AS sxy
      FROM d
    )
    SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           CAST(n AS BIGINT) AS n_rows
    FROM s
    """,
)
def ml_linreg_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear regression via the normal equations — the
    one-pass counterpart of ml_logreg_gd's iterative loop: ONE
    partial-aggregated scan collects the sufficient statistics
    (n, Σx, Σy, Σx², Σxy) and the fit is driver-side arithmetic.
    This is how you fit linear models at 100 TB: the data reduces to
    five numbers map-side; nothing iterates, nothing shuffles beyond
    one 1-row aggregate. Sums are quantized at 1e-6 BEFORE the solve
    on both engines, so double-summation-order noise can't leak
    through the division."""
    li = rt(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))
    s = d.agg(
        (F.count("*") * 1.0).alias("n"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


@register(
    "events_ab_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) * 1.0 AS n,
             round(avg(value), 6) AS m,
             round(var_samp(value), 6) AS v
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY event_type
    ),
    a AS (SELECT n, m, v FROM g WHERE event_type = 'view'),
    b AS (SELECT n, m, v FROM g WHERE event_type = 'click')
    SELECT round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
           round(pow(a.v / a.n + b.v / b.n, 2) /
                 (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)),
                 2) AS welch_dof
    FROM a CROSS JOIN b
    """,
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between event populations — the
    experiment-analysis primitive (unequal variances, unequal n).
    Group moments (mean, sample variance) reduce map-side and are
    quantized at 1e-6 before the test statistic is formed, so the
    t-stat and Welch–Satterthwaite dof are engine-identical closed
    forms over six numbers. At any scale the shuffle carries two
    rows."""
    ev = rt(spark, sf_dir, "events").where(F.col("event_type").isin("view", "click"))
    g = ev.groupBy("event_type").agg(
        (F.count("*") * 1.0).alias("n"),
        F.round(F.avg("value"), 6).alias("m"),
        F.round(F.var_samp("value"), 6).alias("v"),
    )
    a = g.where(F.col("event_type") == "view").select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = g.where(F.col("event_type") == "click").select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    j = a.crossJoin(b)
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    return j.select(
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b), 4).alias("t_stat"),
        F.round(
            F.pow(se2a + se2b, 2)
            / (F.pow(se2a, 2) / (F.col("na") - 1) + F.pow(se2b, 2) / (F.col("nb") - 1)),
            2,
        ).alias("welch_dof"),
    )


@register(
    "orders_gini_coefficient",
    oracle="""
    WITH c AS (
      SELECT o_custkey, round(sum(o_totalprice), 6) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS rk,
             count(*) OVER () * 1.0 AS n
      FROM c
    )
    SELECT round((2.0 * sum(rk * rev) / (n * sum(rev)) - (n + 1) / n), 6) AS gini,
           CAST(n AS BIGINT) AS n_customers
    FROM r GROUP BY n
    """,
)
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (the
    rank-weighted closed form) — the inequality KPI behind 'top 1% of
    customers drive X%' dashboards and the skew diagnostic for
    partition-key choices. Ranks run over the CUSTOMER aggregate
    (bounded), ties pinned by custkey; per-customer revenue is
    quantized before ranking so rank order itself is engine-stable.
    companion of supplier_concentration_hhi (HHI measures the same
    concentration without needing a global rank)."""
    o = rt(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))

    rk = F.row_number().over(Window.orderBy("rev", "o_custkey"))
    n = F.count("*").over(Window.partitionBy()) * 1.0
    r = c.select("rev", rk.alias("rk"), n.alias("n"))
    return r.groupBy("n").agg(
        F.round(
            2.0 * F.sum(F.col("rk") * F.col("rev")) / (F.col("n") * F.sum("rev"))
            - (F.col("n") + 1) / F.col("n"),
            6,
        ).alias("gini"),
        F.col("n").cast("bigint").alias("n_customers"),
    ).select("gini", "n_customers")


@register(
    "scalar_surrogate_uuid",
    oracle="""
    WITH h AS (
      SELECT o_orderkey, md5('ord|' || CAST(o_orderkey AS VARCHAR) || '|'
                             || CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders
    )
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' || substr(hx, 13, 4)
             || '-' || substr(hx, 17, 4) || '-' || substr(hx, 21, 12) AS surrogate_id
    FROM h
    """,
)
def scalar_surrogate_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys: md5 over the natural key,
    formatted as a canonical UUID string — the idempotent-pipeline
    pattern (rerunning an ingest mints the SAME ids, so downstream
    joins and upserts converge instead of duplicating; contrast
    uuid()/monotonically_increasing_id, which are run-dependent and
    make retries non-idempotent). Pure codegen expressions; content-
    derived ids also shard uniformly by construction."""
    o = rt(spark, sf_dir, "orders")
    hx = F.md5(
        F.concat(
            F.lit("ord|"),
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            F.col("o_custkey").cast("string"),
        )
    )
    h = o.select("o_orderkey", hx.alias("hx"))
    return h.select(
        "o_orderkey",
        F.concat_ws(
            "-",
            F.substring("hx", 1, 8),
            F.substring("hx", 9, 4),
            F.substring("hx", 13, 4),
            F.substring("hx", 17, 4),
            F.substring("hx", 21, 12),
        ).alias("surrogate_id"),
    )


_IOV_BIN_US = 3_600_000_000  # 1-hour bins


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS t0, epoch_us(ts) + 1800000000 AS t1
      FROM events WHERE event_type = 'view'
    ),
    e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t0, epoch_us(ts) + 900000000 AS t1
      FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, s.event_id AS view_id, e.event_id AS error_id,
           CAST(floor((least(s.t1, e.t1) - greatest(s.t0, e.t0)) / 1000000) AS BIGINT)
             AS overlap_sec
    FROM s JOIN e
      ON s.user_id = e.user_id AND s.t0 < e.t1 AND e.t0 < s.t1
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: 30-min view sessions x 15-min error
    windows per user, emitting each overlapping pair with its overlap
    duration — the temporal-conflict primitive (incident attribution,
    meeting clashes, co-occurrence of states).

    Plan shape for 100 TB: each interval explodes to its covered
    1-hour BINS (bounded by interval/bin ratio), the join runs as an
    EQUI-join on (user_id, bin) — hash-partitionable, no
    BroadcastNestedLoopJoin — the true overlap predicate rides as a
    residual filter, and bin-duplicated pairs dedup on (ids) before
    the duration projection. Same binning discipline as join_range,
    extended to interval x interval."""
    ev = rt(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))

    def intervals(kind: str, dur_us: int, idc: str):
        return ev.where(F.col("event_type") == kind).select(
            "user_id",
            F.col("event_id").alias(idc),
            us.alias(f"{idc}_t0"),
            (us + dur_us).alias(f"{idc}_t1"),
        )

    s = intervals("view", 1_800_000_000, "view_id")
    e = intervals("error", 900_000_000, "error_id")

    def binned(df, idc):
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    (F.col(f"{idc}_t0") / _IOV_BIN_US).cast("long"),
                    # t1 exclusive: a closed-open interval touching the
                    # next bin boundary doesn't occupy that bin
                    ((F.col(f"{idc}_t1") - 1) / _IOV_BIN_US).cast("long"),
                )
            ),
        )
    sb = binned(s, "view_id")
    eb = binned(e, "error_id")
    pairs = sb.join(eb, ["user_id", "bin"]).where(
        (F.col("view_id_t0") < F.col("error_id_t1"))
        & (F.col("error_id_t0") < F.col("view_id_t1"))
    )
    dedup = pairs.dropDuplicates(["user_id", "view_id", "error_id"])
    return dedup.select(
        "user_id",
        "view_id",
        "error_id",
        # floor() explicitly on BOTH sides: DuckDB's double->BIGINT
        # cast ROUNDS where Spark's truncates.
        F.floor(
            (
                F.least("view_id_t1", "error_id_t1")
                - F.greatest("view_id_t0", "error_id_t0")
            )
            / 1_000_000
        )
        .cast("bigint")
        .alias("overlap_sec"),
    )


@register(
    "orders_trend_forecast",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS t,
             round(sum(o_totalprice), 6) AS rev
      FROM orders GROUP BY o_orderpriority, t
    ),
    s AS (
      SELECT o_orderpriority, count(*) * 1.0 AS n,
             round(sum(t), 6) AS sx, round(sum(rev), 6) AS sy,
             round(sum(t * t), 6) AS sxx, round(sum(t * rev), 6) AS sxy,
             max(t) AS tmax
      FROM m GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (tmax + 1), 6)
             AS next_month_forecast
    FROM s
    """,
)
def orders_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group trend forecasting: monthly revenue per priority →
    least-squares trend PER GROUP via grouped sufficient statistics
    (ml_linreg_normal's one-pass pattern, vectorized across groups —
    no per-group driver loop, no MLlib per-model fit) → extrapolated
    next-month forecast. This is how you fit a million tiny models at
    100 TB: the group-by computes every model's five statistics in
    one shuffle of group-sized rows; the solve is a projection.
    Monthly sums and stats quantized 1e-6 so the closed form is
    engine-identical."""
    o = rt(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_orderpriority",
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).alias("t"),
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    s = m.groupBy("o_orderpriority").agg(
        (F.count("*") * 1.0).alias("n"),
        F.round(F.sum("t"), 6).alias("sx"),
        F.round(F.sum("rev"), 6).alias("sy"),
        F.round(F.sum(F.col("t") * F.col("t")), 6).alias("sxx"),
        F.round(F.sum(F.col("t") * F.col("rev")), 6).alias("sxy"),
        F.max("t").alias("tmax"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "o_orderpriority",
        F.round(slope, 6).alias("slope"),
        F.round(intercept + slope * (F.col("tmax") + 1), 6).alias("next_month_forecast"),
    )


@register(
    "orders_lorenz_curve",
    oracle="""
    WITH c AS (
      SELECT o_custkey, round(sum(o_totalprice), 6) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM c
    ),
    d AS (
      SELECT decile, sum(rev) AS drev, count(*) AS n FROM r GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile, CAST(n AS BIGINT) AS n_customers,
           round(sum(drev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 / sum(drev) OVER (), 6) AS cum_rev_share
    FROM d
    """,
)
def orders_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue (cumulative share by revenue
    decile) — the distribution view of orders_gini_coefficient's
    scalar: reads directly as 'the bottom 50% of customers hold X% of
    revenue'. Curve windows run over TEN decile aggregates, not
    customers; the only customer-cardinality step is the ntile rank
    over the bounded per-customer aggregate (ties custkey-pinned)."""
    o = rt(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))

    r = c.select(
        "rev", F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile")
    )
    d = r.groupBy("decile").agg(F.sum("rev").alias("drev"), F.count("*").alias("n"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(F.sum("drev").over(wc) / F.sum("drev").over(wall), 6).alias(
            "cum_rev_share"
        ),
    )


@register(
    "scalar_ipv4_octets",
    oracle="""
    WITH ip AS (
      SELECT o_orderkey, ((o_orderkey % 4294967296) * 1327217885) % 4294967296 AS addr
      FROM orders
    )
    SELECT CAST(addr // 16777216 AS INT) AS oct1,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT (addr // 65536) % 256) AS BIGINT) AS n_oct2,
           min(CAST(addr // 16777216 AS VARCHAR) || '.' ||
               CAST((addr // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((addr // 256) % 256 AS VARCHAR) || '.' ||
               CAST(addr % 256 AS VARCHAR)) AS sample_ip
    FROM ip
    GROUP BY oct1
    """,
)
def scalar_ipv4_octets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 decomposition and /16-prefix rollup over synthesized
    addresses (Knuth-hash of the order key into 32-bit space) — the
    network-log analytic shape: octet extraction is pure integer
    div/mod (no inet type needed), prefix aggregation groups traffic
    by subnet (/8 here so even the small fixture yields dense,
    value-verified groups; identical shape at /16 or /24),
    dotted-quad rendering is string math. All codegen; the prefix
    keyspace is bounded (256..65536 groups) at any log volume."""
    o = rt(spark, sf_dir, "orders")
    # 31-bit multiplier over the 32-bit-folded key (functions/
    # hashing.py): a 32-bit constant would overflow int64 once
    # o_orderkey exceeds ~3.47e9 (TPC-H sf ~580+) — DuckDB raises,
    # Spark wraps silently.
    addr = ((F.col("o_orderkey") % 4294967296) * 1327217885) % F.lit(4294967296)
    ip = o.select("o_orderkey", addr.alias("addr"))
    dq = F.concat_ws(
        ".",
        F.expr("CAST(addr div 16777216 AS STRING)"),
        F.expr("CAST((addr div 65536) % 256 AS STRING)"),
        F.expr("CAST((addr div 256) % 256 AS STRING)"),
        F.expr("CAST(addr % 256 AS STRING)"),
    )
    g = ip.select(
        F.expr("CAST(addr div 16777216 AS INT)").alias("oct1"),
        F.expr("CAST((addr div 65536) % 256 AS INT)").alias("oct2"),
        dq.alias("dotted"),
    )
    return g.groupBy("oct1").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_distinct("oct2").cast("bigint").alias("n_oct2"),
        F.min("dotted").alias("sample_ip"),
    )


@register(
    "events_log_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CASE WHEN CAST(floor(value) AS BIGINT) >= 1
                  THEN length(bin(CAST(floor(value) AS BIGINT))) - 1
                  ELSE 0 END AS bucket
      FROM events
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY event_type, bucket
    """,
)
def events_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (power-of-two) histogram — the OpenTelemetry /
    latency-histogram bucket convention: bucket = floor(log2(value)),
    computed EXACTLY as binary-string length of the integer part
    (length(bin(n)) - 1) instead of floor(log2(x)) — libm log2 can
    land a power-of-two boundary on either side of the floor, the
    bit form cannot. Fixed ~64-bucket state per series at any
    volume; the log-scale view that makes tail latency visible where
    linear buckets collapse."""
    ev = rt(spark, sf_dir, "events")
    iv = F.floor("value").cast("bigint")
    bucket = F.when(iv >= 1, F.length(F.bin(iv)) - 1).otherwise(0)
    return (
        ev.select("event_type", bucket.cast("int").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "orders_abc_classification",
    oracle="""
    WITH p AS (
      SELECT l_partkey, round(sum(l_extendedprice), 6) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    r AS (
      SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) / sum(rev) OVER ()
               AS cum_share
      FROM p
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev), 6) AS class_revenue
    FROM r GROUP BY abc_class
    """,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head up to 80% cumulative share, B to 95%, C the tail —
    the Pareto-principle workhorse of inventory/catalog management.
    The cumulative window runs over the PART aggregate (bounded by
    |parts|, tie-pinned by partkey), per-part revenue quantized
    before ranking; output is three rows."""
    li = rt(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(F.round(F.sum("l_extendedprice"), 6).alias("rev"))

    wc = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    r = p.withColumn("cum_share", F.sum("rev").over(wc) / F.sum("rev").over(wall))
    cls = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return r.groupBy(cls.alias("abc_class")).agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.round(F.sum("rev"), 6).alias("class_revenue"),
    )


@register(
    "scalar_base64_hex",
    oracle="""
    SELECT s_suppkey,
           to_base64(encode(s_name)) AS b64,
           lower(to_hex(encode(s_name))) AS hx,
           s_name AS roundtrip,
           CAST(octet_length(encode(s_name)) AS INT) AS n_bytes
    FROM supplier
    """,
)
def scalar_base64_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary↔text encodings (base64 / hex) with a decode round-trip
    — the wire-format surface under payload columns, API tokens, and
    content-addressed keys. Spark's base64() pads per RFC 4648 like
    DuckDB's to_base64; hex is case-normalized (Spark upper, DuckDB
    upper via to_hex — both lowered) — the two conventions pinned so
    binary columns can be compared across systems as text."""
    sup = rt(spark, sf_dir, "supplier")
    raw = F.encode(F.col("s_name"), "UTF-8")
    return sup.select(
        "s_suppkey",
        F.base64(raw).alias("b64"),
        F.lower(F.hex(raw)).alias("hx"),
        F.decode(F.unbase64(F.base64(raw)), "UTF-8").alias("roundtrip"),
        F.octet_length(raw).cast("int").alias("n_bytes"),
    )


# --- binned id-gap detection -------------------------------------------
# "Find the missing ids" over a key ledger. The classic form is ONE
# global lead() — an unpartitioned window that serializes the table.
# The scale-safe form here: keys bucket by k // 1024, gaps WITHIN a
# bucket come from a bucket-partitioned lead, and gaps that CROSS
# bucket boundaries come from a global lead over the per-bucket
# (min, max) aggregate — a table 1024x smaller, the bounded-input
# global-window pattern. Union of the two is exactly the global-lead
# answer. Detected over the 'F' order subset (the full synthetic key
# space is dense).

_GAP_BUCKET = 1024


@register(
    "orders_id_gaps",
    oracle="""
    WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
    l AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM k)
    SELECT CAST(k + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS gap_len
    FROM l WHERE nxt > k + 1
    """,
)
def orders_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id ranges in the 'F'-status order ledger via the
    two-level binned scheme (bucket-partitioned lead + tiny
    cross-bucket stitch) — no global window over the key table."""

    keys = (
        rt(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    bucket = F.floor(F.col("k") / _GAP_BUCKET)
    wb = Window.partitionBy(bucket).orderBy("k")
    within = (
        keys.select("k", F.lead("k").over(wb).alias("nxt"))
        .where(F.col("nxt") > F.col("k") + 1)
    )
    # Per-bucket envelope: tiny table (|keys| / 1024 rows), global
    # lead over it is the documented bounded-input pattern.
    env = keys.groupBy(bucket.alias("b")).agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    we = Window.orderBy("b")
    boundary = (
        env.select("mx", F.lead("mn").over(we).alias("next_mn"))
        .where(F.col("next_mn") > F.col("mx") + 1)
        .select(F.col("mx").alias("k"), F.col("next_mn").alias("nxt"))
    )
    gaps = within.unionByName(boundary)
    return gaps.select(
        (F.col("k") + 1).cast("bigint").alias("gap_start"),
        (F.col("nxt") - 1).cast("bigint").alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).cast("bigint").alias("gap_len"),
    )


# --- small-files compaction planner ------------------------------------
# The lakehouse OPTIMIZE planner: given a file manifest (here, one
# synthetic "file" per l_shipdate with bytes ∝ row count), assign
# consecutive files to output groups of ~target size via a running
# cumulative sum. The cumsum window is global BUT runs on the
# MANIFEST (one row per file — metadata-scale, thousands of rows for
# petabyte tables), which is the documented bounded-input pattern;
# the planner never touches data rows.

_COMPACT_ROW_BYTES = 128
_COMPACT_TARGET = 1_048_576  # 1 MiB output groups


@register(
    "layout_compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT l_shipdate AS file_date,
             CAST(count(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS bytes
      FROM lineitem GROUP BY l_shipdate
    ),
    planned AS (
      SELECT file_date, bytes,
             CAST(coalesce(sum(bytes) OVER (
               ORDER BY file_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_COMPACT_TARGET} AS BIGINT) AS group_id
      FROM manifest
    )
    SELECT group_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           min(file_date) AS first_date,
           max(file_date) AS last_date
    FROM planned GROUP BY group_id
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over the per-shipdate file manifest: greedy
    consecutive fill to ~1 MiB groups via a prefix-sum window on the
    metadata table, then per-group file counts/bytes/date spans."""

    manifest = (
        rt(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").alias("file_date"))
        .agg((F.count("*") * _COMPACT_ROW_BYTES).cast("bigint").alias("bytes"))
    )
    w = Window.orderBy("file_date").rowsBetween(Window.unboundedPreceding, -1)
    planned = manifest.select(
        "file_date",
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / _COMPACT_TARGET
        )
        .cast("bigint")
        .alias("group_id"),
    )
    return planned.groupBy("group_id").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("file_date").alias("first_date"),
        F.max("file_date").alias("last_date"),
    )


# --- SCD2 as-of read -----------------------------------------------------
# The read half of merge_scd2: reconstruct the dimension AS OF a
# point in time with the validity-interval predicate
# valid_from <= t < coalesce(valid_to, +inf) — how every fact join
# against a type-2 dimension works. Two literal snapshot dates, one
# on each side of the 2024-01-01 segment change, summarized as
# per-segment counts.


@register(
    "scd2_asof_read",
    oracle="""
    WITH dim AS (
      SELECT c_custkey,
             CASE WHEN v = 1 AND c_acctbal > 9000 THEN 'VIP'
                  ELSE c_mktsegment END AS seg,
             CASE WHEN v = 0 THEN TIMESTAMP '2020-01-01 00:00:00'
                  ELSE TIMESTAMP '2024-01-01 00:00:00' END AS valid_from,
             CASE WHEN v = 0 AND c_acctbal > 9000
                  THEN TIMESTAMP '2024-01-01 00:00:00' END AS valid_to
      FROM customer CROSS JOIN (SELECT unnest(range(0, 2)) AS v)
      WHERE v = 0 OR c_acctbal > 9000
    ),
    snaps AS (
      SELECT * FROM (VALUES (TIMESTAMP '2022-06-01 00:00:00'),
                            (TIMESTAMP '2024-06-01 00:00:00')) AS t(snap_at)
    )
    SELECT snap_at, seg, CAST(count(*) AS BIGINT) AS n_customers
    FROM snaps JOIN dim
      ON valid_from <= snap_at AND (valid_to IS NULL OR snap_at < valid_to)
    GROUP BY snap_at, seg
    """,
)
def scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension reads over the SCD2 history built by
    merge_scd2's scenario (VIP re-segmentation on 2024-01-01):
    validity-interval semi-filter per snapshot date, per-segment
    counts. The snapshot list broadcasts; history scans once."""
    cust = rt(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    v0 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_acctbal") > 9000,
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    v1 = cust.where(F.col("c_acctbal") > 9000).select(
        "c_custkey",
        F.lit("VIP").alias("seg"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    dim = v0.unionByName(v1)
    snaps = spark.createDataFrame(
        [("2022-06-01 00:00:00",), ("2024-06-01 00:00:00",)], "asof_s string"
    ).select(F.col("asof_s").cast("timestamp").alias("snap_at"))
    j = dim.join(
        F.broadcast(snaps),
        (F.col("valid_from") <= F.col("snap_at"))
        & (F.col("valid_to").isNull() | (F.col("snap_at") < F.col("valid_to"))),
    )
    return j.groupBy("snap_at", "seg").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


# --- nearest as-of join ---------------------------------------------------
# Completes the as-of family (backward = join_asof, forward =
# join_asof_forward): match the temporally NEAREST right row in
# either direction, ties to the backward match. Composed from the
# same union+window single-shuffle operator run in both directions,
# then a row-local arbitration — two key-partitioned exchanges total,
# still no join-operator explosion.


@register(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                    WHERE event_type = 'click'),
         purch AS (SELECT user_id, ts, event_id AS pid, value AS pval
                   FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT c.event_id, c.user_id, c.ts, c.value, p.pid AS pb, p.ts AS tb
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    f AS (
      SELECT c.event_id, p.pid AS pf, p.ts AS tf
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ),
    j AS (SELECT b.*, f.pf, f.tf FROM b JOIN f USING (event_id)),
    pick AS (
      SELECT *,
             CASE WHEN pb IS NOT NULL AND (pf IS NULL OR
                       epoch_us(ts) - epoch_us(tb) <= epoch_us(tf) - epoch_us(ts))
                  THEN 'backward'
                  WHEN pf IS NOT NULL THEN 'forward' END AS direction
      FROM j
    )
    SELECT user_id, event_id, ts, value,
           CASE direction WHEN 'backward' THEN pb WHEN 'forward' THEN pf END
             AS nearest_purchase_id,
           CAST(CASE direction
                  WHEN 'backward' THEN epoch_us(ts) - epoch_us(tb)
                  WHEN 'forward' THEN epoch_us(tf) - epoch_us(ts)
                END AS BIGINT) AS dt_us,
           direction
    FROM pick
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-purchase as-of join per click (|Δt| arbitration, ties
    backward)."""
    from mapreduce_word2vec_spark.operators.asof import asof_join

    ev = rt(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    b = asof_join(
        clicks, purch, on="user_id", left_time="ts", right_time="ts",
        right_cols=["pid"], direction="backward",
    ).select(
        "event_id", "user_id", "ts", "value",
        F.col("pid").alias("pb"), F.col("ts_right").alias("tb"),
    )
    f = asof_join(
        clicks, purch, on="user_id", left_time="ts", right_time="ts",
        right_cols=["pid"], direction="forward",
    ).select("event_id", F.col("pid").alias("pf"), F.col("ts_right").alias("tf"))
    j = b.join(f, "event_id")
    us = F.unix_micros
    backward_wins = F.col("pb").isNotNull() & (
        F.col("pf").isNull()
        | (us(F.col("ts")) - us(F.col("tb")) <= us(F.col("tf")) - us(F.col("ts")))
    )
    direction = (
        F.when(backward_wins, "backward")
        .when(F.col("pf").isNotNull(), "forward")
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "user_id", "event_id", "ts", "value",
        F.when(direction == "backward", F.col("pb"))
        .when(direction == "forward", F.col("pf"))
        .alias("nearest_purchase_id"),
        F.when(direction == "backward", us(F.col("ts")) - us(F.col("tb")))
        .when(direction == "forward", us(F.col("tf")) - us(F.col("ts")))
        .cast("bigint")
        .alias("dt_us"),
        direction.alias("direction"),
    )


# --- Neyman-allocation stratified sampling --------------------------------
# Optimal stratified sampling: allocate a fixed budget across strata
# ∝ N_h·S_h (bigger and more variable strata get more samples), then
# hash-sample each stratum at its allocated rate. All moments are
# integer-cent accumulators (exact across engines); membership is an
# INTEGER comparison hash·N_h < alloc·2^32 — no float RNG anywhere.
# Two passes: a stratum-moment aggregate (broadcastable — one row per
# stratum) and a row-local keep test.

_NEYMAN_BUDGET = 1_000
_NEYMAN_HASH_A = 40_503
_NEYMAN_M = 4_294_967_296  # 2^32


@register(
    "sample_stratified_neyman",
    oracle=f"""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    ),
    moments AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n_pop,
             sum(bal_c) AS s1, sum(bal_c * bal_c) AS s2
      FROM cents GROUP BY seg
    ),
    stats AS (
      SELECT seg, n_pop,
             sqrt(CAST(s2 AS DOUBLE) / n_pop
                  - (CAST(s1 AS DOUBLE) / n_pop) * (CAST(s1 AS DOUBLE) / n_pop))
               AS s_cents
      FROM moments
    ),
    alloc AS (
      SELECT seg, n_pop, s_cents,
             CAST(floor({_NEYMAN_BUDGET} * (n_pop * s_cents)
                        / (SELECT sum(n_pop * s_cents) FROM stats) + 0.5) AS BIGINT)
               AS alloc_n
      FROM stats
    ),
    sampled AS (
      SELECT c.seg,
             CASE WHEN ((c.c_custkey % {_NEYMAN_M}) * {_NEYMAN_HASH_A})
                       % {_NEYMAN_M} * a.n_pop < a.alloc_n * {_NEYMAN_M}
                  THEN 1 ELSE 0 END AS kept
      FROM cents c JOIN alloc a USING (seg)
    )
    SELECT a.seg, a.n_pop, round(a.s_cents, 6) AS s_cents, a.alloc_n,
           CAST((SELECT sum(kept) FROM sampled s WHERE s.seg = a.seg) AS BIGINT)
             AS n_sampled
    FROM alloc a
    """,
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sample of customers by market
    segment (budget {1000}): exact integer-cent stratum moments,
    allocation ∝ N_h·S_h, integer-hash membership at the allocated
    rate. Moments broadcast back; one customer scan per pass."""
    cust = rt(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    moments = cust.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n_pop"),
        F.sum("bal_c").alias("s1"),
        F.sum(F.col("bal_c") * F.col("bal_c")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_pop")
    stats = moments.select(
        "seg",
        "n_pop",
        F.sqrt(F.col("s2").cast("double") / F.col("n_pop") - mean * mean).alias(
            "s_cents"
        ),
    )
    tot = stats.agg(F.sum(F.col("n_pop") * F.col("s_cents")).alias("t"))
    alloc = stats.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n_pop",
        "s_cents",
        F.floor(
            _NEYMAN_BUDGET * (F.col("n_pop") * F.col("s_cents")) / F.col("t") + 0.5
        )
        .cast("bigint")
        .alias("alloc_n"),
    )
    kept = (
        ((F.col("c_custkey") % _NEYMAN_M) * _NEYMAN_HASH_A) % _NEYMAN_M
        * F.col("n_pop")
        < F.col("alloc_n") * _NEYMAN_M
    )
    sampled = (
        cust.join(F.broadcast(alloc.select("seg", "n_pop", "alloc_n")), "seg")
        .select("seg", F.when(kept, 1).otherwise(0).alias("kept"))
        .groupBy("seg")
        .agg(F.sum("kept").cast("bigint").alias("n_sampled"))
    )
    return alloc.join(sampled, "seg").select(
        "seg",
        "n_pop",
        F.round("s_cents", 6).alias("s_cents"),
        "alloc_n",
        "n_sampled",
    )


# --- weighted median --------------------------------------------------------
# Quantity-weighted median price per return flag: the first value (in
# (price, key) order) whose cumulative weight reaches half the group
# total. percentile()/median() can't weight; the closed form is a
# cumulative-weight window over the per-value aggregate (bounded by
# distinct values per group), lower-median convention on exact ties.


@register(
    "agg_weighted_median",
    oracle="""
    WITH per AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(sum(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT flag, price, w,
             sum(w) OVER (PARTITION BY flag ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM per
    )
    SELECT flag, round(min(price), 2) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum WHERE cw * 2 >= tw
    GROUP BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of l_extendedprice per return flag via
    the cumulative-weight window over the (flag, price) aggregate."""
    li = rt(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        "l_quantity",
    )
    per = li.groupBy("flag", "price").agg(
        F.sum("l_quantity").cast("bigint").alias("w")
    )
    w_cum = Window.partitionBy("flag").orderBy("price").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy("flag")
    cum = per.select(
        "flag",
        "price",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.round(F.min("price"), 2).alias("weighted_median_price"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


# --- transaction-log snapshot replay ----------------------------------------
# Lakehouse table-format mechanics: the current snapshot is the
# last-action-wins replay of an ordered (version, action, file) log.
# Log synthesized from the lineitem month manifest: v0 adds every
# month, v1 removes 1996, v2 re-adds 1996 H1 as compacted files.
# Replay = max_by(action, version) per file, keep 'add' — one
# file-keyed aggregation over a metadata-scale log.


# Shared synthetic add/remove transaction log for table_log_replay and
# table_vacuum_plan (live files + tombstones must partition the file
# set — one definition keeps that complementarity unbreakable): v0
# adds every month file, v1 removes all of 1996, v2 re-adds 1996 H1.
_TXN_LOG_CTES = """months AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    log AS (
      SELECT 0 AS version, 'add' AS action, file_id, n_rows FROM months
      UNION ALL
      SELECT 1, 'remove', file_id, n_rows FROM months
      WHERE file_id LIKE '1996-%'
      UNION ALL
      SELECT 2, 'add', file_id, n_rows FROM months
      WHERE file_id IN ('1996-01', '1996-02', '1996-03',
                        '1996-04', '1996-05', '1996-06')
    ),
    latest AS (
      SELECT file_id,
             max_by(action, version) AS last_action,
             max_by(n_rows, version) AS n_rows,
             CAST(max(version) AS INT) AS at_version
      FROM log GROUP BY file_id
    )"""


def _txn_log_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last action per file over the synthetic log — the Spark twin of
    ``_TXN_LOG_CTES`` (one file-keyed aggregation over a
    metadata-scale log)."""
    months = (
        rt(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("file_id"))
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    v0 = months.select(
        F.lit(0).alias("version"), F.lit("add").alias("action"), "file_id", "n_rows"
    )
    v1 = months.where(F.col("file_id").startswith("1996-")).select(
        F.lit(1).alias("version"), F.lit("remove").alias("action"), "file_id", "n_rows"
    )
    h1 = ["1996-0%d" % i for i in range(1, 7)]
    v2 = months.where(F.col("file_id").isin(h1)).select(
        F.lit(2).alias("version"), F.lit("add").alias("action"), "file_id", "n_rows"
    )
    log = v0.unionByName(v1).unionByName(v2)
    return log.groupBy("file_id").agg(
        F.max_by("action", "version").alias("last_action"),
        F.max_by("n_rows", "version").alias("n_rows"),
        F.max("version").cast("int").alias("at_version"),
    )


@register(
    "table_log_replay",
    oracle=f"""
    WITH {_TXN_LOG_CTES}
    SELECT file_id, n_rows, at_version
    FROM latest WHERE last_action = 'add'
    """,
)
def table_log_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay an add/remove transaction log to the live-file snapshot
    (last action per file wins)."""
    return _txn_log_latest(spark, sf_dir).where(
        F.col("last_action") == "add"
    ).select("file_id", "n_rows", "at_version")


@register(
    "scalar_bround",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round_even(l_extendedprice / 7, 2) AS half_even_2,
           round_even(l_extendedprice / 7, 0) AS half_even_0,
           round(l_extendedprice / 7, 2) AS half_up_2
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def scalar_bround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's rounding parity (Spark bround ≡ DuckDB round_even) next
    to the default half-away round — the money-aggregation rounding
    family, where half-mode mismatches are the classic cross-system
    penny drift."""
    li = rt(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    x = F.col("l_extendedprice") / 7
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.bround(x, 2).alias("half_even_2"),
        F.bround(x, 0).alias("half_even_0"),
        F.round(x, 2).alias("half_up_2"),
    )


# --- mergeable exact variance (Chan partials) -------------------------------
# Incremental-rollup arithmetic for second moments: per-shard
# (n, sum, sumsq) partials in exact whole-currency-unit integers
# merge by plain addition, and the merged global variance must equal
# the direct whole-table variance bit-for-bit. This is the
# maintenance path for variance/stddev dashboards at 100 TB —
# rebuild nothing, add partials. (Cent-scale squares already
# overflow int64 in BOTH engines at 15k rows; where even unit
# squares would overflow, production merges the float (n, mean, M2)
# Chan form instead — the integer form is what makes the oracle
# bit-exact.)


@register(
    "incr_variance_merge",
    oracle="""
    WITH partials AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS shard,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)
                      * CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS s2
      FROM orders GROUP BY 1
    ),
    merged AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(s1) AS BIGINT) AS s1, CAST(sum(s2) AS BIGINT) AS s2
      FROM partials
    )
    SELECT n,
           round(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                 4) AS variance_merged,
           CAST((SELECT count(*) FROM partials) AS BIGINT) AS n_partials
    FROM merged
    """,
)
def incr_variance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global price variance assembled from per-month (n, Σ, Σ²)
    partials — exact integer-unit moments, so the merge is pure
    addition and engine-identical."""
    units = F.round(F.col("o_totalprice")).cast("bigint")
    partials = (
        rt(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(units).cast("bigint").alias("s1"),
            F.sum(units * units).cast("bigint").alias("s2"),
        )
    )
    merged = partials.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("bigint").alias("s1"),
        F.sum("s2").cast("bigint").alias("s2"),
        F.count("*").cast("bigint").alias("n_partials"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    return merged.select(
        "n", F.round(var, 4).alias("variance_merged"), "n_partials"
    )


# --- higher moments from exact integer sums ---------------------------------
# Skewness/kurtosis per return flag, computed from raw integer power
# sums (Σx..Σx⁴ of whole-unit prices) rather than the built-ins —
# Spark's skewness()/kurtosis() and DuckDB's use different bias
# corrections, so the moment-sum form is both engine-exact AND the
# mergeable shape incremental rollups need (same family as
# incr_variance_merge). l_quantity (1..50) keeps x⁴ sums far from
# int64 overflow at any row count the fixture reaches.


@register(
    "agg_higher_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(l_quantity AS BIGINT) ** 2) AS BIGINT) AS s2,
             CAST(sum(CAST(l_quantity AS BIGINT) ** 3) AS BIGINT) AS s3,
             CAST(sum(CAST(l_quantity AS BIGINT) ** 4) AS BIGINT) AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT flag, n,
           round((CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) ** 3)
                 / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) ** 2) ** 1.5),
                 6) AS skewness_pop,
           round((CAST(s4 AS DOUBLE) / n
                  - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6 * (CAST(s1 AS DOUBLE) / n) ** 2 * (CAST(s2 AS DOUBLE) / n)
                  - 3 * (CAST(s1 AS DOUBLE) / n) ** 4)
                 / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) ** 2) ** 2)
                 - 3, 6) AS excess_kurtosis_pop
    FROM m
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of l_quantity per
    return flag from exact integer power sums (mergeable partials)."""
    q = F.col("l_quantity").cast("bigint")
    m = (
        rt(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(q).cast("bigint").alias("s1"),
            F.sum(q * q).cast("bigint").alias("s2"),
            F.sum(q * q * q).cast("bigint").alias("s3"),
            F.sum(q * q * q * q).cast("bigint").alias("s4"),
        )
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n
    m3 = F.col("s3") / n
    m4 = F.col("s4") / n
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * F.pow(m1, 3)) / F.pow(var, 1.5)
    kurt = (m4 - 4 * m1 * m3 + 6 * F.pow(m1, 2) * m2 - 3 * F.pow(m1, 4)) / F.pow(
        var, 2
    ) - 3
    return m.select(
        "flag",
        "n",
        F.round(skew, 6).alias("skewness_pop"),
        F.round(kurt, 6).alias("excess_kurtosis_pop"),
    )


# --- Benford first-digit audit ----------------------------------------------
# Fraud/data-quality screening: order totals spanning several orders
# of magnitude should follow Benford's law, P(d) = log10(1 + 1/d).
# Observed first-digit shares + the chi-square distance; the digit
# table is 9 rows after one partial-aggregated count.


@register(
    "orders_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs)
    SELECT digit, n,
           round(n * 1.0 / t, 6) AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           round((n * 1.0 / t - log10(1.0 + 1.0 / digit))
                 * (n * 1.0 / t - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit), 6) AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals vs Benford's law with
    per-digit chi-square terms."""
    o = rt(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = obs.agg(F.sum("n").cast("bigint").alias("t"))
    j = obs.crossJoin(F.broadcast(tot))
    share = F.col("n") / F.col("t")
    bshare = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return j.select(
        "digit",
        "n",
        F.round(share, 6).alias("obs_share"),
        F.round(bshare, 6).alias("benford_share"),
        F.round((share - bshare) * (share - bshare) / bshare, 6).alias("chi2_term"),
    )


# --- seasonal decomposition ---------------------------------------------------
# Classical additive decomposition of monthly revenue: trend = full
# 13-month centered moving average, seasonal = per-calendar-month
# mean deviation from trend, residual = remainder. Every window runs
# on the BOUNDED monthly aggregate (~84 rows for 7 TPC-H years);
# revenue accumulates as exact integer cents so both engines see the
# same series.


@register(
    "orders_seasonal_decompose",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(substr(strftime(o_orderdate, '%Y-%m'), 6, 2) AS INT) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2
    ),
    tr AS (
      SELECT month, m, rev_c,
             CASE WHEN count(*) OVER w = 13
                  THEN avg(rev_c * 1.0) OVER w END AS trend_c
      FROM monthly
      WINDOW w AS (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
    ),
    seas AS (
      SELECT m, avg(rev_c - trend_c) AS seasonal_c
      FROM tr WHERE trend_c IS NOT NULL GROUP BY m
    )
    SELECT month, round(rev_c / 100.0, 2) AS revenue,
           round(trend_c / 100.0, 4) AS trend,
           round(seasonal_c / 100.0, 4) AS seasonal,
           round((rev_c - trend_c - seasonal_c) / 100.0, 4) AS residual
    FROM tr JOIN seas USING (m)
    """,
)
def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of monthly
    revenue (13-month centered MA, per-month seasonal means)."""
    monthly = (
        rt(spark, sf_dir, "orders")
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    w = Window.orderBy("month").rowsBetween(-6, 6)
    tr = monthly.select(
        "month",
        "m",
        "rev_c",
        F.when(F.count("*").over(w) == 13, F.avg(F.col("rev_c") * 1.0).over(w)).alias(
            "trend_c"
        ),
    )
    seas = (
        tr.where(F.col("trend_c").isNotNull())
        .groupBy("m")
        .agg(F.avg(F.col("rev_c") - F.col("trend_c")).alias("seasonal_c"))
    )
    j = tr.join(F.broadcast(seas), "m")
    return j.select(
        "month",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(F.col("trend_c") / 100.0, 4).alias("trend"),
        F.round(F.col("seasonal_c") / 100.0, 4).alias("seasonal"),
        F.round(
            (F.col("rev_c") - F.col("trend_c") - F.col("seasonal_c")) / 100.0, 4
        ).alias("residual"),
    )


@register(
    "table_vacuum_plan",
    oracle=f"""
    WITH {_TXN_LOG_CTES}
    SELECT file_id, n_rows, at_version AS tombstoned_at
    FROM latest WHERE last_action = 'remove'
    """,
)
def table_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM complement to table_log_replay: files whose LAST log
    action is a remove — the tombstones eligible for physical
    deletion once the retention window passes. Same one-aggregation
    replay over the metadata log."""
    return (
        _txn_log_latest(spark, sf_dir)
        .where(F.col("last_action") == "remove")
        .select(
            "file_id", "n_rows", F.col("at_version").alias("tombstoned_at")
        )
    )


@register(
    "agg_bool_aggregates",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 30) AS any_large,
           CAST(sum(CASE WHEN value > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: bool_and / bool_or / count_if per
    event type (ANSI EVERY/ANY surface)."""
    ev = rt(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 30).alias("any_large"),
        F.count_if(F.col("value") > 30).cast("bigint").alias("n_large"),
        F.count("*").cast("bigint").alias("n"),
    )


# --- Wilson score interval ----------------------------------------------------
# Proportion estimates at corpus scale need intervals, and the Wilson
# score behaves at extreme p̂ where the normal approximation breaks.
# Counts are exact integers; the interval is row-local closed-form
# math over the tiny per-group aggregate (z = 1.96, 95%).

_WILSON_Z = 1.96


@register(
    "agg_wilson_ci",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 30 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, k,
           round(k * 1.0 / n, 6) AS p_hat,
           round((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                  - {_WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                       + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS ci_lo,
           round((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                  + {_WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                       + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS ci_hi
    FROM m
    """,
)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for the share of high-value events
    per type (exact integer counts, closed-form interval)."""
    ev = rt(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 30, 1).otherwise(0)).cast("bigint").alias("k"),
    )
    z = _WILSON_Z
    n = F.col("n")
    p = F.col("k") * F.lit(1.0) / n
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + F.lit(z * z) / (4.0 * n * n))
    denom = 1 + F.lit(z * z) / n
    return m.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    )


# --- dormancy win-back ---------------------------------------------------------
# Lifecycle marketing's retention question: how many customers went
# dormant (>180 days between consecutive orders) and then came back,
# and how long were the dormancy spells? One customer-keyed lag
# window over (customer, order date), then a rollup.

_DORMANT_DAYS = 180


@register(
    "orders_dormancy_winback",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    ),
    spells AS (
      SELECT o_custkey, date_diff('day', prev_d, o_orderdate) AS gap_days
      FROM o WHERE prev_d IS NOT NULL
        AND date_diff('day', prev_d, o_orderdate) > {_DORMANT_DAYS}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_winbacks,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           round(avg(gap_days), 6) AS avg_gap_days
    FROM spells
    """,
)
def orders_dormancy_winback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-back events: consecutive same-customer orders more than
    {180} days apart, with spell-length stats."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = rt(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_d"),
    )
    spells = o.where(
        F.col("prev_d").isNotNull()
        & (F.datediff("o_orderdate", "prev_d") > _DORMANT_DAYS)
    ).select("o_custkey", F.datediff("o_orderdate", "prev_d").alias("gap_days"))
    return spells.agg(
        F.count("*").cast("bigint").alias("n_winbacks"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.min("gap_days").cast("bigint").alias("min_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
    )


# --------------------------------------------------------------------------
# Round 4: FILTER-clause aggregates, timezone scalars
# --------------------------------------------------------------------------


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_tax > 0.04), 0), 6) AS qty_taxed,
           round(avg(l_extendedprice) FILTER (WHERE l_quantity >= 25), 6) AS avg_price_bulk,
           max(l_shipdate) FILTER (WHERE l_linestatus = 'F') AS last_f_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ``FILTER (WHERE …)`` conditional aggregates — the
    pivot-free way to fold many differently-predicated measures into
    ONE aggregation pass (Catalyst plans one HashAggregate with
    per-buffer predicates; the naive alternative is N self-joined
    scans). `count` with no matches gives 0, `sum`/`avg`/`max` give
    NULL — both semantics pinned (`qty_taxed` coalesced on both sides
    so the 0-vs-NULL convention is explicit, not engine-default)."""
    li = rt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.expr("count(*) FILTER (WHERE l_discount > 0.05)").alias("n_disc"),
        F.round(
            F.coalesce(
                F.expr("sum(l_quantity) FILTER (WHERE l_tax > 0.04)"), F.lit(0)
            ),
            6,
        ).alias("qty_taxed"),
        F.round(
            F.expr("avg(l_extendedprice) FILTER (WHERE l_quantity >= 25)"), 6
        ).alias("avg_price_bulk"),
        F.expr("max(l_shipdate) FILTER (WHERE l_linestatus = 'F')").alias(
            "last_f_ship"
        ),
    )


@register(
    "scalar_datetime_tz",
    oracle="""
    SELECT event_id,
           timezone('America/New_York', timezone('UTC', ts)) AS ts_nyc,
           timezone('Asia/Tokyo',       timezone('UTC', ts)) AS ts_tokyo,
           timezone('UTC', timezone('Europe/Paris',
             timezone('Europe/Paris', timezone('UTC', ts)))) AS ts_roundtrip,
           CAST(hour(timezone('America/Los_Angeles', timezone('UTC', ts))) AS INT) AS hour_la,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start
    FROM events WHERE event_id % 97 = 0
    """,
)
def scalar_datetime_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion parity: ``from_utc_timestamp`` /
    ``to_utc_timestamp`` against DuckDB's two-step ``timezone()``
    (naive→instant→zone wall clock), across a DST zone (NYC), a
    non-DST zone (Tokyo), a convert-and-back roundtrip, hour
    extraction in a zone, and ISO Monday week truncation. Both
    engines resolve zones from the same IANA tzdb, so wall-clock
    results — including rows on either side of DST transitions — must
    hash-match exactly. Row-local projection, zero exchanges; the
    modulo subset keeps the checked surface deterministic."""
    ev = rt(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.from_utc_timestamp("ts", "America/New_York").alias("ts_nyc"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("ts_tokyo"),
        F.to_utc_timestamp(
            F.from_utc_timestamp("ts", "Europe/Paris"), "Europe/Paris"
        ).alias("ts_roundtrip"),
        F.hour(F.from_utc_timestamp("ts", "America/Los_Angeles"))
        .cast("int")
        .alias("hour_la"),
        F.date_trunc("week", F.col("ts")).alias("week_start"),
    )


@register(
    "agg_hll_intersection",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND day(ts) <= 10),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase' AND day(ts) >= 20)
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
           CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS BIGINT) AS exact_union,
           CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS exact_inter,
           true AS union_ok,
           true AS inter_ok
    """,
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: distinct-user INTERSECTION cardinality
    ("did both X early and Y late") estimated from two HLL sketches
    by inclusion–exclusion — est(A∩B) = est(A) + est(B) − est(A∪B),
    the union coming from ``hll_union_agg`` without rescanning rows.
    HLLs only union natively; inclusion–exclusion is how every
    sketch-backed audience-overlap product answers AND-queries, with
    error proportional to the UNION size (not the intersection).
    Contract oracle (r3 sketch pattern): all four exact cardinalities
    hash-compare, plus falsifiable bound booleans — union estimate
    within 5% of exact, intersection estimate within 10% of the exact
    UNION (the honest bound for differenced sketches)."""
    ev = rt(spark, sf_dir, "events")
    a = ev.where((F.col("event_type") == "click") & (F.dayofmonth("ts") <= 10)).select(
        "user_id"
    )
    b = ev.where(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") >= 20)
    ).select("user_id")
    sk_a = a.agg(
        F.expr("hll_sketch_agg(user_id)").alias("ska"),
        F.count_distinct("user_id").cast("bigint").alias("exact_a"),
    )
    sk_b = b.agg(
        F.expr("hll_sketch_agg(user_id)").alias("skb"),
        F.count_distinct("user_id").cast("bigint").alias("exact_b"),
    )
    exact_u = (
        a.union(b)
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_union"))
    )
    exact_i = (
        a.distinct()
        .join(b.distinct(), "user_id", "inner")
        .agg(F.count("*").cast("bigint").alias("exact_inter"))
    )
    est = (
        sk_a.crossJoin(sk_b)
        .select(
            "exact_a",
            "exact_b",
            F.expr("hll_sketch_estimate(ska)").alias("est_a"),
            F.expr("hll_sketch_estimate(skb)").alias("est_b"),
            F.expr("hll_sketch_estimate(hll_union(ska, skb))").alias("est_u"),
        )
        .crossJoin(exact_u)
        .crossJoin(exact_i)
    )
    return est.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        (
            F.abs(F.col("est_u") - F.col("exact_union"))
            <= 0.05 * F.col("exact_union") + F.lit(1.0)
        ).alias("union_ok"),
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                - F.col("exact_inter")
            )
            <= 0.10 * F.col("exact_union") + F.lit(1.0)
        ).alias("inter_ok"),
    )


@register(
    "merge_three_way",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k, 'U' AS op, round(o_totalprice * 1.05, 6) AS new_price
      FROM orders WHERE o_orderkey % 1000 = 1
      UNION ALL
      SELECT o_orderkey, 'D', NULL FROM orders WHERE o_orderkey % 1000 = 2
      UNION ALL
      SELECT -o_orderkey, 'I', round(o_totalprice, 6)
      FROM orders WHERE o_orderkey % 1000 = 3
    ),
    tgt AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                   round(o_totalprice, 6) AS o_totalprice FROM orders)
    SELECT coalesce(t.o_orderkey, s.k) AS o_orderkey,
           coalesce(t.o_custkey, -1) AS o_custkey,
           coalesce(t.o_orderstatus, 'I') AS o_orderstatus,
           CASE WHEN s.op = 'U' THEN s.new_price
                WHEN s.op = 'I' THEN s.new_price
                ELSE t.o_totalprice END AS o_totalprice
    FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.k
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
)
def merge_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MERGE clause matrix in ONE pass: a CDC batch carrying
    update / delete / insert ops applied with a single full-outer
    join + row-level CASE — exactly what Delta/Iceberg `MERGE INTO
    … WHEN MATCHED THEN UPDATE / WHEN MATCHED AND op='D' THEN DELETE
    / WHEN NOT MATCHED THEN INSERT` lowers to, vs. the anti-join +
    union shape of the single-clause merges (merge_upsert,
    merge_delete_apply). Scale shape: one key-partitioned outer join;
    when the batch is small relative to the table the join side is
    broadcast and the table never shuffles (AQE decides here — no
    hint, batch is derived from the fact)."""
    o = rt(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 6).alias("o_totalprice"),
    )
    src = (
        o.where(F.col("o_orderkey") % 1000 == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit("U").alias("op"),
            F.round(F.col("o_totalprice") * 1.05, 6).alias("new_price"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 1000 == 2).select(
                F.col("o_orderkey").alias("k"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("new_price"),
            )
        )
        .unionByName(
            # Insert keys negated, not offset: o_orderkey >= 1 at every
            # TPC-H scale factor, so -k can never collide with a real
            # target key (a fixed +10M offset collides once orderkeys
            # exceed 10M, silently demoting INSERT to UPDATE).
            o.where(F.col("o_orderkey") % 1000 == 3).select(
                (-F.col("o_orderkey")).alias("k"),
                F.lit("I").alias("op"),
                F.round("o_totalprice", 6).alias("new_price"),
            )
        )
    )
    merged = o.join(src, o.o_orderkey == src.k, "full_outer")
    return merged.where(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(o.o_orderkey, F.col("k")).alias("o_orderkey"),
        F.coalesce("o_custkey", F.lit(-1)).alias("o_custkey"),
        F.coalesce("o_orderstatus", F.lit("I")).alias("o_orderstatus"),
        F.when(F.col("op").isin("U", "I"), F.col("new_price"))
        .otherwise(o.o_totalprice)
        .alias("o_totalprice"),
    )


@register(
    "sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS total_charge,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDF (Spark 4 `CREATE TEMPORARY FUNCTION …
    RETURNS … RETURN <expr>`): reusable business logic declared in
    SQL, not Python — the function body INLINES into the calling
    plan, so it stays inside whole-stage codegen with zero
    serialization boundary (the opposite trade of every Python UDF in
    this catalog). The oracle applies the expression directly,
    proving the UDF call is transparent to the result."""
    rt(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf_src")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION line_charge("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1 - d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(line_charge(l_extendedprice, l_discount, l_tax)), 6)
                 AS total_charge,
               count(*) AS n_items
        FROM li_sqludf_src
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 6) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the linear
    FROM-first query form — each stage reads top-to-bottom like a
    DataFrame chain but stays pure SQL. Parses to the identical
    logical plan as the nested form (the oracle), so this is a
    front-end surface check: filter still pushes to the scan, the
    aggregate still splits partial/final."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_src")
    return spark.sql(
        """
        FROM orders_pipe_src
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 6) AS revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@register(
    "customer_segment_migration",
    oracle="""
    WITH p1 AS (
      SELECT o_custkey,
             ntile(3) OVER (ORDER BY round(sum(o_totalprice), 2) DESC, o_custkey) AS seg
      FROM orders WHERE year(o_orderdate) < 1998 GROUP BY o_custkey
    ),
    p2 AS (
      SELECT o_custkey,
             ntile(3) OVER (ORDER BY round(sum(o_totalprice), 2) DESC, o_custkey) AS seg
      FROM orders WHERE year(o_orderdate) >= 1998 GROUP BY o_custkey
    )
    SELECT coalesce(CAST(p1.seg AS VARCHAR), 'absent') AS seg_before,
           coalesce(CAST(p2.seg AS VARCHAR), 'absent') AS seg_after,
           count(*) AS n_customers
    FROM p1 FULL OUTER JOIN p2 USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment migration matrix: customers' revenue tercile BEFORE
    1998 vs FROM 1998 (absent = no orders in that period) — the
    period-over-period movement view behind churn/upgrade dashboards,
    composing the RFM idiom with a full-outer self-reconciliation.
    Deterministic terciles ((sum desc, custkey) total order under
    ntile; the revenue is rounded to 2 dp BEFORE the window so the
    ordering can't flip on an ulp-level summation-order difference
    between engines — the customer_rfm_segments quantization
    discipline). Scale shape: both period aggregates fold map-side on ONE
    orders scan each, the ntile windows order the CUSTOMER table
    (approx-percentile threshold broadcast is the documented
    billions-of-customers path, as in customer_rfm_segments), and the
    matrix is ≤ 4×4 rows."""
    o = rt(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("yr")
    )

    def seg(period):
        agg = period.groupBy("o_custkey").agg(
            F.round(F.sum("o_totalprice"), 2).alias("rev")
        )
        w = Window.orderBy(F.desc("rev"), "o_custkey")
        return agg.select("o_custkey", F.ntile(3).over(w).alias("seg"))

    p1 = seg(o.where(F.col("yr") < 1998)).withColumnRenamed("seg", "seg1")
    p2 = seg(o.where(F.col("yr") >= 1998)).withColumnRenamed("seg", "seg2")
    j = p1.join(p2, "o_custkey", "full_outer")
    return (
        j.select(
            F.coalesce(F.col("seg1").cast("string"), F.lit("absent")).alias(
                "seg_before"
            ),
            F.coalesce(F.col("seg2").cast("string"), F.lit("absent")).alias(
                "seg_after"
            ),
        )
        .groupBy("seg_before", "seg_after")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "udtf_polymorphic",
    oracle="""
    SELECT 'o_orderkey' AS col, CAST(min(o_orderkey) AS DOUBLE) AS min_val,
           CAST(max(o_orderkey) AS DOUBLE) AS max_val FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE) FROM orders
    UNION ALL
    SELECT 'o_totalprice', round(CAST(min(o_totalprice) AS DOUBLE), 6),
           round(CAST(max(o_totalprice) AS DOUBLE), 6) FROM orders
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()` static method):
    the output schema is computed at PLAN time from the arguments —
    here a min/max profile whose row shape is fixed but whose
    per-call behavior (which columns to profile) comes from a
    constant argument the analyzer receives. This is the
    table-function counterpart of schema-on-read: one registered
    function serves any column list, vs the fixed-schema UDTF
    (udtf_split_priority) whose returnType is frozen at decoration.
    Terminal `terminate()` emits the fold — exercising the
    eval/terminate accumulation contract — and the kernel is
    SQL-reproducible so the whole crossing is hash-checked."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    class ProfileCols:
        @staticmethod
        def analyze(*args: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField("col", StringType()),
                        StructField("min_val", DoubleType()),
                        StructField("max_val", DoubleType()),
                    ]
                )
            )

        def __init__(self):
            self.state: dict = {}

        def eval(self, *vals):
            names = ("o_orderkey", "o_custkey", "o_totalprice")
            for name, v in zip(names, vals):
                if v is None:
                    continue
                v = float(v)
                lo, hi = self.state.get(name, (v, v))
                self.state[name] = (min(lo, v), max(hi, v))

        def terminate(self):
            # terminate() also fires on partitions where eval() never
            # ran (empty input split) — emit nothing there instead of
            # KeyError-ing the task.
            for name in ("o_orderkey", "o_custkey", "o_totalprice"):
                if name in self.state:
                    lo, hi = self.state[name]
                    yield name, lo, hi

    spark.udtf.register("profile_cols", udtf(ProfileCols))
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_poly_src")
    out = spark.sql(
        """
        SELECT t.col, t.min_val, t.max_val
        FROM orders_poly_src,
             LATERAL profile_cols(o_orderkey, o_custkey, o_totalprice) t
        """
    )
    # one terminate() per partition → per-partition partials; fold them
    return out.groupBy("col").agg(
        F.when(F.col("col") == "o_totalprice", F.round(F.min("min_val"), 6))
        .otherwise(F.min("min_val"))
        .alias("min_val"),
        F.when(F.col("col") == "o_totalprice", F.round(F.max("max_val"), 6))
        .otherwise(F.max("max_val"))
        .alias("max_val"),
    )


@register(
    "sql_session_variable",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 `DECLARE VARIABLE` /
    `SET VAR`): typed, session-scoped state referenced directly in
    queries — the SQL-native alternative to string-formatting
    thresholds into query text (injection-safe, plan-cached by
    value). Constant-folded at plan time, so the filter still pushes
    to the scan; the oracle inlines the same constants."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_var_src")
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE status_wanted STRING DEFAULT 'F'")
    spark.sql("SET VAR price_floor = 150000.0")
    spark.sql("SET VAR status_wanted = 'O'")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_var_src
        WHERE o_totalprice > price_floor AND o_orderstatus = status_wanted
        GROUP BY o_orderpriority
        """
    )


# --- as-of join with staleness tolerance -----------------------------------
# merge_asof's `tolerance` parameter: a backward as-of match only
# counts if the matched right row is within the lookback horizon
# (here 30 minutes); staler matches become NULLs, the left row
# survives. Same union-then-window single-exchange shape as join_asof
# (operators/asof.py) — the tolerance is a post-window predicate on
# the carried match time, so it adds zero exchanges. DuckDB has no
# ASOF tolerance either: the oracle NULLs the payload of an
# unconstrained ASOF join past the horizon, which is exactly the
# operator's contract.

_ASOF_TOL_S = 1800


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                    WHERE event_type = 'click'),
         purch AS (SELECT user_id, ts,
                          event_id AS purchase_event_id,
                          value AS purchase_value
                   FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT c.user_id, c.ts, c.event_id, c.value,
                  p.purchase_event_id, p.purchase_value, p.ts AS pts
           FROM clicks c ASOF LEFT JOIN purch p
             ON c.user_id = p.user_id AND c.ts >= p.ts
         )
    SELECT user_id, ts, event_id, value,
           CASE WHEN pts >= ts - INTERVAL '{_ASOF_TOL_S} seconds'
                THEN purchase_event_id END AS purchase_event_id,
           CASE WHEN pts >= ts - INTERVAL '{_ASOF_TOL_S} seconds'
                THEN purchase_value END AS purchase_value,
           CASE WHEN pts >= ts - INTERVAL '{_ASOF_TOL_S} seconds'
                THEN pts END AS ts_right
    FROM j
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 30-minute staleness tolerance:
    matches older than the horizon are NULLed, left rows survive."""
    from mapreduce_word2vec_spark.operators.asof import asof_join

    ev = rt(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purch,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        tolerance_seconds=_ASOF_TOL_S,
    )


# --- multinomial Naive Bayes (ML-in-SQL) -----------------------------------
# Completes the ML-in-SQL family (logreg GD, linreg, t-test) with the
# classic generative text classifier: multinomial NB over A2-A4
# tokens, labels = the lang column, add-1 smoothing. Train and score
# are ONE declarative plan — token counts per (lang, word), totals,
# priors, then per-doc log-posterior sums and an argmax window. Float
# discipline: every ln() is rounded to 12 places and accumulated as
# DECIMAL (term count x decimal loglik), so scores — and therefore the
# argmax — are summation-order-proof and engine-exact. Scale shape:
# the model table is (vocab x langs) rows — compact, broadcastable;
# the corpus contributes only (doc, word, tf) triples, one exchange
# for training counts and one for scoring sums; text never shuffles.


@register(
    "ml_naive_bayes_lang",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                w -> regexp_matches(w, '^[a-z]+$'))) AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    cl AS (SELECT lang, w, count(*) AS cnt FROM toks GROUP BY 1, 2),
    tot AS (SELECT lang, count(*) AS tot FROM toks GROUP BY 1),
    vocab AS (SELECT DISTINCT w FROM toks),
    vsize AS (SELECT count(*) AS v FROM vocab),
    langs AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents),
    ll AS (
      SELECT l.lang, vb.w,
             CAST(round(ln((coalesce(c.cnt, 0) + 1.0) / (t.tot + s.v)), 12)
                  AS DECIMAL(28,12)) AS ll
      FROM langs l
      CROSS JOIN vocab vb
      CROSS JOIN vsize s
      JOIN tot t ON t.lang = l.lang
      LEFT JOIN cl c ON c.lang = l.lang AND c.w = vb.w
    ),
    prior AS (
      SELECT l.lang,
             CAST(round(ln(l.n_l * 1.0 / nd.n), 12) AS DECIMAL(28,12)) AS lp
      FROM langs l CROSS JOIN nd
    ),
    score AS (
      SELECT tf.doc_id, ll.lang, p.lp + sum(tf.tf * ll.ll) AS sc
      FROM tf
      JOIN ll ON tf.w = ll.w
      JOIN prior p ON p.lang = ll.lang
      GROUP BY tf.doc_id, ll.lang, p.lp
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lang) AS rn
      FROM score
    )
    SELECT d.doc_id, d.lang, r.lang AS pred_lang, d.lang = r.lang AS correct
    FROM documents d JOIN r ON d.doc_id = r.doc_id AND r.rn = 1
    """,
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lang classifier trained and scored in
    one plan: add-1 smoothed per-(lang, word) log-likelihoods,
    decimal-exact log-posterior sums, argmax prediction per doc."""
    from mapreduce_word2vec_spark.functions.text import tokens_expr

    docs = rt(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens_expr("text")).alias("w")
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("tf"))
    cl = toks.groupBy("lang", "w").agg(F.count("*").alias("cnt"))
    tot = toks.groupBy("lang").agg(F.count("*").alias("tot"))
    vocab = toks.select("w").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    langs = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    nd = docs.agg(F.count("*").alias("n"))
    ll = (
        langs.crossJoin(vocab)
        .join(tot, "lang")
        .crossJoin(F.broadcast(vsize))
        .join(cl, ["lang", "w"], "left")
        .select(
            "lang",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot") + F.col("v"))
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("ll"),
        )
    )
    prior = langs.crossJoin(F.broadcast(nd)).select(
        "lang",
        F.round(F.log(F.col("n_l") * F.lit(1.0) / F.col("n")), 12)
        .cast("decimal(28,12)")
        .alias("lp"),
    )
    score = (
        tf.join(F.broadcast(ll), "w")
        .join(F.broadcast(prior), "lang")
        .groupBy("doc_id", "lang", "lp")
        .agg((F.col("lp") + F.sum(F.col("tf") * F.col("ll"))).alias("sc"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("sc"), F.asc("lang"))
    pred = (
        score.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return docs.select("doc_id", "lang").join(pred, "doc_id").select(
        "doc_id",
        "lang",
        "pred_lang",
        (F.col("lang") == F.col("pred_lang")).alias("correct"),
    )


# --- UDTF with a TABLE argument (PARTITION BY / ORDER BY) ------------------
# The remaining Python-UDTF calling convention: a TABLE(...) argument
# with PARTITION BY + ORDER BY, where the planner instantiates one
# UDTF per partition and feeds it rows in the declared order — the
# SQL-standard polymorphic-table-function shape (and how PTFs like
# sessionize/match_recognize are packaged). The kernel records the
# first/last row it SEES per partition, so the oracle (min_by/max_by
# over a zero-padded composite order key) verifies the engine
# actually delivered partition-complete, correctly-ordered input —
# not just that the rows arrived. Scale: one exchange on the
# partition key, in-partition sort, O(1) UDTF state per partition.


@register(
    "udtf_table_argument",
    oracle="""
    WITH k AS (
      SELECT o_orderstatus, o_orderkey,
             CAST(o_orderdate AS VARCHAR) || '|'
               || lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS okey
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min_by(o_orderkey, okey) AS BIGINT) AS first_key,
           CAST(max_by(o_orderkey, okey) AS BIGINT) AS last_key
    FROM k GROUP BY o_orderstatus
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming TABLE(orders) PARTITION BY o_orderstatus
    ORDER BY (o_orderdate, o_orderkey): per-partition row count plus
    the first/last order key in delivery order."""
    from pyspark.sql.functions import udtf

    class StatusProfile:
        def __init__(self):
            self.status = None
            self.n = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.n += 1
            if self.first is None:
                self.first = row["o_orderkey"]
                self.status = row["o_orderstatus"]
            self.last = row["o_orderkey"]

        def terminate(self):
            if self.n:
                yield self.status, self.n, self.first, self.last

    spark.udtf.register(
        "status_profile",
        udtf(
            StatusProfile,
            returnType=(
                "o_orderstatus string, n_orders bigint,"
                " first_key bigint, last_key bigint"
            ),
        ),
    )
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_tblarg_src")
    return spark.sql(
        """
        SELECT * FROM status_profile(
          TABLE(orders_tblarg_src)
          PARTITION BY o_orderstatus
          ORDER BY (o_orderdate, o_orderkey)
        )
        """
    )


# --- SQL scripting (BEGIN/DECLARE/WHILE) -----------------------------------
# Spark 4's SQL-scripting surface: procedural control flow around
# declarative statements. The script runs an exponential search — the
# canonical "loop until a data-dependent predicate flips" job that
# pure SQL can't express without materializing every iteration —
# doubling a revenue threshold until < 1% of orders exceed it. Each
# iteration is one full declarative COUNT (scans stay distributed,
# whole-stage-codegen'd); the script only carries two scalars between
# iterations, which is exactly the driver-side-state contract
# ml_logreg_gd pins for iterative algorithms. The oracle evaluates
# all 31 candidate thresholds in one grouped pass and picks the first
# passing one — same fixed point, no loop.


@register(
    "sql_scripting_loop",
    oracle="""
    WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders),
    ks AS (SELECT unnest(range(0, 31)) AS k),
    cnt AS (
      SELECT k, 100.0 * power(2, k) AS t,
             CAST(count(CASE WHEN o_totalprice > 100.0 * power(2, k) THEN 1 END)
                  AS BIGINT) AS n_above
      FROM ks CROSS JOIN orders GROUP BY k
    ),
    hit AS (
      SELECT c.k, c.t, c.n_above, tot.n_total
      FROM cnt c CROSS JOIN tot
      WHERE c.n_above * 100 < tot.n_total
    )
    SELECT t AS threshold, n_above, n_total FROM hit ORDER BY k LIMIT 1
    """,
)
def sql_scripting_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-scripting WHILE loop: exponential search for the smallest
    100·2^k revenue threshold that fewer than 1% of orders exceed."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_src")
    return spark.sql(
        """
        BEGIN
          DECLARE t DOUBLE DEFAULT 100.0;
          DECLARE n BIGINT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          SET total = (SELECT count(*) FROM orders_script_src);
          SET n = (SELECT count(*) FROM orders_script_src WHERE o_totalprice > t);
          WHILE n * 100 >= total DO
            SET t = t * 2;
            SET n = (SELECT count(*) FROM orders_script_src WHERE o_totalprice > t);
          END WHILE;
          SELECT CAST(t AS DOUBLE) AS threshold,
                 CAST(n AS BIGINT) AS n_above,
                 CAST(total AS BIGINT) AS n_total;
        END
        """
    )


# --- EXECUTE IMMEDIATE -----------------------------------------------------
# Dynamic SQL with bound parameters — the surface metadata-driven
# pipelines use to run generated statements (per-tenant filters,
# config-driven dimensions) without string-splicing values. The
# statement text arrives via a session variable, the parameter binds
# via USING, so the plan cache can reuse the compiled query across
# bindings and injection is structurally impossible.


@register(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 6) AS revenue
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with a USING bind: per-priority rollup of
    'F'-status orders from a dynamically supplied statement."""
    rt(spark, sf_dir, "orders").createOrReplaceTempView("orders_execimm_src")
    spark.sql("DECLARE OR REPLACE VARIABLE stmt_execimm STRING")
    spark.sql(
        """SET VAR stmt_execimm =
           'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 6) AS revenue
            FROM orders_execimm_src WHERE o_orderstatus = ?
            GROUP BY o_orderpriority'
        """
    )
    spark.sql("DECLARE OR REPLACE VARIABLE status_execimm STRING DEFAULT 'F'")
    return spark.sql("EXECUTE IMMEDIATE stmt_execimm USING status_execimm")


# --- OTIF fulfillment KPI --------------------------------------------------
# The supply-chain readout (on-time-in-full): an order counts as
# on-time when its LAST lineitem ships within 30 days of order date,
# in-full when nothing came back ('R'). One orders⋈lineitem join on
# the order key, per-order flags folded in the SAME aggregation that
# computes the cycle time (max ship date − order date), then a
# priority-level rollup with an exact interpolated median over
# integer day counts — exact in both engines, no float sums anywhere.


@register(
    "orders_otif_fulfillment",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(datediff('day', o.o_orderdate, max(l.l_shipdate)) AS BIGINT)
               AS cycle_days,
             max(l.l_shipdate) <= o.o_orderdate + INTERVAL 30 DAY AS on_time,
             count(CASE WHEN l.l_returnflag = 'R' THEN 1 END) = 0 AS in_full
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(CASE WHEN on_time AND in_full THEN 1 END) AS BIGINT)
             AS n_otif,
           round(count(CASE WHEN on_time AND in_full THEN 1 END) * 1.0
                 / count(*), 6) AS otif_rate,
           round(quantile_cont(cycle_days, 0.5), 6) AS median_cycle_days
    FROM per_order GROUP BY o_orderpriority
    """,
)
def orders_otif_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-in-full rate and median order-to-ship cycle days per
    order priority. The exact median comes from
    `operators.quantiles.exact_quantiles` (sort + rank interpolation)
    rather than Spark's exact `percentile` aggregate, which buffers
    every group value in task memory — orders/5 values per group grows
    unboundedly with the corpus (the round-7 sf10 lesson). per_order is
    evaluated twice (count pass + sort pass); at cluster scale the
    derived table would be cached or the sketch used instead."""
    o = rt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = rt(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.max("l_shipdate").alias("last_ship"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        )
        .select(
            "o_orderpriority",
            F.datediff("last_ship", "o_orderdate").cast("bigint").alias("cycle_days"),
            (
                (F.col("last_ship") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
                & (F.col("n_returned") == 0)
            ).alias("otif"),
        )
    )
    from mapreduce_word2vec_spark.operators.quantiles import exact_quantiles

    counts = per_order.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.count(F.when(F.col("otif"), 1)).cast("bigint").alias("n_otif"),
        F.round(
            F.count(F.when(F.col("otif"), 1)) * F.lit(1.0) / F.count("*"), 6
        ).alias("otif_rate"),
    )
    med = exact_quantiles(per_order, "o_orderpriority", "cycle_days", {"m": 0.5})
    return counts.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "n_otif",
        "otif_rate",
        F.round("m", 6).alias("median_cycle_days"),
    )


# --- chi-square independence test ------------------------------------------
# Cross-COLUMN association profiling (table_stats_profile is
# per-column): Pearson chi² between p_brand and p_type with Cramér's
# V effect size. The contingency table must include zero-observed
# cells (their expected counts still contribute), so the cell grid is
# the row-total × col-total cross join with observed counts
# LEFT-joined in — 150 cells here, r×c always, never data-sized.
# Per-cell terms are rounded to 12 places and accumulated as DECIMAL
# (the summation-order-proof discipline), so chi² — and the flag —
# are engine-exact. Marginals and cells derive from ONE groupBy of
# the fact table.


@register(
    "stats_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rt_ AS (SELECT p_brand, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
    ct_ AS (SELECT p_type, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
    n_ AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT coalesce(ob.o, 0) AS o, r.rt * c.ct * 1.0 / n_.n AS e
      FROM rt_ r CROSS JOIN ct_ c CROSS JOIN n_
      LEFT JOIN obs ob ON ob.p_brand = r.p_brand AND ob.p_type = c.p_type
    ),
    agg_ AS (
      SELECT CAST(sum(CAST(round((o - e) * (o - e) / e, 12)
                           AS DECIMAL(28,12))) AS DOUBLE) AS chi2
      FROM cells
    ),
    dims AS (
      SELECT (SELECT count(*) FROM rt_) AS r,
             (SELECT count(*) FROM ct_) AS c,
             (SELECT n FROM n_) AS n
    )
    SELECT round(a.chi2, 6) AS chi2,
           CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
           d.n AS n,
           round(sqrt(a.chi2 / (d.n * least(d.r - 1, d.c - 1))), 6) AS cramers_v
    FROM agg_ a CROSS JOIN dims d
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi² independence test of p_brand × p_type with
    Cramér's V, zero-observed cells included."""
    part = rt(spark, sf_dir, "part")
    obs = part.groupBy("p_brand", "p_type").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rt_ = obs.groupBy("p_brand").agg(F.sum("o").cast("bigint").alias("rtot"))
    ct_ = obs.groupBy("p_type").agg(F.sum("o").cast("bigint").alias("ctot"))
    n_ = obs.agg(F.sum("o").cast("bigint").alias("n"))
    cells = (
        rt_.crossJoin(ct_)
        .crossJoin(F.broadcast(n_))
        .join(obs, ["p_brand", "p_type"], "left")
        .select(
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("rtot") * F.col("ctot") * F.lit(1.0) / F.col("n")).alias("e"),
        )
    )
    term = F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 12)
    agg_ = cells.agg(
        F.sum(term.cast("decimal(28,12)")).cast("double").alias("chi2")
    )
    dims = (
        rt_.agg(F.count("*").alias("r"))
        .crossJoin(ct_.agg(F.count("*").alias("c")))
        .crossJoin(n_)
    )
    return agg_.crossJoin(F.broadcast(dims)).select(
        F.round("chi2", 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        "n",
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


# --- strict (exclusive-boundary) as-of join --------------------------------
# merge_asof's allow_exact_matches=False: a purchase AT the click's
# own timestamp is invisible — the boundary discipline leakage-free
# point-in-time feature joins require when the feature row was
# computed FROM the event that would otherwise match it. Same
# union-then-window single exchange; only the equal-timestamp sort
# order of the tagged sides flips (operators/asof.py). DuckDB's ASOF
# accepts the strict comparator directly, so the oracle is the `>`
# form of join_asof's `>=`.


@register(
    "join_asof_strict",
    oracle="""
    WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                    WHERE event_type = 'click'),
         purch AS (SELECT user_id, ts,
                          event_id AS purchase_event_id,
                          value AS purchase_value
                   FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.ts, c.event_id, c.value,
           p.purchase_event_id, p.purchase_value, p.ts AS ts_right
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts > p.ts
    """,
)
def join_asof_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a STRICT boundary: most recent
    purchase strictly before each click."""
    from mapreduce_word2vec_spark.operators.asof import asof_join

    ev = rt(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purch,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        allow_exact_matches=False,
    )


# --- trimmed mean (robust location) ----------------------------------------
# The robust-statistics gap between median and mean: the 10%-trimmed
# mean per group — rank within group, drop the top and bottom decile,
# average the middle. Rank bounds come from the same window exchange
# that would compute a median; the middle-band sum accumulates as
# DECIMAL(18,6) of the 2-dp prices (order-proof), and only the final
# mean divides as a double. Deterministic trim membership via the
# (price, orderkey, linenumber) total order — no ties ambiguity.


@register(
    "agg_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    mid AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n_kept,
             sum(CAST(round(l_extendedprice, 6) AS DECIMAL(18,6))) AS s
      FROM r
      WHERE rn > n // 10 AND rn <= n - n // 10
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_kept,
           round(CAST(s AS DOUBLE) / n_kept, 6) AS trimmed_mean
    FROM mid
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of extended price per return flag with
    decimal-exact middle-band accumulation."""

    li = rt(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number()
        .over(w.orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    mid = (
        r.where(
            (F.col("rn") > F.floor(F.col("n") / 10))
            & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum(F.round("l_extendedprice", 6).cast("decimal(18,6)")).alias("s"),
        )
    )
    return mid.select(
        "l_returnflag",
        "n_kept",
        F.round(F.col("s").cast("double") / F.col("n_kept"), 6).alias(
            "trimmed_mean"
        ),
    )


# --- winsorized mean --------------------------------------------------------
# agg_trimmed_mean's sibling: instead of DROPPING the tail deciles,
# CLAMP every value to the kept band's [min, max] — all rows keep a
# vote, outliers just lose their leverage (the estimator insurance
# pricing and latency SLOs prefer, since n stays the full n). Same
# rank exchange as the trim; the clamp bounds are the kept band's
# endpoints (deterministic via the total order), and the clamped sum
# accumulates as DECIMAL(18,6), so the mean is engine-exact.


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    bounds AS (
      SELECT l_returnflag,
             min(l_extendedprice) AS lo,
             max(l_extendedprice) AS hi
      FROM r WHERE rn > n // 10 AND rn <= n - n // 10
      GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(b.lo, 6) AS lo,
           round(b.hi, 6) AS hi,
           round(CAST(sum(CAST(round(least(greatest(r.l_extendedprice, b.lo), b.hi), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
             AS winsorized_mean
    FROM r JOIN bounds b ON r.l_returnflag = b.l_returnflag
    GROUP BY r.l_returnflag, b.lo, b.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-winsorized mean of extended price per return flag: tail
    values clamped to the kept band's endpoints, decimal-exact sum."""

    li = rt(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number()
        .over(w.orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    band = r.where(
        (F.col("rn") > F.floor(F.col("n") / 10))
        & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10))
    )
    bounds = band.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    j = r.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.round(
        F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")), 6
    ).cast("decimal(18,6)")
    return j.groupBy("l_returnflag", "lo", "hi").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum(clamped).cast("double") / F.count("*"), 6).alias(
            "winsorized_mean"
        ),
    ).select(
        "l_returnflag",
        "n_rows",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "winsorized_mean",
    )


# --- forecast backtest (WAPE) ----------------------------------------------
# The eval orders_trend_forecast was missing: fit the per-group trend
# on the FIRST 80% of months only, score the held-out tail, report
# WAPE (Σ|pred−actual| / Σ actual — the scale-free error revenue
# planners quote). Same grouped-sufficient-statistics fit, just
# filtered to the train span (the cutoff is integer arithmetic on the
# group's own month range, so both engines split identically);
# holdout residuals round to 6 dp and accumulate as DECIMAL, making
# the metric engine-exact. Everything is one month-level aggregation
# plus group-sized joins.


@register(
    "orders_forecast_backtest",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS t,
             round(sum(o_totalprice), 6) AS rev
      FROM orders GROUP BY o_orderpriority, t
    ),
    span AS (
      SELECT o_orderpriority,
             min(t) + (max(t) - min(t)) * 4 // 5 AS cutoff
      FROM m GROUP BY o_orderpriority
    ),
    s AS (
      SELECT m.o_orderpriority, count(*) * 1.0 AS n,
             round(sum(m.t), 6) AS sx, round(sum(m.rev), 6) AS sy,
             round(sum(m.t * m.t), 6) AS sxx, round(sum(m.t * m.rev), 6) AS sxy
      FROM m JOIN span ON m.o_orderpriority = span.o_orderpriority
      WHERE m.t <= span.cutoff
      GROUP BY m.o_orderpriority
    ),
    fit AS (
      SELECT o_orderpriority,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS icept
      FROM s
    ),
    holdout AS (
      SELECT m.o_orderpriority,
             CAST(round(abs(f.icept + f.slope * m.t - m.rev), 6)
                  AS DECIMAL(28,6)) AS abs_err,
             CAST(round(m.rev, 6) AS DECIMAL(28,6)) AS actual
      FROM m
      JOIN span ON m.o_orderpriority = span.o_orderpriority
      JOIN fit f ON m.o_orderpriority = f.o_orderpriority
      WHERE m.t > span.cutoff
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_holdout_months,
           round(CAST(sum(abs_err) AS DOUBLE)
                 / CAST(sum(actual) AS DOUBLE), 6) AS wape
    FROM holdout GROUP BY o_orderpriority
    """,
)
def orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out WAPE of the per-priority monthly revenue trend: fit
    on the first 80% of each group's months, score the tail."""
    o = rt(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_orderpriority",
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).alias("t"),
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    span = m.groupBy("o_orderpriority").agg(
        (
            F.min("t") + F.floor((F.max("t") - F.min("t")) * 4 / 5)
        ).alias("cutoff")
    )
    mj = m.join(F.broadcast(span), "o_orderpriority")
    s = (
        mj.where(F.col("t") <= F.col("cutoff"))
        .groupBy("o_orderpriority")
        .agg(
            (F.count("*") * F.lit(1.0)).alias("n"),
            F.round(F.sum("t"), 6).alias("sx"),
            F.round(F.sum("rev"), 6).alias("sy"),
            F.round(F.sum(F.col("t") * F.col("t")), 6).alias("sxx"),
            F.round(F.sum(F.col("t") * F.col("rev")), 6).alias("sxy"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        "o_orderpriority",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("icept"),
    )
    holdout = (
        mj.where(F.col("t") > F.col("cutoff"))
        .join(F.broadcast(fit), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.round(
                F.abs(F.col("icept") + F.col("slope") * F.col("t") - F.col("rev")),
                6,
            )
            .cast("decimal(28,6)")
            .alias("abs_err"),
            F.round("rev", 6).cast("decimal(28,6)").alias("actual"),
        )
    )
    return holdout.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_holdout_months"),
        F.round(
            F.sum("abs_err").cast("double") / F.sum("actual").cast("double"), 6
        ).alias("wape"),
    )
