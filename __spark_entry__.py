"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2.2 (plus the KG pipeline stages and the training-data
operators); ``oracle_sql()`` provides an exact ANSI-SQL twin for
DuckDB wherever the operator is SQL-expressible.

Float discipline (driver compares order-insensitive value hashes):
money-like aggregates are emitted as integer cents
(``CAST(ROUND(x*100) AS BIGINT)``); ratio outputs are single IEEE
divisions (bit-identical across engines) rounded to fixed decimals.
Column names are aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lexicator_spark.operators import dedup as D  # noqa: E402
from lexicator_spark.operators import similarity as SIM  # noqa: E402
from lexicator_spark.operators import textstats as TS  # noqa: E402
from lexicator_spark.operators.asof import asof_join, sessionize  # noqa: E402
from lexicator_spark.operators.canonicalize import connected_components  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _cents(col) -> F.Column:
    return F.round(col * 100, 0).cast("bigint")


# ===========================================================================
# entry — flagship: KG-style mention extraction + linking over documents
# ===========================================================================
KG_TERMS = ["spark", "stream", "vector", "hash", "window", "join", "merge"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: extract catalog-term mentions from
    documents (Stage-A analog), join to language-ID (enrichment), and
    aggregate mention counts per (term, lang_pred) — scan → extract →
    join → agg end-to-end."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    mentions = _kg_extract_mentions(spark, sf_dir)
    langs = TS.with_langid(docs).select("doc_id", "lang_pred")
    return (
        mentions.join(langs, "doc_id")
        .groupBy("term", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_mentions"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("term", "lang_pred")
    )


# ===========================================================================
# relational core (TPC-H-ish)
# ===========================================================================
def _q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            _cents(F.sum("l_extendedprice")).alias("sum_base_price_c"),
            _cents(F.sum(disc_price)).alias("sum_disc_price_c"),
            _cents(F.sum(charge)).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(ROUND(sum(l_extendedprice) * 100, 0) AS BIGINT) AS sum_base_price_c,
       CAST(ROUND(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS sum_disc_price_c,
       CAST(ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100, 0) AS BIGINT) AS sum_charge_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q3(spark, sf):
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(_cents(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderpriority,
       CAST(ROUND(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue_c DESC, l_orderkey
LIMIT 10
"""


def _q5(spark, sf):
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_cents(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_c"))
    )


_Q5_SQL = """
SELECT n_name,
       CAST(ROUND(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def _q17(spark, sf):
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + join, the classic
    rewrite Catalyst applies to the subquery form.  Exact cross-engine
    float discipline: l_quantity is integral so per-part sums/avgs are
    exact doubles; the final sum is emitted in cents."""
    li = _t(spark, sf, "lineitem")
    part = (
        _t(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    qty_limit = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(qty_limit, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(_cents(F.sum("l_extendedprice") / 7.0).alias("avg_yearly_c"))
    )


_Q17_SQL = """
SELECT CAST(ROUND(sum(l_extendedprice) / 7.0 * 100, 0) AS BIGINT) AS avg_yearly_c
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (
    SELECT avg(l2.l_quantity) * 0.2 FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


def _join_broadcast(spark, sf):
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
        )
    )


_JOIN_BROADCAST_SQL = """
SELECT p_brand, count(*) AS n_items, CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def _join_left_outer(spark, sf):
    """Left outer join with null-side aggregation: every customer,
    order counts/revenue where present, zeros where not."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            _cents(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "big_revenue_c"
            ),
        )
    )


_JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey,
       count(o_orderkey) AS n_big_orders,
       CAST(ROUND(coalesce(sum(o_totalprice), 0.0) * 100, 0) AS BIGINT) AS big_revenue_c
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 150000
GROUP BY c_custkey
"""


def _join_full_outer(spark, sf):
    """Full outer join over two disjointly-filtered order slices:
    rows surviving on either side, null-tagged."""
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey_a"),
        F.col("o_orderkey").alias("key_a"),
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey_b"),
        F.col("o_orderkey").alias("key_b"),
    )
    return (
        a.join(b, a.key_a == b.key_b, "full")
        .select(
            F.coalesce(F.col("key_a"), F.col("key_b")).alias("o_orderkey"),
            F.col("key_a").isNotNull().alias("is_urgent"),
            F.col("key_b").isNotNull().alias("is_finished"),
        )
    )


_JOIN_FULL_OUTER_SQL = """
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       a.o_orderkey IS NOT NULL AS is_urgent,
       b.o_orderkey IS NOT NULL AS is_finished
FROM (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') a
FULL OUTER JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') b
  ON a.o_orderkey = b.o_orderkey
"""


def _semi_join(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""


def _anti_join(spark, sf):
    """Customers with no URGENT order.  The filtered right side makes
    the result non-empty at every sf (an unfiltered anti vs orders
    returned 0 rows — a vacuous correctness check)."""
    cust = _t(spark, sf, "customer")
    urgent = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def _window_topk(spark, sf):
    orders = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def _window_running(spark, sf):
    li = _t(spark, sf, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w).cast("bigint").alias("running_qty"),
    )


_WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(l_quantity) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
FROM lineitem
"""


def _window_lag_lead(spark, sf):
    """Analytic + distribution window functions over one per-user
    event window: lag/lead/gap plus ntile / percent_rank / cume_dist.
    Subsumes the retired r3 window_distribution query (same function
    family, one registry slot)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (epoch_us - F.lag(epoch_us).over(w)).alias("gap_us"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_WINDOW_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _grouping_sets(spark, sf):
    """GROUPING SETS spanning the full cube lattice of (status,
    priority) — the explicit-set spelling of ``CUBE``, whose sets also
    contain every ``ROLLUP`` prefix, plus summed quantity so both agg
    shapes of the retired r3 agg_rollup/agg_cube queries stay
    driver-checked in this one entry."""
    _t(spark, sf, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               sum(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS total_c
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


# outer CAST: DuckDB promotes sum(BIGINT) to HUGEINT
_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_c
FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                    (o_orderstatus), (o_orderpriority), ())
"""


def _distinct_agg(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


_DISTINCT_AGG_SQL = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_suppkey
"""


def _topk_global(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", _cents(F.col("o_totalprice")).alias("o_totalprice_c"))
    )


_TOPK_GLOBAL_SQL = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_c
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def _set_ops(spark, sf):
    """INTERSECT and EXCEPT ALL in one op-tagged driver row (r5 fold
    of the r4 ``set_intersect`` + ``set_except`` entries — identical
    inputs and semantics, freeing snapshot budget for the round's new
    KG queries).  Customers of finished orders ∩ / ∖ customers of
    urgent orders; both sides filtered so both halves are non-empty at
    every sf (the r3 all-order-placers form was vacuous)."""
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    inter = a.intersect(b).select(F.lit("intersect").alias("op"), "o_custkey")
    exc = (
        a.distinct()
        .exceptAll(b.distinct())
        .select(F.lit("except_all").alias("op"), "o_custkey")
    )
    return inter.unionByName(exc)


_SET_OPS_SQL = """
SELECT 'intersect' AS op, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
UNION ALL
SELECT 'except_all' AS op, o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def _string_funcs(spark, sf):
    cust = _t(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.length(F.col("c_name")).alias("name_len"),
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).alias("name_digits"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001")).alias("lev"),
    )


_STRING_FUNCS_SQL = """
SELECT c_custkey, upper(c_name) AS name_upper,
       CAST(length(c_name) AS INT) AS name_len,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       CAST(levenshtein(c_name, 'Customer#000000001') AS INT) AS lev
FROM customer
"""


def _json_extract(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def _time_bucket(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), _cents(F.sum("value")).alias("sum_value_c"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value_c")
    )


_TIME_BUCKET_SQL = """
SELECT to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT))::TIMESTAMP AS bucket,
       event_type, count(*) AS n,
       CAST(ROUND(sum(value) * 100, 0) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1, 2
"""


def _sessionize_q(spark, sf):
    ev = _t(spark, sf, "events")
    sess = sessionize(ev, by="user_id", ts_col="ts", gap_minutes=30)
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM gaps GROUP BY user_id
"""


def _asof_q(spark, sf):
    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases, views.select("user_id", "ts", "value"), on="ts", by="user_id",
        right_value="value", alias="last_view_value",
    )
    return out.select(
        "event_id", "user_id", _cents(F.col("last_view_value")).alias("last_view_value_c")
    )


_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, NULL::DOUBLE AS rv, 1 AS side, event_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, value AS rv, 0 AS side, NULL AS event_id
  FROM events WHERE event_type = 'view'
), filled AS (
  SELECT event_id, user_id, side,
         last_value(rv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
  FROM tagged
)
SELECT event_id, user_id,
       CAST(ROUND(last_view_value * 100, 0) AS BIGINT) AS last_view_value_c
FROM filled WHERE side = 1
"""


def _range_join(spark, sf):
    """Range join keyed on (user_id, 5-min time bucket): the probe side
    explodes to its bucket and the previous one, so any in-range pair
    shares a join key and a hot user never goes quadratic — candidates
    per error are bounded by that user's events in a 10-min span, not
    their full history."""
    ev = _t(spark, sf, "events")
    bucket = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp_ltz")) / F.lit(300_000_000)
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id"),
        F.col("ts").alias("err_ts"),
        F.explode(F.array(bucket - 1, bucket)).alias("bkt"),
    )
    cands = ev.select("user_id", F.col("ts").alias("ev_ts"), bucket.alias("bkt"))
    return (
        errors.join(cands, ["user_id", "bkt"])
        .filter(
            (F.col("ev_ts") < F.col("err_ts"))
            & (F.col("ev_ts") >= F.col("err_ts") - F.expr("INTERVAL 5 MINUTES"))
        )
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_prior_5min"))
    )


_RANGE_JOIN_SQL = """
SELECT e.event_id AS err_id, count(*) AS n_prior_5min
FROM events e JOIN events x ON e.user_id = x.user_id
WHERE e.event_type = 'error'
  AND x.ts < e.ts AND x.ts >= e.ts - INTERVAL 5 MINUTE
GROUP BY e.event_id
"""


def _pivot_status(spark, sf):
    orders = _t(spark, sf, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in statuses],
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS n_F,
       count(*) FILTER (o_orderstatus = 'O') AS n_O,
       count(*) FILTER (o_orderstatus = 'P') AS n_P
FROM orders GROUP BY o_orderpriority
"""


def _approx_aggs(spark, sf):
    """HLL distinct + approximate quantiles — sketch outputs are
    engine-specific, so this is a rows-only check; exactness bounds
    are asserted in tests/test_entry_queries.py instead."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99_price"),
    )


def _group_assembly(spark, sf):
    """Ordered per-group assembly (lexicator's page→lexeme fold,
    SURVEY.md §2 #7): per user, the event-type sequence in stable
    (ts, event_id) order collapsed to a signature string."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ",",
        ).alias("event_seq"),
        F.count(F.lit(1)).alias("n_events"),
    )


_GROUP_ASSEMBLY_SQL = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


# ===========================================================================
# KG operators over testdata
# ===========================================================================
def _kg_extract_mentions(spark, sf):
    docs = _t(spark, sf, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != F.lit(""))
    )
    terms = F.array(*[F.lit(t) for t in KG_TERMS])
    return docs.select(
        "doc_id", F.explode(F.array_intersect(toks, terms)).alias("term")
    )


def _kg_mention_spans(spark, sf):
    """Mention spans over documents: (doc_id, term, [start, end)) of
    the term's first occurrence in the lowercased text — the §1.2 span
    field as an oracle-checkable query (both engines use plain
    first-substring position, so values match exactly)."""
    docs = _t(spark, sf, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != F.lit(""))
    )
    terms = F.array(*[F.lit(t) for t in KG_TERMS])
    start = F.position(F.col("term"), F.col("lt")) - 1
    return (
        docs.select(
            "doc_id",
            F.lower(F.col("text")).alias("lt"),
            F.explode(F.array_intersect(toks, terms)).alias("term"),
        )
        .select(
            "doc_id",
            "term",
            start.cast("bigint").alias("start"),
            (start + F.length("term")).cast("bigint").alias("end"),
        )
    )


_KG_MENTION_SPANS_SQL = f"""
WITH mentions AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term IN ({", ".join(repr(t) for t in KG_TERMS)})
)
SELECT m.doc_id, m.term,
       CAST(strpos(lower(d.text), m.term) - 1 AS BIGINT) AS start,
       CAST(strpos(lower(d.text), m.term) - 1 + length(m.term) AS BIGINT) AS "end"
FROM mentions m JOIN documents d ON m.doc_id = d.doc_id
"""


def _kg_span_proximity(spark, sf):
    """Span-based theta self-join (§2.2): pairs of distinct terms in
    the same document whose spans overlap or sit within 30 characters
    — the mention-conflict/nearby-mention join that span offsets
    enable.  term_a is the POSITIONALLY earlier mention (ties broken
    by term), so pair dedup never conflates lexicographic and
    positional order — "zebra … apple" pairs exactly like
    "apple … zebra"."""
    # pinned: the span extraction feeds both sides of the theta
    # self-join — un-pinned, the corpus tokenize + position scan ran
    # twice; the pinned frame is (doc, term, start, end), vocabulary-
    # bounded per doc
    spans = _kg_mention_spans(spark, sf).localCheckpoint(eager=True)
    a = spans.select(
        "doc_id",
        F.col("term").alias("term_a"),
        F.col("start").alias("start_a"),
        F.col("end").alias("end_a"),
    )
    b = spans.select(
        "doc_id",
        F.col("term").alias("term_b"),
        F.col("start").alias("start_b"),
        F.col("end").alias("end_b"),
    )
    earlier = (F.col("start_a") < F.col("start_b")) | (
        (F.col("start_a") == F.col("start_b"))
        & (F.col("term_a") < F.col("term_b"))
    )
    return (
        a.join(b, "doc_id")
        .filter(
            (F.col("term_a") != F.col("term_b"))
            & earlier
            & (F.col("start_b") - F.col("end_a") <= 30)
        )
        .select(
            "doc_id",
            "term_a",
            "term_b",
            (F.col("start_b") - F.col("end_a")).cast("bigint").alias("gap"),
        )
    )


_KG_SPAN_PROXIMITY_SQL = f"""
WITH mentions AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term IN ({", ".join(repr(t) for t in KG_TERMS)})
), spans AS (
  SELECT m.doc_id, m.term,
         CAST(strpos(lower(d.text), m.term) - 1 AS BIGINT) AS s,
         CAST(strpos(lower(d.text), m.term) - 1 + length(m.term) AS BIGINT) AS e
  FROM mentions m JOIN documents d ON m.doc_id = d.doc_id
)
SELECT a.doc_id, a.term AS term_a, b.term AS term_b,
       CAST(b.s - a.e AS BIGINT) AS gap
FROM spans a JOIN spans b
  ON a.doc_id = b.doc_id AND a.term <> b.term
WHERE (a.s < b.s OR (a.s = b.s AND a.term < b.term))
  AND b.s - a.e <= 30
"""


def _kg_cooccurrence(spark, sf):
    m = _kg_extract_mentions(spark, sf)
    a = m.select("doc_id", F.col("term").alias("term_a"))
    b = m.select("doc_id", F.col("term").alias("term_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_KG_COOCCURRENCE_SQL = f"""
WITH mentions AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term IN ({", ".join(repr(t) for t in KG_TERMS)})
)
SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_docs
FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY 1, 2
"""


def _kg_khop_reachable(spark, sf):
    """Bounded BFS (operators/graph.py::khop_distances) over the
    bipartite doc↔term mention graph: minimum hop distance from the
    lexicographically first mentioned term, cut at 3 hops — "what is
    within N relations of this entity", the neighborhood query a KG
    exists to answer.  Node ids are namespaced (``d:<doc_id>`` /
    ``t:<term>``) so the two vertex families can't collide.  The
    DuckDB twin is a recursive CTE with a min-per-node finish, so the
    iterative-join BFS loop is oracle-checked exactly (unlike
    PageRank, plain BFS has no aggregation inside the recursion and IS
    recursive-SQL-expressible)."""
    from lexicator_spark.operators import graph as G

    # pinned: the mention extraction (corpus tokenize + explode) feeds
    # both the edge frame and the seed aggregate — un-pinned it ran
    # twice per query (khop_distances pins the adjacency, but the seed
    # branch re-derived the whole extraction); the pinned frame is the
    # distinct (doc, term) set, vocabulary-bounded per doc
    m = _kg_extract_mentions(spark, sf).localCheckpoint(eager=True)
    edges = m.select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("a"),
        F.concat(F.lit("t:"), F.col("term")).alias("b"),
    )
    seeds = m.agg(F.concat(F.lit("t:"), F.min("term")).alias("node"))
    return G.khop_distances(edges, seeds, k=3)


_KG_KHOP_SQL = f"""
WITH RECURSIVE mentions AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term IN ({", ".join(repr(t) for t in KG_TERMS)})
), adj AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 't:' || term AS dst FROM mentions
  UNION ALL
  SELECT 't:' || term, 'd:' || CAST(doc_id AS VARCHAR) FROM mentions
), bfs AS (
  SELECT 't:' || (SELECT min(term) FROM mentions) AS node, 0 AS d
  UNION
  SELECT a.dst, b.d + 1 FROM bfs b JOIN adj a ON b.node = a.src WHERE b.d < 3
)
SELECT node, CAST(min(d) AS INTEGER) AS dist FROM bfs GROUP BY node
"""


def _kg_negative_samples(spark, sf):
    """Deterministic tail-corruption negative sampling
    (operators/graph.py::negative_samples) over the documents mention
    triples — the KG-embedding training-data op: one corrupted
    ``(subj, pred, neg_obj)`` per positive, ``neg_obj ≠ obj``
    guaranteed algebraically by the md5-keyed ring walk over the
    entity vocabulary.  md5 hashes identically in DuckDB, so the
    whole sampler (vocabulary indexing, hash shift, both joins) has an
    exact SQL twin — a property no RNG-based sampler can offer."""
    from lexicator_spark.operators import graph as G

    m = _kg_extract_mentions(spark, sf)
    triples = m.select(
        F.col("doc_id").cast("bigint").alias("subj"),
        F.lit("mentions").alias("pred"),
        F.col("term").alias("obj"),
    )
    return G.negative_samples(triples)


_KG_NEGSAMPLES_SQL = f"""
WITH mentions AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term IN ({", ".join(repr(t) for t in KG_TERMS)})
), trip AS (
  SELECT CAST(doc_id AS BIGINT) AS subj, 'mentions' AS pred, term AS obj
  FROM mentions
), vocab AS (
  SELECT entity, row_number() OVER (ORDER BY entity) - 1 AS idx
  FROM (SELECT DISTINCT obj AS entity FROM trip)
), n AS (
  SELECT count(*) AS n FROM vocab
), shifted AS (
  SELECT t.subj, t.pred, t.obj,
         (v.idx + 1 +
          (CAST(concat('0x', substr(md5(CAST(t.subj AS VARCHAR) || '|' ||
                                        t.pred || '|' || t.obj),
                       1, 8)) AS BIGINT) % (n.n - 1))) % n.n AS neg_idx
  FROM trip t JOIN vocab v ON t.obj = v.entity CROSS JOIN n
)
SELECT s.subj, s.pred, s.obj, v2.entity AS neg_obj
FROM shifted s JOIN vocab v2 ON s.neg_idx = v2.idx
"""


def _kg_connected_components(spark, sf):
    """CC over per-user event chains: edge = (event, next event of the
    same user).  Chains are the adversarial case for label propagation
    (diameter = chain length); large-star/small-star resolves them in
    O(log n) rounds.  Node ids zero-padded so string-min == numeric-min,
    which gives the oracle a closed form (min event per user)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    node = F.concat(F.lit("e"), F.lpad(F.col("event_id").cast("string"), 8, "0"))
    nxt = F.lead(node).over(w)
    edges = (
        ev.select(node.alias("u"), nxt.alias("v"))
        .filter(F.col("v").isNotNull())
    )
    return connected_components(edges).select("node", "comp")


_KG_CC_SQL = """
WITH chained AS (
  SELECT 'e' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS node,
         min('e' || lpad(CAST(event_id AS VARCHAR), 8, '0'))
           OVER (PARTITION BY user_id) AS comp,
         count(*) OVER (PARTITION BY user_id) AS n_user_events
  FROM events
)
SELECT node, comp FROM chained WHERE n_user_events > 1
"""


# The deterministic synth transcript corpus as a committed parquet
# fixture: the Spark queries and the DuckDB oracles read the SAME file
# (scripts/make_fixtures.py regenerates it; pytest asserts the file
# still equals a fresh synth.make_corpus(300, seed=42) so it can never
# drift from the generator).
_SYNTH_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tests", "fixtures", "synth_corpus_n300_s42.parquet",
)


def _synth_turns(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(_SYNTH_FIXTURE)


def _kg_claims_qualifiers(spark, sf):
    """Claim-qualifier view over the synthetic transcript corpus
    (SURVEY §1.1: template params → sorted qualifier structs).  The
    parquet test tables carry no template syntax, so like
    kg_pipeline_triples this runs on the deterministic synth-corpus
    fixture; the DuckDB twin re-parses the templates with the same
    regex + keep-last override semantics."""
    from lexicator_spark.operators.extract import claims_with_qualifiers, extract_triples

    claims = claims_with_qualifiers(extract_triples(_synth_turns(spark)))
    return claims.select(
        "subj",
        "template",
        F.concat_ws(
            ",",
            F.transform(
                "qualifiers", lambda q: F.concat_ws("=", q["key"], q["value"])
            ),
        ).alias("qualifiers_kv"),
        "n_qualifiers",
    )


def _kg_entity_tool_affinity(spark, sf):
    """SURVEY §3's flagship KG question: which canonical entities are
    mentioned in conversations that used tool X?  Runs the full
    pipeline on the synth-corpus fixture, maps mention surfaces to
    canonical ids through the CC output, joins to tool usage by
    conversation — the DuckDB twin re-runs extraction, blocking-key +
    shingle-Jaccard linking, and a recursive-CTE connected components
    over the same fixture; exact equality vs the pure-Python oracle
    additionally held in tests/test_pipeline.py."""
    from lexicator_spark import rules
    from lexicator_spark.operators.canonicalize import (
        canonical_of_triples,
        connected_components,
    )
    from lexicator_spark.operators.extract import extract_triples, split_rejects
    from lexicator_spark.operators.link import build_catalog, link_mentions

    triples, _ = split_rejects(extract_triples(_synth_turns(spark)))
    same_as = link_mentions(triples, build_catalog(spark))
    assignments = connected_components(
        same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
    )
    canonical = canonical_of_triples(assignments)
    surface_canon = canonical.select(
        F.col("subj").alias("surface"), F.col("obj").alias("canonical_id")
    )
    mentions = triples.filter(F.col("pred") == rules.PRED_MENTIONS).select(
        "conv_id", F.col("obj").alias("surface")
    )
    tools = triples.filter(F.col("pred") == rules.PRED_USES_TOOL).select(
        "conv_id", F.col("obj").alias("tool")
    )
    return (
        mentions.join(F.broadcast(surface_canon), "surface")
        .join(tools, "conv_id")
        .groupBy("tool", "canonical_id")
        .agg(F.countDistinct("conv_id").alias("n_convs"))
    )


def _kg_pipeline_triples(spark, sf):
    """Full KG pipeline (extract→link→canonicalize) on the
    deterministic synth-corpus fixture.  The DuckDB twin expresses the
    ENTIRE pipeline in SQL — regex extraction of all five text rules,
    the lag-window replies, blocking-key + shingle-Jaccard linking
    with the window best-pick, and connected components as a recursive
    CTE — so the iterative-CC operator is oracle-checked end to end,
    not just rows-counted; pytest additionally holds the P/R gate."""
    from lexicator_spark.operators.canonicalize import canonical_of_triples
    from lexicator_spark.operators.extract import extract_triples, split_rejects
    from lexicator_spark.operators.link import build_catalog, link_mentions

    triples, _rej = split_rejects(extract_triples(_synth_turns(spark)))
    same_as = link_mentions(triples, build_catalog(spark))
    assignments = connected_components(
        same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
    )
    canonical = canonical_of_triples(assignments)
    return triples.unionByName(same_as).unionByName(canonical).select(
        "subj", "pred", "obj"
    )


def _kg_entities_dim(spark, sf):
    """The entities DIMENSION table derived end-to-end from the synth
    fixture (the in-memory twin of the pipeline's ``entities`` stage,
    ``plans/pipeline.py::stage_entities``): canonical membership from
    the CC output, Stage-B link scores, blocking keys, and per-surface
    corpus aggregates (mention count, distinct conversations, first /
    last seen as epoch micros — integer timestamps so both engines
    hash identically).  The DuckDB twin recomputes every column,
    including the recursive-CTE connected components."""
    from lexicator_spark import rules
    from lexicator_spark.operators.canonicalize import (
        canonical_of_triples,
        connected_components,
    )
    from lexicator_spark.operators.extract import extract_triples, split_rejects
    from lexicator_spark.operators.link import _block_key, build_catalog, link_mentions

    triples, _ = split_rejects(extract_triples(_synth_turns(spark)))
    same_as = link_mentions(triples, build_catalog(spark))
    assignments = connected_components(
        same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
    )
    canonical = canonical_of_triples(assignments)
    members = (
        canonical.select(
            F.col("obj").alias("canonical_id"), F.col("subj").alias("surface_form")
        )
        .union(
            canonical.select(
                F.col("obj").alias("canonical_id"), F.col("obj").alias("surface_form")
            )
        )
        .distinct()
    )
    link_scores = same_as.select(
        F.col("subj").alias("surface_form"), F.col("conf").alias("score")
    )
    mention_stats = (
        triples.filter(F.col("pred") == rules.PRED_MENTIONS)
        .groupBy(F.col("obj").alias("surface_form"))
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.unix_micros(F.min("extracted_at")).alias("first_seen_us"),
            F.unix_micros(F.max("extracted_at")).alias("last_seen_us"),
        )
    )
    return (
        members.join(link_scores, "surface_form", "left")
        .join(mention_stats, "surface_form", "left")
        .select(
            "canonical_id",
            "surface_form",
            _block_key(F.col("surface_form")).alias("block_key"),
            F.coalesce(
                F.col("score"),
                F.when(F.col("surface_form") == F.col("canonical_id"), 1.0),
            ).alias("score"),
            F.coalesce(F.col("n_mentions"), F.lit(0)).alias("n_mentions"),
            F.coalesce(F.col("n_convs"), F.lit(0)).alias("n_convs"),
            "first_seen_us",
            "last_seen_us",
            (F.col("surface_form") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def _kg_degree_distribution(spark, sf):
    """Degree histogram of the co-mention graph (entities connected
    iff mentioned in the same conversation) — the structural sanity
    check on the constructed KG.  Exact SQL twin over the fixture."""
    from lexicator_spark import rules
    from lexicator_spark.operators import graph as G
    from lexicator_spark.operators.extract import extract_triples, split_rejects

    triples, _ = split_rejects(extract_triples(_synth_turns(spark)))
    mentions = triples.filter(F.col("pred") == rules.PRED_MENTIONS).select(
        "conv_id", F.col("obj").alias("surface")
    )
    return G.degree_distribution(G.cooccurrence_edges(mentions)[0])


def _kg_pagerank_top(spark, sf):
    """Top-10 entities of the co-mention graph by WEIGHTED PageRank
    run to CONVERGENCE (operators/graph.py::pagerank with
    ``tol=1e-8`` early-exit and ``weight_col="n_groups"`` — edge
    weight = number of conversations the pair co-occurs in), so the
    driver-visible query exercises the same tol/weighted machinery the
    pytest twins gate.  No SQL oracle: standard SQL forbids
    aggregation in a recursive term, so the iteration isn't
    expressible as a recursive CTE; exactness vs a pure-Python
    implementation of the identical update rule (incl. dangling
    redistribution, tol stop, and weights) is gated in
    tests/test_graph.py."""
    from lexicator_spark import rules
    from lexicator_spark.operators import graph as G
    from lexicator_spark.operators.extract import extract_triples, split_rejects

    triples, _ = split_rejects(extract_triples(_synth_turns(spark)))
    mentions = triples.filter(F.col("pred") == rules.PRED_MENTIONS).select(
        "conv_id", F.col("obj").alias("surface")
    )
    edges, _overflow = G.cooccurrence_edges(mentions, weighted=True)
    ranks = G.pagerank(edges, iterations=50, tol=1e-8, weight_col="n_groups")
    return ranks.orderBy(F.col("rank").desc(), "node").limit(10)


def _kg_triangle_count(spark, sf):
    """Global triangle count of the co-mention graph via the
    degree-ordered orientation (operators/graph.py) — exact integer,
    so the naive u<v<w three-way self-join in DuckDB is a full oracle
    for the scale-aware Spark plan."""
    from lexicator_spark import rules
    from lexicator_spark.operators import graph as G
    from lexicator_spark.operators.extract import extract_triples, split_rejects

    triples, _ = split_rejects(extract_triples(_synth_turns(spark)))
    mentions = triples.filter(F.col("pred") == rules.PRED_MENTIONS).select(
        "conv_id", F.col("obj").alias("surface")
    )
    return G.triangle_count(G.cooccurrence_edges(mentions)[0])


def _synth_kg_sql() -> dict[str, str]:
    """DuckDB twins for the three synth-corpus KG queries, built from
    the SAME rule module the Spark stages use (patterns + catalog are
    interpolated from lexicator_spark.rules, so the two engines can
    never drift on rule content).  The shared CTE block re-implements,
    in pure SQL over the parquet fixture: regex extraction (mentions /
    wikilinks / depends_on / template invocations with keep-last param
    override), blocking-key + char-3-gram-Jaccard linking with the
    deterministic window best-pick, and connected components over the
    same_as graph as a recursive CTE (min-label transitive closure)."""
    from lexicator_spark import rules as R

    cat_values = ", ".join(
        f"('{qid}', '{alias}')" for qid, alias in R.catalog_rows()
    )
    # one source of truth for normalization: lower + collapse
    # non-alphanumeric runs + trim (rules.normalize_surface)
    shared = """
turns AS (SELECT conv_id, turn_idx, text, tool FROM read_parquet('__FIXTURE__')),
ment AS (
  SELECT DISTINCT conv_id, turn_idx,
         trim(regexp_replace(lower(raw), '[^a-z0-9]+', ' ', 'g')) AS surface
  FROM (
    SELECT conv_id, turn_idx, unnest(regexp_extract_all(text, '__MENTION_RE__')) AS raw FROM turns
    UNION ALL
    SELECT conv_id, turn_idx, unnest(regexp_extract_all(text, '__WIKILINK_RE__', 1)) AS raw FROM turns
  )
),
surfaces AS (SELECT DISTINCT surface FROM ment WHERE length(surface) > 0),
cat AS (SELECT * FROM (VALUES __CAT_VALUES__) t(canonical_id, alias_norm)),
s_feat AS (
  SELECT surface,
         list_distinct(list_transform(range(1, greatest(1, length(surface) - 2) + 1),
                                      i -> substr(surface, i, 3))) AS sh,
         substr(surface, 1, 1) || CAST(length(surface) // 4 AS VARCHAR) AS blk
  FROM surfaces
),
c_feat AS (
  SELECT canonical_id, alias_norm,
         list_distinct(list_transform(range(1, greatest(1, length(alias_norm) - 2) + 1),
                                      i -> substr(alias_norm, i, 3))) AS sh,
         substr(alias_norm, 1, 1) || CAST(length(alias_norm) // 4 AS VARCHAR) AS blk
  FROM cat
),
scored AS (
  SELECT s.surface, c.canonical_id, c.alias_norm,
         CAST(len(list_intersect(s.sh, c.sh)) AS DOUBLE)
         / CAST(len(s.sh) + len(c.sh) - len(list_intersect(s.sh, c.sh)) AS DOUBLE) AS score
  FROM s_feat s JOIN c_feat c ON s.blk = c.blk
),
same_as AS (
  SELECT surface, canonical_id FROM (
    SELECT surface, canonical_id, score,
           row_number() OVER (PARTITION BY surface
                              ORDER BY score DESC, canonical_id, alias_norm) AS rn
    FROM scored
  ) WHERE rn = 1 AND score >= __LINK_THRESHOLD__
),
edges AS (
  SELECT surface AS u, canonical_id AS v FROM same_as
  UNION SELECT canonical_id, surface FROM same_as
),
walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
comp AS (SELECT node, min(reach) AS comp FROM walk GROUP BY node),
canon AS (
  SELECT comp,
         coalesce(min(CASE WHEN starts_with(node, 'Q_') THEN node END), min(node)) AS canonical_id
  FROM comp GROUP BY comp
),
canonical_of AS (
  SELECT c.node, k.canonical_id
  FROM comp c JOIN canon k USING (comp)
  WHERE c.node <> k.canonical_id
),
tpl AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, '__TEMPLATE_RE__')) AS tpl,
         generate_subscripts(regexp_extract_all(text, '__TEMPLATE_RE__'), 1) AS tpl_idx
  FROM turns
),
tparts AS (
  SELECT conv_id, turn_idx, tpl_idx,
         string_split(substr(tpl, 3, length(tpl) - 4), '|') AS ps
  FROM tpl
),
inv AS (SELECT DISTINCT conv_id, turn_idx, ps[1] AS name FROM tparts),
tpairs AS (
  SELECT conv_id, turn_idx, tpl_idx, ps[1] AS name,
         unnest(ps[2:]) AS p, generate_subscripts(ps[2:], 1) AS j
  FROM tparts
),
tkeep AS (
  SELECT conv_id, turn_idx, name, p,
         row_number() OVER (PARTITION BY conv_id, turn_idx, tpl_idx, split_part(p, '=', 1)
                            ORDER BY j DESC) AS rn
  FROM tpairs
)
"""
    pipeline = """
WITH RECURSIVE __SHARED__,
dep AS (
  SELECT DISTINCT conv_id, turn_idx,
         trim(regexp_replace(lower(regexp_extract(m, '(?i)^(.*?) depends on ', 1)), '[^a-z0-9]+', ' ', 'g')) AS a,
         trim(regexp_replace(lower(regexp_extract(m, '(?i) depends on (.*)$', 1)), '[^a-z0-9]+', ' ', 'g')) AS b
  FROM (SELECT conv_id, turn_idx, unnest(regexp_extract_all(text, '__DEPENDS_RE__')) AS m FROM turns)
),
tparam AS (SELECT DISTINCT conv_id, turn_idx, name || '|' || p AS obj FROM tkeep WHERE rn = 1),
rep AS (
  SELECT conv_id, turn_idx,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx
  FROM turns
)
SELECT subj, pred, obj FROM (
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) AS subj, 'uses_tool' AS pred, tool AS obj
  FROM turns WHERE tool IS NOT NULL
  UNION ALL
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR), 'mentions', surface FROM ment
  UNION ALL
  SELECT a, 'depends_on', b FROM dep
  UNION ALL
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR), 'invokes', name FROM inv
  UNION ALL
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR), 'tpl_param', obj FROM tparam
  UNION ALL
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR), 'replies_to',
         conv_id || '#' || CAST(prev_idx AS VARCHAR)
  FROM rep WHERE prev_idx IS NOT NULL
  UNION ALL
  SELECT surface, 'same_as', canonical_id FROM same_as
  UNION ALL
  SELECT node, 'canonical_of', canonical_id FROM canonical_of
)
"""
    affinity = """
WITH RECURSIVE __SHARED__
SELECT t.tool, sc.canonical_id, count(DISTINCT m.conv_id) AS n_convs
FROM ment m
JOIN canonical_of sc ON m.surface = sc.node
JOIN (SELECT conv_id, tool FROM turns WHERE tool IS NOT NULL) t ON m.conv_id = t.conv_id
GROUP BY 1, 2
"""
    claims = """
WITH RECURSIVE __SHARED__,
claims_params AS (
  SELECT DISTINCT conv_id, turn_idx, name,
         split_part(p, '=', 1) AS k,
         substr(p, length(split_part(p, '=', 1)) + 2) AS v
  FROM tkeep WHERE rn = 1
),
qualagg AS (
  SELECT conv_id, turn_idx, name,
         string_agg(k || '=' || v, ',' ORDER BY k, v) AS qualifiers_kv,
         CAST(count(*) AS INT) AS n_qualifiers
  FROM claims_params GROUP BY 1, 2, 3
)
SELECT i.conv_id || '#' || CAST(i.turn_idx AS VARCHAR) AS subj,
       i.name AS template,
       coalesce(q.qualifiers_kv, '') AS qualifiers_kv,
       coalesce(q.n_qualifiers, 0) AS n_qualifiers
FROM inv i LEFT JOIN qualagg q USING (conv_id, turn_idx, name)
"""
    entities_dim = """
WITH RECURSIVE __SHARED__,
members AS (
  -- explicit DISTINCT: in a WITH RECURSIVE block DuckDB 1.0 treats
  -- plain UNION between CTE branches as UNION ALL (no dedup)
  SELECT DISTINCT canonical_id, surface_form FROM (
    SELECT canonical_id, node AS surface_form FROM canonical_of
    UNION ALL
    SELECT canonical_id, canonical_id FROM canonical_of
  )
),
linkscore AS (
  SELECT surface AS surface_form, score FROM (
    SELECT surface, score,
           row_number() OVER (PARTITION BY surface
                              ORDER BY score DESC, canonical_id, alias_norm) AS rn
    FROM scored
  ) WHERE rn = 1 AND score >= __LINK_THRESHOLD__
),
mstats AS (
  SELECT m.surface AS surface_form,
         count(*) AS n_mentions,
         count(DISTINCT m.conv_id) AS n_convs,
         min(epoch_us(t.ts)) AS first_seen_us,
         max(epoch_us(t.ts)) AS last_seen_us
  FROM ment m
  JOIN (SELECT conv_id, turn_idx, ts FROM read_parquet('__FIXTURE__')) t
    USING (conv_id, turn_idx)
  GROUP BY 1
)
SELECT mem.canonical_id,
       mem.surface_form,
       substr(mem.surface_form, 1, 1)
         || CAST(length(mem.surface_form) // 4 AS VARCHAR) AS block_key,
       coalesce(ls.score,
                CASE WHEN mem.surface_form = mem.canonical_id THEN 1.0 END) AS score,
       coalesce(ms.n_mentions, 0) AS n_mentions,
       coalesce(ms.n_convs, 0) AS n_convs,
       ms.first_seen_us,
       ms.last_seen_us,
       mem.surface_form = mem.canonical_id AS is_canonical
FROM members mem
LEFT JOIN linkscore ls USING (surface_form)
LEFT JOIN mstats ms USING (surface_form)
"""
    # co-mention graph: nodes = surfaces, edge iff two surfaces are
    # mentioned in the same conversation (a < b dedup)
    comention = """
e AS (
  SELECT DISTINCT m1.surface AS a, m2.surface AS b
  FROM (SELECT DISTINCT conv_id, surface FROM ment) m1
  JOIN (SELECT DISTINCT conv_id, surface FROM ment) m2 USING (conv_id)
  WHERE m1.surface < m2.surface
)
"""
    degree_dist = (
        "WITH RECURSIVE __SHARED__," + comention + """,
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""
    )
    triangles = (
        "WITH RECURSIVE __SHARED__," + comention + """
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
"""
    )
    out = {}
    for key, sql in (
        ("kg_pipeline_triples", pipeline),
        ("kg_entity_tool_affinity", affinity),
        ("kg_claims_qualifiers", claims),
        ("kg_entities_dim", entities_dim),
        ("kg_degree_distribution", degree_dist),
        ("kg_triangle_count", triangles),
    ):
        out[key] = (
            sql.replace("__SHARED__", shared)
            .replace("__FIXTURE__", _SYNTH_FIXTURE)
            .replace("__MENTION_RE__", R.MENTION_PATTERN)
            .replace("__WIKILINK_RE__", R.WIKILINK_PATTERN)
            .replace("__DEPENDS_RE__", R.DEPENDS_PATTERN)
            .replace("__TEMPLATE_RE__", R.TEMPLATE_FULL_PATTERN)
            .replace("__CAT_VALUES__", cat_values)
            .replace("__LINK_THRESHOLD__", repr(R.LINK_SCORE_THRESHOLD))
        )
    return out


_SYNTH_KG_SQL = _synth_kg_sql()


# ===========================================================================
# dedup / similarity / text analysis
# ===========================================================================
def _dedup_exact(spark, sf):
    docs = _t(spark, sf, "documents")
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def _dedup_tokenset(spark, sf):
    docs = _t(spark, sf, "documents")
    toks = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != F.lit(""))
        )
    )
    return (
        docs.select("doc_id", F.md5(F.concat_ws(" ", toks)).alias("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
    )


_DEDUP_TOKENSET_SQL = """
SELECT md5(array_to_string(list_sort(list_distinct(
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))), ' ')) AS sig,
       min(doc_id) AS keep_id, count(*) AS n_members
FROM documents GROUP BY 1
"""


_JACCARD_MAX_DOC = 120


def _dedup_cluster_assign(spark, sf):
    """Near-dup CLUSTER ASSIGNMENT over exact-Jaccard verified pairs:
    connected components over the pair graph → (doc_id, cluster_id,
    keep) with exactly one keep per cluster and every doc present —
    the linear-output form a training-data dedup actually consumes.
    Exactly SQL-expressible: DuckDB's recursive CTE runs the same
    min-label transitive closure."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < _JACCARD_MAX_DOC)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.6, max_token_df=10**9)
    return D.near_dup_clusters(docs, pairs=pairs)


_DEDUP_CLUSTER_ASSIGN_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
  WHERE doc_id < {_JACCARD_MAX_DOC} AND t.tok <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT c.a, c.b
  FROM common c JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id
  WHERE CAST(c.n_common AS DOUBLE) / CAST(sa.n_tok + sb.n_tok - c.n_common AS DOUBLE) >= 0.6
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
), comp AS (
  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       coalesce(c.cluster_id, d.doc_id) = d.doc_id AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id < {_JACCARD_MAX_DOC}) d
LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


def _corpus_curation(spark, sf):
    """The end-to-end training-data export decision
    (operators/curation.py): quality + langid + token count + exact-
    Jaccard near-dup keep + content-hash train/val split, one row per
    document with keep / first-failing drop_reason.  Capped at the
    exact-Jaccard doc range so the DuckDB twin's quadratic pair join
    stays cheap — the uncapped scale path (star-edge clusters feeding
    the same curate_corpus) is pytest-covered."""
    from lexicator_spark.operators import curation as CU

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < _JACCARD_MAX_DOC)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.6, max_token_df=10**9)
    clusters = D.near_dup_clusters(docs, pairs=pairs)
    return CU.curate_corpus(
        docs,
        clusters=clusters,
        min_tokens=5,
        min_quality_bp=5000,
        allowed_langs=("en",),
        val_pct=10,
    )


def _corpus_curation_sql() -> str:
    stop_list = ", ".join(repr(s) for s in TS.STOPWORDS)
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_JACCARD_MAX_DOC}
), dtoks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM docs, unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n_tok FROM dtoks GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
  FROM dtoks a JOIN dtoks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT c.a, c.b
  FROM common c JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id
  WHERE CAST(c.n_common AS DOUBLE) / CAST(sa.n_tok + sb.n_tok - c.n_common AS DOUBLE) >= 0.6
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
), comp AS (
  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
), keepdup AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) = d.doc_id AS dup_keep
  FROM docs d LEFT JOIN comp c ON d.doc_id = c.doc_id
), t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM docs
), feats AS (
  SELECT doc_id, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
         CAST(len(list_filter(toks, x -> x IN ({stop_list}))) AS DOUBLE) AS ns,
         list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) AS sl
  FROM t
), sel AS (
  SELECT f.doc_id,
         CAST(f.n AS INT) AS n_tokens,
         CAST(floor(5000.0 * f.nd / f.n) AS BIGINT)
           + CAST(floor(3000.0 * (f.n - f.ns) / f.n) AS BIGINT)
           + least(CAST(floor(250.0 * f.sl / f.n) AS BIGINT), 2000) AS quality_bp,
         {_langid_case()} AS lang_pred,
         CAST(concat('0x', substr(md5(f.text), 1, 8)) AS BIGINT) % 100 AS bucket,
         k.dup_keep
  FROM feats f JOIN keepdup k ON f.doc_id = k.doc_id
)
SELECT doc_id, n_tokens, quality_bp, lang_pred,
       CASE WHEN bucket < 10 THEN 'val' ELSE 'train' END AS split,
       dup_keep AND lang_pred IN ('en') AND n_tokens >= 5
         AND quality_bp >= 5000 AS keep,
       CASE WHEN NOT dup_keep THEN 'duplicate'
            WHEN lang_pred NOT IN ('en') THEN 'lang'
            WHEN n_tokens < 5 THEN 'too_short'
            WHEN quality_bp < 5000 THEN 'low_quality' END AS drop_reason
FROM sel
"""


_PACK_BUDGET = 2048


_PACK_BUCKETS = 8


def _corpus_pack_sequences(spark, sf):
    """Token-budget packing of the curated corpus into context
    windows (operators/curation.py::pack_sequences): documents fill
    consecutive ``_PACK_BUDGET``-token bins in doc_id order — the
    deterministic streaming-writer semantics, exactly a window
    cumulative sum in both engines.

    The window partitions on (split, p_bucket) — the scale-safe
    grouping: parallelism = splits × buckets rather than the 2-way
    serial sort a split-only window degenerates to, and bins are a
    per-bucket decision exactly as real pipelines pack (readers
    consume buckets independently).  ``p_bucket = doc_id % 8`` is
    engine-portable so the SQL twin stays exact."""
    from lexicator_spark.operators import curation as CU

    docs = CU.with_split(_t(spark, sf, "documents")).withColumn(
        "p_bucket", F.pmod(F.col("doc_id"), F.lit(_PACK_BUCKETS)).cast("bigint")
    )
    return CU.pack_sequences(
        docs, budget=_PACK_BUDGET, partition_cols=("split", "p_bucket")
    )


_CORPUS_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         doc_id % {_PACK_BUCKETS} AS p_bucket,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
         CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 100 < 10
              THEN 'val' ELSE 'train' END AS split
  FROM documents
), c AS (
  SELECT split, p_bucket, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY split, p_bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT split, CAST(p_bucket AS BIGINT) AS p_bucket, doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin,
       CAST(cum - n_tokens AS BIGINT) AS tokens_before
FROM c
"""


def _dedup_minhash_clusters(spark, sf):
    """The UNCAPPED minhash dedup: full documents table → LINEAR
    star-edge candidates (per LSH bucket, member→hub) → exact-Jaccard
    verify → connected components → cluster assignments.  Both the
    output AND every intermediate are linear in documents even though
    this corpus is pathologically templated: the pair-enumerating form
    would verify 6.5M pairs at sf0.1 (52% of ALL doc pairs are true
    near-dups — quadratic in the DATA, no plan fixes it), the star
    form ≤ docs × bands edges.  Rows-only driver check (LSH banding is
    approximate); cluster agreement vs the pair-verified ground truth
    is gated in pytest."""
    docs = _t(spark, sf, "documents")
    return D.near_dup_clusters(docs, method="minhash_star", threshold=0.6)


_ANN_N_PROBES = 40


def _ann_top1(spark, sf):
    emb = _t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < _ANN_N_PROBES)
    out = SIM.cosine_topk(emb, probes, k=1)
    return out.select("probe_id", "neighbor_id")


_ANN_TOP1_SQL = f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS p FROM embeddings
  WHERE vec_id < {_ANN_N_PROBES}
), corpus AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c FROM embeddings
), flat AS (
  SELECT pr.probe_id, co.neighbor_id,
         list_sum(list_transform(list_zip(pr.p, co.c), z -> z[1] * z[2])) /
         (sqrt(list_sum(list_transform(pr.p, x -> x * x))) *
          sqrt(list_sum(list_transform(co.c, x -> x * x)))) AS score
  FROM probes pr CROSS JOIN corpus co
  WHERE pr.probe_id <> co.neighbor_id
), ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY round(score, 6) DESC, neighbor_id) AS rn
  FROM flat
)
SELECT probe_id, neighbor_id FROM ranked WHERE rn = 1
"""


def _decontam(spark, sf):
    """Benchmark decontamination (operators/decontam.py): flag every
    training doc sharing at least one 8-token word n-gram with an
    eval set — the gate a training pipeline runs right before
    packing.  The eval set is derived deterministically from the
    corpus itself (every 25th doc contributes tokens 3..14 as a
    12-token snippet) so both engines build the identical benchmark
    with no side fixture.  Exactly SQL-expressible; plan shape
    (benchmark n-gram set broadcast-left-joined, one corpus pass,
    map-side-combined per-doc count agg) gated in
    tests/test_decontam.py."""
    from lexicator_spark.operators import decontam as DCM

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    toks = DCM._ordered_tokens(F.col("text"))
    bench = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.concat_ws(" ", F.slice(toks, 3, 12)).alias("text")
    )
    return DCM.decontaminate(docs, bench, n=8)


_DECONTAM_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents
), bench AS (
  SELECT t[3:14] AS bt FROM tok WHERE doc_id % 25 = 0
), bench_grams AS (
  SELECT DISTINCT array_to_string(bt[i:i+7], ' ') AS gram
  FROM bench, unnest(generate_series(1, len(bt) - 7)) AS g(i)
  WHERE len(bt) >= 8
), doc_grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram
  FROM tok, unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8
), counts AS (
  SELECT d.doc_id,
         count(*) AS n_doc_ngrams,
         count(b.gram) AS n_hits
  FROM doc_grams d LEFT JOIN bench_grams b ON d.gram = b.gram
  GROUP BY d.doc_id
)
SELECT t.doc_id,
       COALESCE(c.n_doc_ngrams, 0) AS n_doc_ngrams,
       COALESCE(c.n_hits, 0) AS n_hits,
       CASE WHEN COALESCE(c.n_doc_ngrams, 0) > 0
            THEN CAST(c.n_hits AS DOUBLE) / c.n_doc_ngrams
            ELSE 0.0 END AS contam_frac,
       COALESCE(c.n_hits, 0) >= 1 AS is_contaminated
FROM tok t LEFT JOIN counts c ON t.doc_id = c.doc_id
"""


_NEAR_DUP_THRESHOLD = 0.4


def _dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs, exact mode on a bounded slice
    so the DuckDB twin matches bit-for-bit; the LSH-blocked scale path
    of the same operator is recall-gated in pytest."""
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 250)
    return SIM.embedding_near_dup_pairs(
        emb, threshold=_NEAR_DUP_THRESHOLD, blocked=False
    )


_DEDUP_EMBEDDING_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 250
), pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(
           list_sum(list_transform(list_zip(a.e, b.e), z -> z[1] * z[2])) /
           (sqrt(list_sum(list_transform(a.e, x -> x * x))) *
            sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS cos
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT a, b, CAST(round(cos * 1000000, 0) AS BIGINT) AS cos_micro
FROM pairs WHERE cos >= {_NEAR_DUP_THRESHOLD}
"""


def _ann_lsh(spark, sf):
    emb = _t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < _ANN_N_PROBES)
    return SIM.lsh_ann_topk(emb, probes, k=1, dim=64).select(
        "probe_id", "neighbor_id"
    )


def _text_stats(spark, sf):
    """All per-document text analyses in one driver-visible row:
    whitespace token count + quality basis points (with_quality),
    language id (with_langid), BPE-ish pre-token count
    (with_bpe_token_count), md5 content fingerprint (with_fingerprint),
    the rolling polynomial fingerprint (with_rolling_fingerprint), and
    the Gopher-style duplicate-3-gram repetition fraction
    (with_repetition, r5).
    Supersedes the r3 per-operator queries text_quality / text_langid /
    text_token_count / text_token_count_bpe / doc_fingerprint /
    doc_fingerprint_rolling — the per-doc row checks strictly more than
    the retired per-lang aggregates did (every doc's value is hashed,
    not a 4-row rollup), in one registry slot instead of six."""
    docs = TS.with_tokens(_t(spark, sf, "documents"))
    out = TS.with_repetition(
        TS.with_rolling_fingerprint(
            TS.with_fingerprint(
                TS.with_bpe_token_count(
                    TS.with_langid(
                        TS.with_quality(docs, toks_col="__toks"),
                        toks_col="__toks",
                    )
                )
            )
        ),
        toks_col="__toks",
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio_bp",
        "stop_ratio_bp",
        "quality_bp",
        "lang_pred",
        "n_bpe_tokens",
        "fingerprint",
        "rolling_fp",
        "dup_ngram_frac_bp",
    )


def _langid_case() -> str:
    """The langid CASE expression over a ``toks`` list column —
    shared by the standalone langid twin and the curation twin."""
    cnt = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in TS.LANG_MARKERS.items()
    }
    langs = sorted(cnt)
    m = f"greatest({', '.join(cnt[lang] for lang in langs)})"
    case = f"CASE WHEN {m} = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN {cnt[lang]} = {m} THEN '{lang}' "
    case += "END"
    return case


def _text_stats_sql() -> str:
    """Composed exact twin of _text_stats.  DuckDB's list_reduce is
    seedless ((c1*B+c2)%M ...), which equals Spark's 0-seeded fold
    because (0*B+c1)%M = c1; it ERRORS on empty lists, hence the CASE
    guard."""
    stops = ", ".join(repr(s) for s in TS.STOPWORDS)
    bpe = TS.BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), feats AS (
  SELECT doc_id, text, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
         CAST(len(list_filter(toks, x -> x IN ({stops}))) AS DOUBLE) AS ns,
         list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) AS sl
  FROM t
), codes AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ''),
                       c -> c <> ''),
           c -> CAST(ascii(c) AS BIGINT)) AS cs
  FROM t
), grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM t
)
SELECT f.doc_id,
       CAST(f.n AS INT) AS n_tokens,
       CAST(floor(10000.0 * f.nd / f.n) AS BIGINT) AS distinct_ratio_bp,
       CAST(floor(10000.0 * f.ns / f.n) AS BIGINT) AS stop_ratio_bp,
       CAST(floor(5000.0 * f.nd / f.n) AS BIGINT)
         + CAST(floor(3000.0 * (f.n - f.ns) / f.n) AS BIGINT)
         + least(CAST(floor(250.0 * f.sl / f.n) AS BIGINT), 2000) AS quality_bp,
       {_langid_case()} AS lang_pred,
       CAST(len(regexp_extract_all(lower(f.text), '{bpe}')) AS INT) AS n_bpe_tokens,
       md5(array_to_string(f.toks, ' ')) AS fingerprint,
       CAST(CASE WHEN len(c.cs) = 0 THEN 0
                 ELSE list_reduce(c.cs, (a, b) -> (a * {TS.ROLLING_BASE} + b) % {TS.ROLLING_MOD})
            END AS BIGINT) AS rolling_fp,
       CAST(CASE WHEN len(g.gs) = 0 THEN 0
                 ELSE floor(10000.0 * (len(g.gs) - len(list_distinct(g.gs))) / len(g.gs))
            END AS BIGINT) AS dup_ngram_frac_bp
FROM feats f JOIN codes c ON f.doc_id = c.doc_id JOIN grams g ON f.doc_id = g.doc_id
"""


def _pii_scrub(spark, sf):
    """PII redaction (operators/textstats.py::scrub_pii): email /
    IPv4 / phone-shaped spans → ``<KIND>`` tokens plus per-kind match
    counts, pure Catalyst regexp inside codegen.  The corpus text
    carries no digits, so both engines first append a deterministic
    doc_id-derived PII suffix (one email, one dotted quad, one phone
    per doc) — the scrub then has real matches to find, and the scrub
    ORDER (email → ipv4 → phone, part of the operator's semantics:
    domains and quads are digit runs too) is exercised end to end.
    Patterns are deliberately lookahead-free (textstats.py:211) so the
    identical pattern strings run under Java regex and RE2."""
    docs = _t(spark, sf, "documents")
    seeded = docs.select(
        "doc_id",
        # coalesce so a NULL-text doc still gets its seeded PII on
        # BOTH engines (Spark concat propagates NULL, DuckDB concat
        # skips NULL arguments — without this the twins diverge)
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 or +1 (555) 010-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return TS.scrub_pii(seeded).select(
        "doc_id",
        "text_scrubbed",
        "n_pii_email",
        "n_pii_ipv4",
        "n_pii_phone",
        "n_pii_total",
    )


def _pii_scrub_sql() -> str:
    sql = """
WITH s AS (
  SELECT doc_id,
         concat(coalesce(text, ''), ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com via 10.0.', CAST(doc_id % 256 AS VARCHAR),
                '.7 or +1 (555) 010-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS text
  FROM documents
), e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '__EMAIL__')) AS INT) AS n_pii_email,
         regexp_replace(text, '__EMAIL__', '<EMAIL>', 'g') AS t1
  FROM s
), i AS (
  SELECT doc_id, n_pii_email,
         CAST(len(regexp_extract_all(t1, '__IPV4__')) AS INT) AS n_pii_ipv4,
         regexp_replace(t1, '__IPV4__', '<IPV4>', 'g') AS t2
  FROM e
), p AS (
  SELECT doc_id, n_pii_email, n_pii_ipv4,
         CAST(len(regexp_extract_all(t2, '__PHONE__')) AS INT) AS n_pii_phone,
         regexp_replace(t2, '__PHONE__', '<PHONE>', 'g') AS text_scrubbed
  FROM i
)
SELECT doc_id, text_scrubbed, n_pii_email, n_pii_ipv4, n_pii_phone,
       n_pii_email + n_pii_ipv4 + n_pii_phone AS n_pii_total
FROM p
"""
    pats = dict(TS.PII_PATTERNS)
    return (
        sql.replace("__EMAIL__", pats["email"])
        .replace("__IPV4__", pats["ipv4"])
        .replace("__PHONE__", pats["phone"])
    )


# paragraph-break injection for the sub-document dedup twin: the
# synthetic corpus has no hard newlines, so both engines split on the
# same filler words — short word-soup segments repeat across docs
# (~10% duplicate mass at sf0.01), giving the keeper election real
# cross-document work
_PARA_BREAK_RE = r"\s+(the|a)\s+"


def _dedup_paragraphs_q(spark, sf):
    """Sub-document exact dedup (operators/dedup.py::dedup_paragraphs,
    the CCNet/MassiveText line-dedup pass): every paragraph that
    repeats an earlier ``(doc_id, position)`` occurrence corpus-wide
    is removed from its doc; docs survive with boilerplate stripped.
    Keeper election is the skew-robust partial-agg min-struct (NOT a
    window — see _keeper_flag); the DuckDB twin re-runs split → md5 →
    first-occurrence election → ordered reassembly exactly."""
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), _PARA_BREAK_RE, "\n\n").alias("text"),
    )
    return D.dedup_paragraphs(docs)


_DEDUP_PARAGRAPHS_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_replace(text, '__BREAK__', chr(10)||chr(10), 'g') AS text
  FROM documents
), segs AS (
  SELECT doc_id, i - 1 AS idx, parts[i] AS para
  FROM (SELECT doc_id, string_split_regex(coalesce(text, ''), '\n{2,}') AS parts FROM d),
       UNNEST(generate_series(1, len(parts))) AS t(i)
), hashed AS (
  SELECT doc_id, idx, para,
         CASE WHEN length(trim(para)) >= 1 THEN md5(trim(para)) END AS h
  FROM segs
), flagged AS (
  SELECT doc_id, idx, para,
         (h IS NULL OR row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1) AS keep
  FROM hashed
), asm AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_paras,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
         coalesce(string_agg(CASE WHEN keep THEN para END, chr(10)||chr(10) ORDER BY idx), '') AS text_dedup
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NOT NULL THEN a.text_dedup END AS text_dedup,
       CASE WHEN d.text IS NOT NULL THEN a.n_paras ELSE 0 END AS n_paras,
       CASE WHEN d.text IS NOT NULL THEN a.n_kept ELSE 0 END AS n_kept,
       CASE WHEN d.text IS NOT NULL THEN a.n_paras - a.n_kept ELSE 0 END AS n_dropped
FROM d JOIN asm a USING (doc_id)
""".replace("__BREAK__", _PARA_BREAK_RE)


# mixture weights exercising all three weight regimes: upsample with
# fraction (2.5 → 2 full copies + p=.5 third), exact passthrough
# (1.0), downsample (0.25); sources absent from the dict are dropped
_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25}
_MIX_SEED = 7


def _mixture_sample_q(spark, sf):
    """Deterministic weighted source mixing (operators/curation.py::
    mixture_sample): expected copies per doc == its source weight,
    sampled by pure md5 of (doc_id, copy_idx, seed) — no RNG, so the
    DuckDB twin reproduces the exact row set, not just the expected
    counts.  Plan is explode + filter in one projection: zero
    shuffles at any corpus size."""
    from lexicator_spark.operators import curation as CU

    docs = _t(spark, sf, "documents")
    return CU.mixture_sample(docs, _MIX_WEIGHTS, seed=_MIX_SEED).select(
        "doc_id", "source", "copy_idx"
    )


def _mixture_sample_sql() -> str:
    full = {s: int(w) for s, w in _MIX_WEIGHTS.items()}
    frac = {s: round((w - int(w)) * 1_000_000) for s, w in _MIX_WEIGHTS.items()}
    cand = {s: full[s] + (1 if frac[s] > 0 else 0) for s in _MIX_WEIGHTS}
    live = [s for s in _MIX_WEIGHTS if cand[s] > 0]

    def case(mapping: dict[str, int]) -> str:
        whens = " ".join(f"WHEN '{s}' THEN {mapping[s]}" for s in live)
        return f"CASE source {whens} END"

    srcs = ", ".join(f"'{s}'" for s in live)
    return f"""
WITH cand AS (
  SELECT doc_id, source, CAST(i AS INT) AS copy_idx, n_full, frac_ppm
  FROM (SELECT doc_id, source,
               {case(cand)} AS n_cand,
               {case(full)} AS n_full,
               {case(frac)} AS frac_ppm
        FROM documents WHERE source IN ({srcs})),
       UNNEST(generate_series(0, n_cand - 1)) AS t(i)
)
SELECT doc_id, source, copy_idx FROM cand
WHERE copy_idx < n_full
   OR (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), chr(31),
        CAST(copy_idx AS VARCHAR), chr(31), '{_MIX_SEED}')), 1, 8)) AS BIGINT)
       % 1000000) < frac_ppm
"""


def _multimodal_features(spark, sf):
    """Binary-column plumbing (image/audio/video as opaque bytes +
    typed metadata) through Arrow mapInPandas feature extraction.
    Payloads are real PPM/WAV/RVID media decoded with pure numpy —
    features derive from actual pixels/samples/frames (the PIL/ffmpeg
    seam for real-world codecs is ``decode='raise'``); rows-only
    check, decode correctness + determinism asserted in pytest."""
    from lexicator_spark.operators import multimodal as MM

    media = MM.synth_media(spark, n=96)
    return MM.extract_media_features(media).select(
        "media_id", "kind", "payload_sha", "n_bytes"
    )


# ===========================================================================
# contract surface
# ===========================================================================
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2), each
    with an oracle_sql() twin unless documented rows-only below.

    Sized to the driver's ~50-row correctness snapshot: every entry
    here gets a driver-visible CORRECTNESS row every round.  Queries
    retired in r4 (still implemented + pytest-covered, folded into a
    successor entry or superseded): window_distribution →
    window_lag_lead; agg_rollup/agg_cube → agg_grouping_sets (full
    cube lattice); kg_extract_mentions → kg_mention_spans (same rows +
    span struct); dedup_minhash_lsh (capped pair form) →
    dedup_minhash_clusters (uncapped linear form); dedup_simhash and
    ann_ivf_top1 → pytest-gated (tests/test_dedup_similarity.py), the
    registry keeps one exact ANN (ann_cosine_top1) + one approximate
    (ann_lsh_top1); text_quality/text_langid/text_token_count(_bpe)/
    doc_fingerprint(_rolling) → text_stats (all columns, one row per
    doc — strictly stronger than the retired per-lang aggregates).
    r5 fold: set_intersect + set_except → set_ops (same inputs and
    semantics, op-tagged rows), freeing budget for the round's new
    kg_khop_reachable (recursive-CTE-oracled BFS), kg_negative_samples
    (md5-ring KG-embedding negative sampler), and corpus_decontaminate
    (broadcast n-gram eval-set collision gate — the one curation stage
    the registry was missing); dedup_ngram_jaccard → dedup_cluster_assign
    (the cluster query's oracle chain contains the identical jaccard
    pair computation verbatim, so the pair form is strictly subsumed;
    operator-level gates stay in tests/test_dedup_similarity.py).
    Late-r5 swap (3 in / 3 out, registry stays at 50): pii_scrub,
    dedup_paragraphs, and mixture_sample are NEW operator families
    (redaction, sub-document dedup, weighted source mixing), each
    fully SQL-oracled.  To keep the registry within the ~50-row driver
    snapshot they displace three rows whose capability is exercised
    verbatim inside other green queries: topk_global (global ORDER BY
    + LIMIT is q3_shipping_priority's tail, identical plan shape),
    join_left_outer (null-extending join machinery covered by
    join_full_outer, and a LEFT JOIN runs verbatim inside
    corpus_curation's oracled chain), dedup_tokenset (same
    hash-groupBy plan family as dedup_exact, differing only in the
    key expression).  All three retirees keep their EXACT DuckDB
    oracle comparison in pytest via retired_oracles() /
    tests/test_entry_queries.py — retired from the snapshot, not from
    verification."""
    return {
        # relational core
        "q1_pricing_summary": _q1,
        "q3_shipping_priority": _q3,
        "q5_local_supplier": _q5,
        "q17_small_quantity_revenue": _q17,
        "join_broadcast_enrich": _join_broadcast,
        "join_full_outer": _join_full_outer,
        "semi_join": _semi_join,
        "anti_join": _anti_join,
        "window_topk_per_group": _window_topk,
        "window_running_sum": _window_running,
        "window_lag_lead": _window_lag_lead,
        "agg_grouping_sets": _grouping_sets,
        "distinct_agg": _distinct_agg,
        "set_ops": _set_ops,
        "string_funcs": _string_funcs,
        "json_extract": _json_extract,
        "time_bucket_agg": _time_bucket,
        "sessionize_events": _sessionize_q,
        "asof_join_events": _asof_q,
        "range_join_prior_events": _range_join,
        "pivot_status_by_priority": _pivot_status,
        "approx_aggs": _approx_aggs,
        "group_assembly": _group_assembly,
        # KG
        "kg_mention_spans": _kg_mention_spans,
        "kg_span_proximity_pairs": _kg_span_proximity,
        "kg_cooccurrence": _kg_cooccurrence,
        "kg_khop_reachable": _kg_khop_reachable,
        "kg_negative_samples": _kg_negative_samples,
        "kg_connected_components": _kg_connected_components,
        "kg_claims_qualifiers": _kg_claims_qualifiers,
        "kg_entity_tool_affinity": _kg_entity_tool_affinity,
        "kg_pipeline_triples": _kg_pipeline_triples,
        "kg_entities_dim": _kg_entities_dim,
        "kg_degree_distribution": _kg_degree_distribution,
        "kg_triangle_count": _kg_triangle_count,
        "kg_pagerank_top": _kg_pagerank_top,
        # dedup / similarity / text
        "dedup_exact": _dedup_exact,
        "dedup_cluster_assign": _dedup_cluster_assign,
        "dedup_minhash_clusters": _dedup_minhash_clusters,
        "corpus_curation": _corpus_curation,
        "corpus_decontaminate": _decontam,
        "corpus_pack_sequences": _corpus_pack_sequences,
        "dedup_embedding_cosine": _dedup_embedding_cosine,
        "ann_cosine_top1": _ann_top1,
        "ann_lsh_top1": _ann_lsh,
        "text_stats": _text_stats,
        "pii_scrub": _pii_scrub,
        "dedup_paragraphs": _dedup_paragraphs_q,
        "mixture_sample": _mixture_sample_q,
        "multimodal_features": _multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_local_supplier": _Q5_SQL,
        "q17_small_quantity_revenue": _Q17_SQL,
        "join_broadcast_enrich": _JOIN_BROADCAST_SQL,
        "join_full_outer": _JOIN_FULL_OUTER_SQL,
        "semi_join": _SEMI_JOIN_SQL,
        "anti_join": _ANTI_JOIN_SQL,
        "window_topk_per_group": _WINDOW_TOPK_SQL,
        "window_running_sum": _WINDOW_RUNNING_SQL,
        "window_lag_lead": _WINDOW_LAG_LEAD_SQL,
        "agg_grouping_sets": _GROUPING_SETS_SQL,
        "distinct_agg": _DISTINCT_AGG_SQL,
        "set_ops": _SET_OPS_SQL,
        "string_funcs": _STRING_FUNCS_SQL,
        "json_extract": _JSON_EXTRACT_SQL,
        "time_bucket_agg": _TIME_BUCKET_SQL,
        "sessionize_events": _SESSIONIZE_SQL,
        "asof_join_events": _ASOF_SQL,
        "range_join_prior_events": _RANGE_JOIN_SQL,
        "pivot_status_by_priority": _PIVOT_SQL,
        # approx_aggs: sketch-based (HLL / KLL) — engine-specific by
        # nature; exactness bounds asserted in pytest instead.
        "group_assembly": _GROUP_ASSEMBLY_SQL,
        "kg_mention_spans": _KG_MENTION_SPANS_SQL,
        "kg_span_proximity_pairs": _KG_SPAN_PROXIMITY_SQL,
        "kg_cooccurrence": _KG_COOCCURRENCE_SQL,
        "kg_khop_reachable": _KG_KHOP_SQL,
        "kg_negative_samples": _KG_NEGSAMPLES_SQL,
        "kg_connected_components": _KG_CC_SQL,
        # the three synth-corpus KG queries run over the committed
        # parquet fixture on both engines — extraction, linking, and
        # the CC fixpoint all have exact SQL twins (recursive CTE for
        # the transitive closure); pytest additionally holds the
        # P/R ≥ 0.95 parity gate vs the pure-Python oracle.
        "kg_claims_qualifiers": _SYNTH_KG_SQL["kg_claims_qualifiers"],
        "kg_entity_tool_affinity": _SYNTH_KG_SQL["kg_entity_tool_affinity"],
        "kg_pipeline_triples": _SYNTH_KG_SQL["kg_pipeline_triples"],
        "kg_entities_dim": _SYNTH_KG_SQL["kg_entities_dim"],
        "kg_degree_distribution": _SYNTH_KG_SQL["kg_degree_distribution"],
        "kg_triangle_count": _SYNTH_KG_SQL["kg_triangle_count"],
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_cluster_assign": _DEDUP_CLUSTER_ASSIGN_SQL,
        # dedup_minhash_clusters: LSH-backed (approximate candidate
        # generation) — cluster parity vs exact pairs gated in pytest.
        "corpus_curation": _corpus_curation_sql(),
        "corpus_decontaminate": _DECONTAM_SQL,
        "corpus_pack_sequences": _CORPUS_PACK_SQL,
        "dedup_embedding_cosine": _DEDUP_EMBEDDING_SQL,
        "ann_cosine_top1": _ANN_TOP1_SQL,
        # ann_lsh_top1: approximate by design; recall vs exact
        # measured in pytest (as are the retired dedup_simhash /
        # ann_ivf_top1 operators).
        "text_stats": _text_stats_sql(),
        "pii_scrub": _pii_scrub_sql(),
        "dedup_paragraphs": _DEDUP_PARAGRAPHS_SQL,
        "mixture_sample": _mixture_sample_sql(),
    }


def retired_oracles() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]]:
    """Queries retired from the driver snapshot (registry budget ~50
    rows) whose capability is exercised verbatim inside other green
    registry rows — see the queries() docstring for the per-query
    subsumption argument.  Each keeps its EXACT Spark-vs-DuckDB
    comparison via tests/test_entry_queries.py, so retirement narrows
    the driver-visible surface, never the verification surface."""
    return {
        "topk_global": (_topk_global, _TOPK_GLOBAL_SQL),
        "join_left_outer": (_join_left_outer, _JOIN_LEFT_OUTER_SQL),
        "dedup_tokenset": (_dedup_tokenset, _DEDUP_TOKENSET_SQL),
    }
