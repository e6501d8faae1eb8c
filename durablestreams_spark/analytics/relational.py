"""Relational operator surface (SURVEY.md §2.2): scans, projection/
filter, every join family, aggregation, rollup/cube/grouping sets,
window functions, sort/limit/top-k, set ops, scalar functions, JSON.

Each query is written DataFrame-first and declaratively so Catalyst
owns the physical strategy: filters/projections push into the parquet
scan, small dimensions broadcast, `orderBy().limit()` becomes
TakeOrderedAndProject, partial aggregation happens map-side.  Scale
notes are on each query where non-obvious.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .core import query, register_views, table


# --------------------------------------------------------------------------
# Aggregation: hash agg with partial/final split, multiple agg functions.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)
                AS DOUBLE)                                                  AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))), 2) AS DOUBLE)             AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(38,6))), 2) AS DOUBLE)             AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 4)                                             AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 6)                                             AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan → hash aggregate. The filter and "
    "2-column grouping push to the scan; partial agg is map-side so the "
    "shuffle carries one row per (flag,status) per partition — O(groups), "
    "not O(rows), at 100 TB.  Money sums run in DECIMAL(38,6): each "
    "per-row double expression casts to decimal identically in every "
    "engine (no double is ever an exact decimal .5 tie at 6dp, so the "
    "cast rounding cannot diverge), and the decimal sum is EXACT and "
    "order-independent — at sf1 the raw double sums are ~1e10+ where "
    "summation-order ULP noise flips round(.,2) cents between engines; "
    "TPC-H itself specifies these columns as DECIMAL.",
)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    dec = "decimal(38,6)"
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(dec)), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(disc_price.cast(dec)), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum((disc_price * (1 + F.col("l_tax"))).cast(dec)), 2)
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast(dec)).cast("double") / n, 4
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast(dec)).cast("double") / n, 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way join + agg + top-k (TPC-H Q3 shape).
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Join(customer⋈orders⋈lineitem) → agg → top-k, with the "
    "aggregation PUSHED BELOW the join: revenue per orderkey is "
    "computed on filtered lineitem first (the other grouping keys are "
    "functionally dependent on l_orderkey), so the join carries one "
    "row per order instead of one per lineitem AND the post-join "
    "re-aggregation exchange disappears — Catalyst doesn't do this "
    "rewrite itself, and at 100 TB it's the difference between "
    "shuffling ~4 lineitems per order twice and shuffling one "
    "pre-reduced row once. customer carries no broadcast hint — it "
    "is corpus-proportional, so AQE decides at runtime (and does "
    "broadcast it at bench SFs); orderBy+limit compiles to "
    "TakeOrderedAndProject so only 10 rows per partition survive "
    "the final exchange.",
)
def q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    li_rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        li_rev.join(orders, li_rev.l_orderkey == orders.o_orderkey)
        # no broadcast hint on customer: it is corpus-proportional
        # (~SF x 150k rows x 1/5 after the segment filter), so a
        # forced broadcast dies at 100 TB.  AQE converts this join to
        # broadcast at runtime whenever the filtered side is actually
        # small (it is at every bench SF), which keeps local plans
        # identical without hard-wiring a scale assumption.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            F.round("rev", 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Snowflake join through region/nation dims (TPC-H Q5 shape).
# --------------------------------------------------------------------------
@query(
    "q5_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="Six-way snowflake join. Only the FIXED-cardinality dims "
    "(nation=25, region=5 rows at every SF) carry broadcast hints; "
    "customer and supplier scale WITH the fact data (TPC-H: 150k×sf "
    "customers), so forcing them into broadcast would OOM the driver "
    "at 100 TB — those joins are left to Catalyst/AQE, which picks "
    "broadcast at small SF and shuffle joins once they outgrow "
    "autoBroadcastJoinThreshold.",
)
def q5_region_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins.
# --------------------------------------------------------------------------
@query(
    "join_semi_orders_with_big_items",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="EXISTS → left-semi join: only the key column of lineitem crosses "
    "the shuffle and duplicates collapse early.",
)
def join_semi(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    big = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="NOT EXISTS → left-anti join (the same plan shape our orphan "
    "purge uses at object-store scale, SURVEY.md §2.1 #16). The "
    "predicate is 'no URGENT order' rather than 'no order at all' so "
    "the fixture (where every customer has orders) yields survivors — "
    "a 0-row result would make the oracle hash check vacuous.",
)
def join_anti(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Predicate-heavy scan-aggregate (TPC-H Q6 shape).
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-aggregate with a 4-predicate conjunction — "
    "the query where pushdown IS the plan. Every predicate reaches "
    "PushedFilters (row-group skipping on shipdate min/max), the scan "
    "reads 4 columns of 16, and the agg is a two-phase partial with a "
    "single scalar row crossing the exchange.",
)
def q6_forecast_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Returned-item report (TPC-H Q10 shape).
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: who returned the most revenue last quarter. "
    "Lineitem filtered to returns and pre-reduced per order BEFORE the "
    "join (same agg-below-join rewrite as q3 — revenue is additive "
    "over an order's items), then orders∙customer resolve the "
    "per-customer rollup; nation broadcasts; top-20 via "
    "TakeOrderedAndProject. Two fact exchanges total at scale.",
)
def q10_returned_items(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    li_rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        li_rev.join(orders, li_rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Outer joins (null-extension semantics).
# --------------------------------------------------------------------------
@query(
    "join_outer_order_coverage",
    """
    SELECT coalesce(c.c_mktsegment, 'NO_CUSTOMER') AS segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers_without_urgent
    FROM customer c
    FULL OUTER JOIN (SELECT * FROM orders
                     WHERE o_orderpriority = '1-URGENT') o
      ON c.c_custkey = o.o_custkey
    GROUP BY segment
    """,
    doc="FULL OUTER join: customers x urgent orders, null-extended on "
    "both sides, aggregated per segment with null-counting — the "
    "coverage-report shape (who has no urgent orders / which orders "
    "have no customer). Outer joins can't broadcast the preserved "
    "side; this is a shuffle join by construction, which is exactly "
    "what the plan should show at any scale.",
)
def join_outer(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "full_outer")
    return j.groupBy(
        F.coalesce("c_mktsegment", F.lit("NO_CUSTOMER")).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_orders"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_customers_without_urgent"),
    )


# --------------------------------------------------------------------------
# Non-equi / range join.
# --------------------------------------------------------------------------
@query(
    "join_range_price_bands",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
               ('large', 150000.0, 300000.0), ('jumbo', 300000.0, 1e12)
    )
    SELECT band, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS total,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="Theta/range join against a tiny banding dim → "
    "BroadcastNestedLoopJoin; the fact side streams through once with "
    "no shuffle. At 100 TB prefer rewriting static bands as a CASE "
    "expression (no join at all) — kept as a join here to exercise the "
    "non-equi path.",
)
def join_range(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("small", 0.0, 50_000.0),
            ("medium", 50_000.0, 150_000.0),
            ("large", 150_000.0, 300_000.0),
            ("jumbo", 300_000.0, 1e12),
        ],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


# --------------------------------------------------------------------------
# As-of join (event-time point lookup).
# --------------------------------------------------------------------------
@query(
    "join_asof_purchase_prior_click",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           c.event_id AS click_id,
           round(epoch(p.ts) - epoch(c.ts), 3) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    doc="As-of join: for each purchase, the latest strictly-earlier click "
    "by the same user. Spark lacks a native batch as-of operator "
    "(SURVEY.md §2.2); instead of the classic equi-join + inequality + "
    "row_number plan (which materializes every purchase×earlier-click "
    "pair — O(clicks·purchases) per user, a blowup on skewed users), "
    "both event sets are UNIONed into one (user_id, ts)-sorted stream "
    "and the last click is carried forward with last(..., "
    "ignorenulls=True) over an unbounded-preceding window — O(n) per "
    "user, exactly one exchange (hash on user_id for the window sort), "
    "no join at all. Strict inequality (p.ts > c.ts) falls out of the "
    "sort tiebreak: purchases order BEFORE clicks at equal ts, so a "
    "same-instant click is outside the purchase row's frame. Oracle "
    "uses DuckDB's native ASOF JOIN.",
)
def join_asof(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),  # sorts before clicks at equal ts ⇒ strict <
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "click_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "ts",
        "kind",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("c_ts"),
    )
    return (
        merged.where((F.col("kind") == 0) & F.col("click_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            F.round(
                F.unix_micros("ts") / 1e6 - F.unix_micros("c_ts") / 1e6, 3
            ).alias("gap_sec"),
        )
    )


# --------------------------------------------------------------------------
# Window functions: ranking, running aggregate, lag/lead.
# --------------------------------------------------------------------------
@query(
    "window_rank_top_orders_per_cust",
    """
    SELECT o_custkey, o_orderkey, rn, round(o_totalprice, 2) AS totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 2
    """,
    doc="Ranking window (row_number) partitioned by customer — one "
    "shuffle on the partition key; rank filter applies before any "
    "further operator.",
)
def window_rank(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(
            "o_custkey", "o_orderkey", "rn", F.round("o_totalprice", 2).alias("totalprice")
        )
    )


@query(
    "window_running_value_per_user",
    """
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_value
    FROM events
    """,
    doc="Running-sum analytic frame (ROWS UNBOUNDED PRECEDING .. CURRENT); "
    "deterministic tiebreak (ts, event_id) makes the prefix sums unique.",
)
def window_running(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@query(
    "window_lag_gap_by_type",
    """
    SELECT event_type,
           count(*) AS n_gaps,
           round(avg(gap), 3) AS avg_gap_sec,
           round(max(gap), 3) AS max_gap_sec
    FROM (SELECT event_type,
                 epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS gap
          FROM events)
    WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
    doc="lag() analytic + aggregate over the derived column.",
)
def window_lag(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_micros("ts") / 1e6
    gap = sec - F.lag(sec).over(w)
    return (
        ev.select("event_type", gap.alias("gap"))
        .where(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap"), 3).alias("avg_gap_sec"),
            F.round(F.max("gap"), 3).alias("max_gap_sec"),
        )
    )


# --------------------------------------------------------------------------
# Rollup / cube / grouping sets.
# --------------------------------------------------------------------------
@query(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS lvl,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP — Catalyst expands to one Expand + single hash agg "
    "(not one pass per grouping set).  The grand-total money sum is "
    "~3e11 at sf1, squarely in the regime where double summation "
    "order flips round(.,2) — summed in exact DECIMAL (see "
    "q1_pricing_summary).",
)
def rollup_sales(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    lvl = F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        lvl.alias("lvl"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS lvl,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS total,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE over two dimensions (4 grouping sets in one Expand).  The grand-total money sum is ~2.8e11 at sf1 — the regime where double summation order flips round(.,2) — summed in exact DECIMAL like rollup/q1.",
)
def cube_sales(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lvl = F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        lvl.alias("lvl"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "grouping_sets_mixed",
    """
    SELECT c_mktsegment, o_orderpriority,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS total, count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS via SQL (same Expand machinery).",
)
def grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                    AS DOUBLE) AS total, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Distinct aggregation, top-k, set ops.
# --------------------------------------------------------------------------
@query(
    "distinct_agg_per_flag",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multi-column distinct aggregation (Catalyst plans Expand + "
    "two-phase agg so both distincts run in one pass).",
)
def distinct_agg(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    doc="orderBy+limit → TakeOrderedAndProject (per-partition top-k heap, "
    "no full sort, no full shuffle — the plan that survives 100 TB).",
)
def topk_orders(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(15)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "set_ops_customer_cohorts",
    """
    WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         h2 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
    UNION ALL
    SELECT 'only_1996', count(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
    UNION ALL
    SELECT 'either', count(*) FROM (SELECT * FROM h1 UNION SELECT * FROM h2)
    """,
    doc="INTERSECT / EXCEPT / UNION over yearly customer cohorts.",
)
def set_ops(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")

    def cohort(year):
        return (
            orders.where(
                (F.col("o_orderdate") >= f"{year}-01-01")
                & (F.col("o_orderdate") < f"{year + 1}-01-01")
            )
            .select("o_custkey")
            .distinct()
        )

    h1, h2 = cohort(1996), cohort(1997)
    rows = [
        h1.intersect(h2).agg(F.lit("both").alias("cohort"), F.count(F.lit(1)).alias("n")),
        h1.exceptAll(h2).agg(F.lit("only_1996").alias("cohort"), F.count(F.lit(1)).alias("n")),
        h1.union(h2).distinct().agg(F.lit("either").alias("cohort"), F.count(F.lit(1)).alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out


# --------------------------------------------------------------------------
# JSON access + scalar functions + pivot.
# --------------------------------------------------------------------------
@query(
    "json_extract_props",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Schemaless JSON column → typed access at query time "
    "(get_json_object), the pattern every stream payload uses here "
    "(SURVEY.md §1.3).",
)
def json_extract(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "scalar_string_date_math",
    """
    SELECT upper(substr(p_type, 1, 8))                   AS type_prefix,
           CAST(sum(p_size) AS BIGINT)                   AS sum_size,
           round(avg(p_retailprice), 4)                  AS avg_price,
           round(max(sqrt(p_retailprice)), 6)            AS max_sqrt_price,
           min(concat(p_brand, ':', lpad(CAST(p_size AS VARCHAR), 4, '0'))) AS min_brand_size,
           count(*) AS n
    FROM part
    GROUP BY type_prefix
    """,
    doc="Scalar function coverage: string (upper/substr/concat/lpad), "
    "math (sqrt), all JVM-side codegen'd expressions.",
)
def scalar_funcs(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy(F.upper(F.substring("p_type", 1, 8)).alias("type_prefix"))
        .agg(
            F.sum("p_size").alias("sum_size"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.round(F.max(F.sqrt("p_retailprice")), 6).alias("max_sqrt_price"),
            F.min(
                F.concat_ws(":", "p_brand", F.lpad(F.col("p_size").cast("string"), 4, "0"))
            ).alias("min_brand_size"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "pivot_event_counts_by_day",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY day
    """,
    doc="Pivot: one shuffled agg with per-value conditional counts "
    "(pivot values enumerated, so the plan is a plain hash agg).",
)
def pivot_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", kinds)
        .count()
    )
    # Spark pivot leaves null for absent combos; the oracle's FILTER
    # counts produce 0 — normalize.
    return piv.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery.
# --------------------------------------------------------------------------
@query(
    "subquery_above_avg_price",
    """
    SELECT p_brand, count(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    GROUP BY p_brand
    """,
    doc="Scalar subquery: Catalyst computes the single-row aggregate once "
    "and broadcasts it into the filter.",
)
def subquery_above_avg(spark, sf_dir):
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        GROUP BY p_brand
        """
    )


# --------------------------------------------------------------------------
# UNPIVOT (wide measures -> long rows; the inverse of pivot).
# --------------------------------------------------------------------------
@query(
    "unpivot_price_components",
    """
    WITH wide AS (
        SELECT l_returnflag,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)
                    AS DOUBLE) AS base,
               CAST(round(sum(CAST(l_extendedprice * l_discount
                                  AS DECIMAL(38,6))), 2) AS DOUBLE)
                   AS discount,
               CAST(round(sum(CAST(l_extendedprice * l_tax
                                  AS DECIMAL(38,6))), 2) AS DOUBLE) AS tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, component, amount
    FROM wide
    UNPIVOT (amount FOR component IN (base, discount, tax))
    """,
    doc="UNPIVOT: per-returnflag revenue decomposed into three wide "
    "measure columns, then melted to (flag, component, amount) rows — "
    "the inverse of pivot_event_counts_by_day, closing the "
    "reshape-operator pair. Spark's DataFrame.unpivot compiles to an "
    "Expand node: each input row emits 3 output rows in the same "
    "stage, no shuffle beyond the upstream aggregation (which is "
    "O(flags) wide after map-side combine).",
)
def unpivot_price_components(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    dec = "decimal(38,6)"
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice").cast(dec)), 2)
        .cast("double")
        .alias("base"),
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(dec)), 2
        )
        .cast("double")
        .alias("discount"),
        F.round(F.sum((F.col("l_extendedprice") * F.col("l_tax")).cast(dec)), 2)
        .cast("double")
        .alias("tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["base", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )


@query(
    "canary_event_time_span",
    """
    SELECT 'events' AS tbl,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS ts_min,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS ts_max,
           CAST(count(*) AS BIGINT)               AS n
    FROM events
    UNION ALL
    SELECT 'orders',
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           CAST(count(*) AS BIGINT)
    FROM orders
    ORDER BY tbl
    """,
    doc="Fixture-drift canary: min/max event-time per time-bearing "
    "table, value-hashed against DuckDB reading the same parquet "
    "natively. DuckDB always decodes the file's true instants, so ANY "
    "Spark-side ingress bug — a µs column treated as ns (round 3's "
    "silent 1000x collapse to 1970), an NTZ column shifted by a "
    "non-UTC session zone, a future fixture regeneration with a new "
    "physical type — turns into a loud hash mismatch on a cheap, "
    "always-sampleable driver row instead of silently wrong windows.",
)
def canary_event_time_span(spark, sf_dir):
    fmt = "yyyy-MM-dd HH:mm:ss"

    def span(name, col):
        df = table(spark, sf_dir, name)
        return df.agg(
            F.lit(name).alias("tbl"),
            F.date_format(F.min(col), fmt).alias("ts_min"),
            F.date_format(F.max(col), fmt).alias("ts_max"),
            F.count(F.lit(1)).alias("n"),
        )

    return (
        span("events", "ts")
        .unionByName(span("orders", "o_orderdate"))
        .orderBy("tbl")
    )


@query(
    "merge_upsert_user_profiles",
    """
    WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
               FROM events),
    base AS (
        SELECT user_id, event_type, count(*) AS n,
               round(sum(value), 4) AS sv
        FROM events, b
        WHERE epoch_us(ts) <= b.lo + ((b.hi - b.lo) * 90) // 100
          AND substr(md5(CAST(user_id AS VARCHAR) || ':' || event_type),
                     1, 1) < 'd'
        GROUP BY user_id, event_type
    ),
    delta AS (
        SELECT user_id, event_type, count(*) AS n,
               round(sum(value), 4) AS sv
        FROM events, b WHERE epoch_us(ts) > b.lo + ((b.hi - b.lo) * 90) // 100
        GROUP BY user_id, event_type
    )
    SELECT coalesce(base.user_id, delta.user_id) AS user_id,
           coalesce(base.event_type, delta.event_type) AS event_type,
           CAST(coalesce(base.n, 0) + coalesce(delta.n, 0) AS BIGINT)
               AS n_events,
           round(coalesce(base.sv, 0) + coalesce(delta.sv, 0), 4)
               AS sum_value,
           CASE WHEN base.user_id IS NULL THEN 'inserted'
                WHEN delta.user_id IS NULL THEN 'unchanged'
                ELSE 'updated' END AS merge_status
    FROM base FULL OUTER JOIN delta
      ON base.user_id = delta.user_id AND base.event_type = delta.event_type
    """,
    doc="MERGE/upsert semantics (the Delta/Iceberg MERGE INTO pattern, "
    "expressed relationally): a (user, event_type) profile table "
    "built from the first 90% of event time — covering only the md5 "
    "hash class a partial backfill would have onboarded (~13/16 of "
    "keys) — merges with a changelog aggregated from the last 10%. "
    "WHEN MATCHED update (sum the aggregates), WHEN NOT MATCHED "
    "insert, target-only rows pass through unchanged, each row "
    "labeled with its merge action; all three actions occur at every "
    "SF, so a hash match actually proves each CASE arm. Both sides "
    "partial-aggregate on the key before ONE co-partitioned "
    "full-outer join (aggs and join share hash partitioning: a "
    "single shuffle family at any scale).",
)
def merge_upsert_user_profiles(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tsu"), "value"
    )
    b = ev.agg(F.min("tsu").alias("lo"), F.max("tsu").alias("hi")).collect()[0]
    cut = b.lo + (b.hi - b.lo) * 90 // 100
    onboarded = (
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("event_type"),
                )
            ),
            1,
            1,
        )
        < "d"
    )
    key = ["user_id", "event_type"]
    base = (
        ev.where((F.col("tsu") <= cut) & onboarded)
        .groupBy(*key)
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv")
        )
    )
    delta = (
        ev.where(F.col("tsu") > cut)
        .groupBy(*key)
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv")
        )
    )
    bb = base.alias("b")
    dd = delta.alias("d")
    return bb.join(
        dd,
        (F.col("b.user_id") == F.col("d.user_id"))
        & (F.col("b.event_type") == F.col("d.event_type")),
        "full_outer",
    ).select(
        F.coalesce("b.user_id", "d.user_id").alias("user_id"),
        F.coalesce("b.event_type", "d.event_type").alias("event_type"),
        (
            F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))
        ).cast("long").alias("n_events"),
        F.round(
            F.coalesce("b.sv", F.lit(0.0)) + F.coalesce("d.sv", F.lit(0.0)), 4
        ).alias("sum_value"),
        F.when(F.col("b.user_id").isNull(), "inserted")
        .when(F.col("d.user_id").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_status"),
    )


@query(
    "agg_regression_value_trend",
    """
    WITH b AS (SELECT min(epoch_us(ts)) AS lo FROM events),
    x AS (
        SELECT event_type, value,
               (epoch_us(ts) - b.lo) / 86400000000.0 AS xd
        FROM events, b
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, xd), 6) AS slope_per_day,
           round(regr_intercept(value, xd), 6) AS intercept,
           round(corr(value, xd), 6) AS corr_vt
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    doc="Regression aggregates: per event type, the OLS slope/intercept "
    "of value against event-time (days since corpus start) plus the "
    "correlation — the drift/trend primitive of any metrics pipeline, "
    "computed by the built-in regr_* aggregates (covar/var partials: "
    "map-side combinable, one shuffle of 5 doubles per group, "
    "identical semantics in both engines).",
)
def agg_regression_value_trend(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("tsu")
    )
    lo = ev.agg(F.min("tsu")).collect()[0][0]
    x = ev.select(
        "event_type",
        "value",
        ((F.col("tsu") - F.lit(lo)) / 86400000000.0).alias("xd"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("regr_slope(value, xd)"), 6).alias("slope_per_day"),
            F.round(F.expr("regr_intercept(value, xd)"), 6).alias("intercept"),
            F.round(F.corr("value", "xd"), 6).alias("corr_vt"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_value_histogram",
    """
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    binned AS (
        SELECT least(19, CAST(floor((value - b.lo) / (b.hi - b.lo) * 20)
                              AS BIGINT)) AS bin
        FROM events, b
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin ORDER BY bin
    """,
    doc="Equal-width 20-bin histogram of event values: bounds from one "
    "O(1)-row aggregate, bin assignment a row-local expression, counts "
    "map-side combinable — the distribution primitive behind every "
    "metrics dashboard, shuffling 20 partial counts per partition "
    "regardless of corpus size. The max value lands in the last bin "
    "via least() identically in both engines.",
)
def agg_value_histogram(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    binned = ev.select(
        F.least(
            F.lit(19),
            F.floor((F.col("value") - b.lo) / (b.hi - b.lo) * 20).cast("long"),
        ).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("bin")
    )


@query(
    "lateral_top_orders_per_customer",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
    FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c_custkey % 100 = 0
    ORDER BY c_custkey, price DESC, o_orderkey
    """,
    doc="Correlated LATERAL subquery (the SQL-standard per-row derived "
    "table): each sampled customer pulls its own top-2 orders by "
    "price. Catalyst decorrelates the per-customer ORDER BY/LIMIT "
    "into a ranked window over one join — the same plan the "
    "hand-written window form produces, but arrived at from the "
    "LATERAL spelling users actually write; DuckDB executes the "
    "identical SQL as the oracle.",
)
def lateral_top_orders_per_customer(spark, sf_dir):
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        FROM customer,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey % 100 = 0
        ORDER BY c_custkey, price DESC, o_orderkey
        """
    )


@query(
    "join_asof_tolerance_1h",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 3600
                THEN c.event_id END AS click_id,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 3600
                THEN round(epoch(p.ts) - epoch(c.ts), 3) END AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    doc="As-of join with a TOLERANCE window via the reusable library "
    "operator (functions/asof.py asof_join): for each purchase, the "
    "latest strictly-earlier click by the same user, nulled when it "
    "is more than 1 hour stale — pandas merge_asof semantics (every "
    "left row survives; the match is dropped, not the row).  Same "
    "single-pass union+window plan as join_asof_purchase_prior_click "
    "— no join node, one exchange — now exercised through the "
    "general-purpose function with direction/tolerance/tiebreak "
    "knobs.  Oracle: DuckDB ASOF LEFT JOIN + CASE tolerance nulling.",
)
def join_asof_tolerance(spark, sf_dir):
    from ..functions.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    j = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        direction="backward",
        tolerance_us=3_600_000_000,
        strict=True,
        tiebreak=["click_id"],
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("click_id_right").alias("click_id"),
        F.round(
            (F.unix_micros("ts") - F.unix_micros("ts_right")) / 1e6, 3
        ).alias("gap_sec"),
    )


@query(
    "join_asof_forward_next_purchase",
    """
    SELECT c.event_id AS click_id,
           c.user_id  AS user_id,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 7200
                THEN p.event_id END AS purchase_id,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 7200
                THEN round(epoch(p.ts) - epoch(c.ts), 3) END AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts < p.ts
    """,
    doc="FORWARD-direction as-of join via the library operator: for "
    "each click, the EARLIEST strictly-later purchase by the same "
    "user within 2 hours (the time-to-conversion lookup).  Forward "
    "as-of is the window mirrored: first(ignorenulls) over "
    "currentRow..unboundedFollowing — still no join node, still one "
    "exchange.  Oracle: DuckDB ASOF LEFT JOIN with the inequality "
    "reversed (picks the smallest later purchase), same tolerance "
    "nulling.",
)
def join_asof_forward(spark, sf_dir):
    from ..functions.asof import asof_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    j = asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        direction="forward",
        tolerance_us=7_200_000_000,
        strict=True,
        tiebreak=["purchase_id"],
    )
    return j.select(
        "click_id",
        "user_id",
        F.col("purchase_id_right").alias("purchase_id"),
        F.round(
            (F.unix_micros("ts_right") - F.unix_micros("ts")) / 1e6, 3
        ).alias("gap_sec"),
    )
