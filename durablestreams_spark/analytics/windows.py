"""Event-time windowing (SURVEY.md §2.2 streaming rows): tumbling,
sliding, and session windows over the ``events`` stream table.

These use the exact operators a Structured Streaming job would
(``F.window`` / ``F.session_window``) — in batch mode they produce the
same groups a streaming query emits after the watermark closes, which
is what makes them oracle-checkable: the DuckDB oracle recomputes the
window arithmetic from epoch math.  The live-streaming path (watermarks
+ incremental emission over the durable log) is exercised in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import query, table

_FMT_S = "yyyy-MM-dd HH:mm:ss"
_FMT_D = "%Y-%m-%d %H:%M:%S"

# Oracle SQL shared with the LIVE streaming twins in
# operators/streaming_queries.py — ONE copy of each window's grid/gap
# arithmetic, so a boundary fix can't silently diverge the two graded
# queries that claim identical semantics.
TUMBLING_DAILY_ORACLE = f"""
    SELECT strftime(date_trunc('day', ts), '{_FMT_D}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """

SLIDING_12H_ORACLE = f"""
    SELECT strftime(make_timestamp(start_us), '{_FMT_D}') AS window_start,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM (
        SELECT e.value,
               ((CAST(floor(epoch(e.ts) / 43200) AS BIGINT) - u.i) * 43200) * 1000000
                   AS start_us
        FROM events e, (SELECT UNNEST([0, 1]) AS i) u
    )
    GROUP BY window_start
    """

SESSION_30M_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        -- the running sum MUST use the same (ts, event_id) total order
        -- as the flag window: with ts alone, duplicate-timestamp rows
        -- could be folded in a different order than they were flagged,
        -- assigning a row to the WRONG session nondeterministically
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{_FMT_D}') AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """


@query(
    "window_tumbling_daily",
    TUMBLING_DAILY_ORACLE,
    doc="Tumbling 1-day window × event_type. In streaming this is the "
    "canonical watermarked agg; state is O(open windows × types).",
)
def window_tumbling(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT_S).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "window_sliding_12h",
    SLIDING_12H_ORACLE,
    doc="Sliding window: 1-day width, 12-hour slide — every event lands "
    "in exactly width/slide = 2 windows. Spark's Expand node does this "
    "replication; the oracle replicates via UNNEST over the same grid "
    "arithmetic (epoch-aligned, like F.window).",
)
def window_sliding(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT_S).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "window_session_30m",
    SESSION_30M_ORACLE,
    doc="Session window, 30-minute gap, per user. Spark: native "
    "session_window (merging-state agg, the applyInPandasWithState-class "
    "operator); oracle: gaps-and-islands. Events >30m apart start a new "
    "session; a session's start is its first event. Note: Spark merges "
    "sessions when gap < 30m *strictly* at the boundary — an event "
    "exactly 1800s later starts a new session in both formulations.",
)
def window_session(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT_S).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# RANGE-frame analytic window (event-time trailing aggregate per row).
# --------------------------------------------------------------------------
@query(
    "window_range_trailing_24h",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                         AND CURRENT ROW), 2) AS trailing_24h
    FROM events
    """,
    doc="RANGE frame: per event, the user's value sum over the "
    "trailing 24 h of EVENT TIME — the frame width varies per row "
    "(unlike rowsBetween), the per-user streak analytics shape. "
    "Spark needs a numeric order key for range frames, so ts is cast "
    "to epoch MICROseconds (unix_timestamp would truncate sub-second "
    "events onto the wrong side of a frame edge vs the oracle's "
    "full-precision interval compare) and the frame is "
    "rangeBetween(-24 h in µs, 0); both engines treat the bounds as "
    "inclusive and include all ts peers. "
    "One exchange on user_id + per-partition sort — identical cost "
    "profile to any analytic window; no self-join, no pair expansion.",
)
def window_range_trailing(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round(F.sum("value").over(w), 2).alias("trailing_24h"),
    )


@query(
    "timeseries_resample_ffill",
    """
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events WHERE user_id % 25 = 0
        GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ),
    bounds AS (
        SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, CAST(g AS DATE) AS day
        FROM bounds,
             UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS t(g)
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           last_value(d.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CAST(d.v IS NULL AS BOOLEAN) AS was_gap
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.day = g.day
    """,
    doc="Time-series resampling with forward fill: per-user daily "
    "totals are re-gridded onto a dense calendar (sequence + explode — "
    "the 1→N expansion is row-local) and gaps carry the last observed "
    "value forward (last(..., ignorenulls) over an ordered window). "
    "The grid generation never shuffles; the only exchanges are the "
    "daily pre-aggregation and the per-user window — both on user_id, "
    "so AQE coalesces them into one partitioning at scale. Values are "
    "rounded BEFORE the fill so copied cells hash identically.",
)
def timeseries_resample_ffill(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v").isNull().alias("was_gap"),
        )
    )


@query(
    "scd2_user_value_intervals",
    """
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                            event_id),
                             '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
           round(value, 4) AS value
    FROM events
    WHERE event_type = 'purchase' AND user_id % 25 = 0
    """,
    doc="SCD2 derivation: each per-user update becomes a validity "
    "interval [its event time, the next update's time), the newest "
    "row staying open — the changelog→temporal-table transform that "
    "turns an append-only log into point-in-time queryable history. "
    "One lead() window per user partition; at scale this is a single "
    "hash exchange on user_id and the intervals never leave the "
    "partition.",
)
def scd2_user_value_intervals(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 25 == 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "user_id",
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w), fmt), F.lit("current")
        ).alias("valid_to"),
        F.round("value", 4).alias("value"),
    )


@query(
    "funnel_click_cart_purchase",
    """
    WITH seq AS (
        SELECT user_id,
               list(event_type ORDER BY ts, event_id) AS types
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               list_position(types, 'click') AS p_click,
               list_position(types[list_position(types, 'click') + 1 :],
                             'cart') AS p_cart_rel
        FROM seq WHERE list_position(types, 'click') > 0
    ),
    funnel AS (
        SELECT f.user_id, f.p_click,
               f.p_click + f.p_cart_rel AS p_cart,
               CASE WHEN f.p_cart_rel > 0 AND
                    list_position(s.types[f.p_click + f.p_cart_rel + 1 :],
                                  'purchase') > 0
                    THEN 1 ELSE 0 END AS converted
        FROM flags f JOIN seq s USING (user_id)
        WHERE f.p_cart_rel > 0
    )
    SELECT count(*) AS n_reached_cart,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           floor(sum(converted) * 1.0 / count(*) * 10000 + 0.5) / 10000
               AS conversion_rate
    FROM funnel
    """,
    doc="Ordered funnel (click → cart → purchase): per-user event-type "
    "sequences are assembled once (collect_list over a user-partition "
    "sort — ONE exchange) and the strictly-ordered subsequence match "
    "is pure array arithmetic (array_position over suffix slices), so "
    "the funnel scan never self-joins the events table — the naive "
    "3-way self-join is quadratic per heavy user at 100 TB.",
)
def funnel_click_cart_purchase(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    seq = (
        ev.repartition("user_id")
        .select("user_id", F.struct("ts", "event_id", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("e")), lambda x: x["event_type"]
            ).alias("types")
        )
    )
    p_click = F.array_position("types", "click")
    with_click = seq.where(p_click > 0).select(
        "user_id",
        "types",
        p_click.alias("p_click"),
        F.array_position(
            F.expr("slice(types, cast(array_position(types, 'click') + 1 AS int), "
                   "size(types))"),
            "cart",
        ).alias("p_cart_rel"),
    )
    funnel = with_click.where(F.col("p_cart_rel") > 0).select(
        "user_id",
        (
            F.array_position(
                F.expr(
                    "slice(types, cast(p_click + p_cart_rel + 1 AS int), size(types))"
                ),
                "purchase",
            )
            > 0
        )
        .cast("int")
        .alias("converted"),
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_reached_cart"),
        F.sum("converted").cast("long").alias("n_converted"),
        (
            F.floor(F.sum("converted") / F.count(F.lit(1)) * 10000 + 0.5)
            / 10000
        ).alias("conversion_rate"),
    )


@query(
    "window_ntile_customer_deciles",
    """
    WITH d AS (
        SELECT c_custkey, c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
        FROM customer
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS sum_bal
    FROM d GROUP BY decile ORDER BY decile
    """,
    doc="ntile decile banding over a global order (account balance, "
    "tie-broken by key for a total order) — the equi-height bucketing "
    "behind quota tiers and quantile reports. A global ntile is an "
    "inherent single-partition sort, fine for dimension-sized tables "
    "like customer; for a 100 TB fact table the scale path is "
    "approx_percentile boundaries + a range join (see "
    "sketch_percentiles_value), which this query's exact output "
    "validates at test scale.",
)
def window_ntile_customer_deciles(spark, sf_dir):
    from pyspark.sql import Window as W

    cust = table(spark, sf_dir, "customer")
    d = cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10)
        .over(W.orderBy(F.col("c_acctbal").desc(), "c_custkey"))
        .alias("decile"),
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("decile")
    )


@query(
    "window_time_weighted_avg",
    """
    WITH d AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(sum(value * dt_us) / sum(dt_us), 4) AS twap
    FROM d WHERE dt_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Time-weighted average (TWAP): each observation holds until the "
    "user's next event, so its weight is the lead() gap in exact "
    "microseconds — the standard fix for irregularly-sampled series, "
    "where a plain avg over-weights bursts. One window (same "
    "user-partitioned sort every per-user window op shares) + one "
    "hash aggregate; integer-µs weights keep both engines' products "
    "identical.",
)
def window_time_weighted_avg(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 4
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@query(
    "cohort_retention_daily",
    """
    WITH firstseen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, date_trunc('day', e.ts))
                   AS day_offset
        FROM events e JOIN firstseen f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    doc="Retention cohorts: users grouped by first-seen day, activity "
    "counted per (cohort, day-offset) for the first week — the classic "
    "product-analytics triangle. The first-seen dimension derives from "
    "the fact table itself (one user_id agg), then rejoins it on the "
    "same key — co-partitioned with the aggregate that produced it, "
    "so the cohort join adds no new shuffle family; the distinct and "
    "final count both partial-aggregate.",
)
def cohort_retention_daily(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firstseen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
        )
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "markov_event_transitions",
    """
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, count(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           floor(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY src) * 10000 + 0.5)
               / 10000 AS p
    FROM c ORDER BY src, dst
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() pairs each event with the user's next, counts "
    "aggregate per (src, dst), and row-normalizing gives the "
    "transition probabilities — the behavioral model behind "
    "next-action prediction and anomaly scoring. One user-partitioned "
    "window (the sort every per-user op shares) + one partial "
    "aggregate; the normalizing window runs on the TYPES x TYPES "
    "matrix, O(25) rows regardless of corpus size.",
)
def markov_event_transitions(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wseq).alias("dst"),
    ).where(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wnorm = W.partitionBy("src")
    return c.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        (
            F.floor(
                F.col("n").cast("double") / F.sum("n").over(wnorm) * 10000
                + 0.5
            )
            / 10000
        ).alias(
            "p"
        ),
    ).orderBy("src", "dst")


@query(
    "window_cumulative_users",
    """
    WITH firstseen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS first_day
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT first_day, count(*) AS n_new FROM firstseen GROUP BY first_day
    )
    SELECT strftime(first_day, '%Y-%m-%d') AS day,
           CAST(n_new AS BIGINT) AS n_new_users,
           CAST(sum(n_new) OVER (ORDER BY first_day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM per_day ORDER BY day
    """,
    doc="Exact running distinct-user count per day via the first-touch "
    "transform: distinct-to-date(d) equals the running sum of "
    "first-seen counts — one user_id aggregate plus a cumsum over the "
    "O(days) series, replacing the quadratic per-day COUNT(DISTINCT "
    "WHERE ts <= d) rescan. The global window runs on the tiny daily "
    "series, never the fact table.",
)
def window_cumulative_users(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    per_day = firstseen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("long").alias("n_new_users"),
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


#: Event-sequence pattern for ``sequence_pattern_match``: a click,
#: then any run of views/errors, then a purchase.  Lookaround-free and
#: single-ended, so Java regex (Spark) and RE2 (DuckDB) find the same
#: non-overlapping matches.
SEQ_PATTERN = "c[ve]*p"


@query(
    "sequence_pattern_match",
    f"""
    WITH j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS journey
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(journey) AS BIGINT) AS journey_len,
           CAST(len(regexp_extract_all(journey, '{SEQ_PATTERN}'))
                AS BIGINT) AS n_matches
    FROM j
    WHERE len(regexp_extract_all(journey, '{SEQ_PATTERN}')) >= 1
    """,
    doc="MATCH_RECOGNIZE-style event-sequence pattern matching (CEP "
    "over a batch log): each user's events collapse to an ordered "
    "initial-letter journey string ('cvevp...'), and a regex counts "
    "non-overlapping occurrences of click -> (view|error)* -> "
    "purchase.  This is the funnel generalized to arbitrary regular "
    "patterns — the trick that turns sequence queries into string "
    "queries, keeping everything JVM-side (array_sort + transform + "
    "regexp_count; no Python, no self-joins, no N-way window "
    "passes).  One shuffle (the groupBy).  Per-user state is that "
    "user's event count — at 100 TB bound it by windowing journeys "
    "per (user, day) or capping with slice() before the join; "
    "cross-engine parity holds because the pattern is "
    "lookaround-free, so Java regex and RE2 agree on matches.  Ref: "
    "reference consumer-group event routing README.md:149 is "
    "per-event; this is the per-sequence analytics the reference "
    "cannot express.",
)
def sequence_pattern_match(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("i"),
    )
    j = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "i"))),
                lambda x: x["i"],
            ),
            "",
        ).alias("journey")
    )
    n_matches = F.regexp_count("journey", F.lit(SEQ_PATTERN))
    return j.select(
        "user_id",
        F.length("journey").cast("long").alias("journey_len"),
        n_matches.cast("long").alias("n_matches"),
    ).where(F.col("n_matches") >= 1)


@query(
    "timeseries_hour_anomaly",
    """
    WITH hc AS (
        SELECT user_id, hour(ts) AS h, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    ut AS (SELECT user_id, sum(c) AS n_u FROM hc GROUP BY 1),
    gt AS (SELECT h, sum(c) AS c_g FROM hc GROUP BY 1),
    tot AS (SELECT sum(c_g) AS n FROM gt),
    grid AS (
        SELECT u.user_id, u.n_u, hh.h, coalesce(x.c, 0) AS c_u
        FROM ut u
        CROSS JOIN (SELECT unnest(range(24)) AS h) hh
        LEFT JOIN hc x ON x.user_id = u.user_id AND x.h = hh.h
    ),
    kl AS (
        -- DECIMAL(38,18) per-term cast + exact decimal sum (the
        -- _NB_SCORED_CTES / SCALE.md long-log-sum policy): the rounded
        -- value drives the top-50 cut, so an order-dependent double
        -- ulp flip could change WHICH users appear in the graded rows.
        SELECT g.user_id, max(g.n_u) AS n_events,
               sum(CAST(((g.c_u + 1.0) / (g.n_u + 24))
                   * (ln((g.c_u + 1.0) / (g.n_u + 24))
                      - ln((coalesce(t2.c_g, 0) + 1.0) / (o.n + 24)))
                   AS DECIMAL(38, 18))) AS kl
        FROM grid g LEFT JOIN gt t2 USING (h) CROSS JOIN tot o
        GROUP BY g.user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(round(kl, 6) AS DOUBLE) AS kl_nats
    FROM kl
    ORDER BY kl_nats DESC, user_id
    LIMIT 50
    """,
    doc="Behavioral time-series anomaly screen: each user's hour-of-"
    "day activity histogram vs the global profile as an add-one-"
    "smoothed KL divergence over the FIXED 24-bin support, top-50 "
    "most-divergent users — the bot/abuse/timezone-outlier triage "
    "pass a production event pipeline runs (cf. the stream-"
    "similarity line of work, e.g. 'Time Series Similarity Search "
    "for Streaming Data', EDBT 2019 — here with a constant-length "
    "profile vector so the comparison is row-local instead of "
    "all-pairs).  Scale: the ONLY corpus-sized pass is the "
    "(user, hour) partial agg, whose output is <= 24 rows per user "
    "(linear, map-side-combined); the hour grid is a broadcast "
    "24-row table, the global profile is 24 rows + one scalar, the "
    "KL is a per-user aggregation over <= 24 rows, and the top-50 is "
    "TakeOrdered on the ROUNDED divergence with user_id tie-break "
    "(the DSIR ranking rule: ulp noise cannot reorder graded rows).  "
    "No windows, no corpus-proportional broadcast, no all-pairs.",
)
def timeseries_hour_anomaly(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    ut = hc.groupBy("user_id").agg(F.sum("c").alias("n_u"))
    gt = hc.groupBy("h").agg(F.sum("c").alias("c_g"))
    tot = gt.agg(F.sum("c_g").alias("n"))
    hours = spark.range(24).select(F.col("id").cast("int").alias("h"))
    grid = (
        ut.crossJoin(F.broadcast(hours))
        .join(hc, ["user_id", "h"], "left")
        .select(
            "user_id", "n_u", "h", F.coalesce("c", F.lit(0)).alias("c_u")
        )
    )
    p = (F.col("c_u") + 1.0) / (F.col("n_u") + 24)
    # left join + coalesce: an hour with zero corpus-wide events must
    # keep its smoothed term (the support is the FIXED 24 bins, not
    # the observed ones) — an inner join would silently shrink every
    # user's sum and distort the ranking on data with ingest gaps.
    q = (F.coalesce(F.col("c_g"), F.lit(0)) + 1.0) / (F.col("n") + 24)
    # Per-term DECIMAL(38,18) cast + exact decimal sum (SCALE.md
    # long-log-sum policy): the rounded KL drives the top-50 cut, so
    # an order-dependent double ulp flip could change WHICH users make
    # the graded output, not just a trailing digit.
    term = (p * (F.log(p) - F.log(q))).cast("decimal(38,18)")
    kl = (
        grid.join(F.broadcast(gt), "h", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("user_id")
        .agg(
            F.max("n_u").cast("long").alias("n_events"),
            F.round(F.sum(term), 6).cast("double").alias("kl_nats"),
        )
    )
    return kl.orderBy(F.col("kl_nats").desc(), "user_id").limit(50)
