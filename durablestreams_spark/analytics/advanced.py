"""Advanced relational surface: exact percentiles, correlated EXISTS,
lateral explode, deterministic hash sampling, approximate sketches.

Each rides a Catalyst built-in (SURVEY.md §2.2); the sampling pattern
is the 100 TB-relevant one — reproducible subsetting must hash the
data, never ``TABLESAMPLE``/``rand()`` (those are partition-layout- and
seed-dependent, so no oracle could ever agree with them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import query, table


@query(
    "agg_percentiles_value",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB `quantile_cont`). Exact percentile is a full sort per "
    "group; at 100 TB prefer approx_percentile (t-digest) — kept exact "
    "here because the oracle must agree bit-for-bit.",
)
def agg_percentiles_value(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "exists_customers_with_urgent",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Correlated EXISTS — decorrelates to a left-semi join; the "
    "orders side is filtered before the shuffle so the join carries "
    "only urgent keys.",
)
def exists_customers_with_urgent(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "lateral_top_tokens",
    """
    SELECT tok, count(*) AS n
    FROM (SELECT UNNEST(string_split_regex(lower(text), '\\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    doc="Lateral explode: tokenize → UNNEST/explode → global top-20 "
    "token histogram. Explode output never materializes as a table — "
    "it streams straight into the partial aggregation.",
)
def lateral_top_tokens(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@query(
    "sample_hash_deterministic",
    """
    SELECT count(*) AS n_sampled,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                     CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
    """,
    doc="Deterministic ~10% sample (26/256 of the md5 keyspace) by "
    "hashing the row key — reproducible across engines, runs, and "
    "repartitions, unlike TABLESAMPLE/rand(). The filter is a pure "
    "row-local predicate: no shuffle, prunes before the agg.",
)
def sample_hash_deterministic(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.where(F.substring(F.md5(key), 1, 2) < "1a").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@query(
    "sketch_distinct_users",
    """
    SELECT event_type, count(*) AS n_events, true AS approx_ok
    FROM events GROUP BY event_type
    """,
    doc="HyperLogLog++ distinct-user sketch per event_type "
    "(approx_count_distinct, rsd=2%). Sketches are THE 100 TB distinct "
    "path — mergeable partial state, no giant shuffle of raw keys. "
    "DuckDB's estimator differs, so the sketch VALUE can't be oracled "
    "directly; instead the query emits approx_ok = |approx - exact| ≤ "
    "3×rsd×exact per group and the oracle asserts `true` — an error "
    "bound the estimator guarantees with overwhelming probability, "
    "turning what was a rows-only free pass into a hash-matched gate.",
)
def sketch_distinct_users(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02)
                - F.count_distinct("user_id")
            )
            <= 3 * 0.02 * F.count_distinct("user_id")
        ).alias("approx_ok"),
    )


@query(
    "map_explode_props",
    """
    WITH kv AS (
        SELECT UNNEST(json_keys(props)) AS prop_key, props FROM events
    )
    SELECT prop_key,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS sum_val,
           CAST(max(CAST(json_extract(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS max_val
    FROM kv
    GROUP BY prop_key
    """,
    doc="Map functions over the schemaless payload: from_json into "
    "map<string,long>, explode the entries, aggregate per key — the "
    "generic shape for property bags whose keys aren't known at write "
    "time (the oracle walks the same JSON with json_each).",
)
def map_explode_props(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("prop_key", "val"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("sum_val"),
            F.max("val").alias("max_val"),
        )
    )


@query(
    "sketch_percentiles_value",
    """
    SELECT event_type, true AS p50_ok, true AS p90_ok
    FROM events GROUP BY event_type
    """,
    doc="t-digest-style percentile sketch (approx_percentile, accuracy "
    "10000) per event_type — THE 100 TB percentile path (mergeable "
    "partial state; the exact percentile in agg_percentiles_value "
    "needs a full per-group sort). Engines' sketches differ, so the "
    "VALUE can't be oracled; instead each approx must land within the "
    "exact [p-1%, p+1%] value bracket computed in the same aggregation "
    "— the rank-error guarantee approx_percentile makes at this "
    "accuracy. Oracle asserts the all-true table.",
)
def sketch_percentiles_value(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    def bracket_ok(p: float):
        approx = F.expr(f"approx_percentile(value, {p}, 10000)")
        lo = F.percentile("value", F.lit(max(p - 0.01, 0.0)))
        hi = F.percentile("value", F.lit(min(p + 0.01, 1.0)))
        return (approx >= lo) & (approx <= hi)
    return ev.groupBy("event_type").agg(
        bracket_ok(0.5).alias("p50_ok"),
        bracket_ok(0.9).alias("p90_ok"),
    )


@query(
    "sample_stratified_by_type",
    """
    WITH frac(event_type, thr) AS (
        VALUES ('click', '19'), ('view', '19'),
               ('purchase', 'ff'), ('signup', 'ff'), ('error', '7f')
    )
    SELECT e.event_type,
           count(*) AS n_sampled,
           round(sum(value), 2) AS sum_value
    FROM events e JOIN frac f ON e.event_type = f.event_type
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < f.thr
    GROUP BY e.event_type
    """,
    doc="Stratified deterministic sampling — per-class rates (down-"
    "sample abundant clicks/views to ~10%, keep all purchases/signups, "
    "half the errors), THE class-rebalancing primitive for training-"
    "data curation. Same md5-keyspace trick as "
    "sample_hash_deterministic so the sample is identical across "
    "engines/runs/partitionings; the per-class threshold joins in "
    "from a broadcast-sized rate table. Row-local predicate, no "
    "pre-agg shuffle; at 100 TB the rate table is a literal map "
    "baked into the filter expression.",
)
def sample_stratified_by_type(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    rates = spark.createDataFrame(
        [("click", "19"), ("view", "19"), ("purchase", "ff"),
         ("signup", "ff"), ("error", "7f")],
        "event_type string, thr string",
    )
    return (
        ev.join(F.broadcast(rates), "event_type")
        .where(F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < F.col("thr"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "sketch_top_terms",
    """
    WITH toks AS (
        SELECT UNNEST(string_split_regex(text, '\\s+')) AS tok
        FROM documents
    ),
    exact AS (
        SELECT tok, count(*) AS cnt FROM toks WHERE tok <> ''
        GROUP BY tok ORDER BY cnt DESC, tok LIMIT 10
    )
    SELECT tok, cnt, true AS approx_ok FROM exact
    """,
    doc="Frequent-items sketch: approx_top_k over the token stream — a "
    "mergeable one-pass summary (map-side partial sketches, tiny final "
    "merge), THE 100 TB plan for heavy-hitter terms vs. a full-vocab "
    "groupBy+sort. The sketch capacity (10k slots) far exceeds this "
    "corpus's vocabulary, so estimates are exact and the oracle checks "
    "them against the true counts: approx_ok = (sketch estimate == "
    "exact count) for each of the exact top-10 tokens (sketch read at "
    "top-50 so rank-boundary ties cannot hide a token).",
)
def sketch_top_terms(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    sk = (
        toks.agg(F.expr("approx_top_k(tok, 50, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("tok"), F.col("e.count").alias("est"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(10)
    )
    return top.join(F.broadcast(sk), "tok", "left").select(
        "tok", "cnt", (F.col("est") == F.col("cnt")).alias("approx_ok")
    )


@query(
    "sketch_distinct_rollup",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS approx_ok
    FROM events GROUP BY ROLLUP(event_type)
    ORDER BY event_type
    """,
    doc="HLL sketch MERGEABILITY under rollup: approx_count_distinct "
    "per event_type AND the grand total in one pass — the total's "
    "sketch is the merge of the per-group partials, which is exactly "
    "why sketches are the 100 TB distinct path (partial state "
    "combines across groups and partitions; raw-key shuffles don't). "
    "Same bounds-gating as sketch_distinct_users: each row emits "
    "approx_ok = |approx - exact| <= 3*rsd*exact and the oracle "
    "asserts true, so the merged estimate is hash-gated too.",
)
def sketch_distinct_rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.abs(
                    F.approx_count_distinct("user_id", 0.02)
                    - F.count_distinct("user_id")
                )
                <= 3 * 0.02 * F.count_distinct("user_id")
            ).alias("approx_ok"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "approx_ok",
        )
        .orderBy("event_type")
    )


@query(
    "agg_value_quartile_buckets",
    """
    WITH q AS (
        SELECT quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.50) AS q2,
               quantile_cont(value, 0.75) AS q3
        FROM events
    )
    SELECT CASE WHEN value <= q.q1 THEN 'q1'
                WHEN value <= q.q2 THEN 'q2'
                WHEN value <= q.q3 THEN 'q3'
                ELSE 'q4' END AS quartile,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events, q
    GROUP BY quartile, event_type
    ORDER BY quartile, event_type
    """,
    doc="Quartile classification by computed boundaries — the pattern "
    "that replaces a global ntile sort at fact scale: the three "
    "boundaries come from ONE tiny aggregate (here exact interpolated "
    "percentiles so the oracle agrees bit-for-bit; approx_percentile "
    "at 100 TB), then classification is a row-local CASE broadcast "
    "with the scan — no global sort anywhere. Exactly the scale path "
    "window_ntile_customer_deciles' docstring prescribes, realized "
    "and oracle-gated.",
)
def agg_value_quartile_buckets(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    q = ev.agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.50)").alias("q2"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    ).collect()[0]
    quartile = (
        F.when(F.col("value") <= q.q1, "q1")
        .when(F.col("value") <= q.q2, "q2")
        .when(F.col("value") <= q.q3, "q3")
        .otherwise("q4")
    )
    return (
        ev.select(quartile.alias("quartile"), "event_type")
        .groupBy("quartile", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("quartile", "event_type")
    )


@query(
    "agg_modern_functions",
    """
    SELECT event_type,
           CAST(count_if(value > 50) AS BIGINT) AS n_high,
           bool_or(value > 99)  AS any_near_max,
           bool_and(value >= 0) AS all_non_negative,
           CAST(min_by(user_id, event_id) AS BIGINT) AS first_ingested_user,
           CAST(max_by(user_id, event_id) AS BIGINT) AS last_ingested_user
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="The modern conditional/argmax aggregate family in one pass: "
    "count_if, bool_or/bool_and, and min_by/max_by keyed on the unique "
    "event_id (argmin/argmax with a deterministic total order — "
    "keying on a non-unique column would be engine-dependent). All "
    "hash-aggregable with map-side partials; min_by/max_by is the "
    "shuffle-free replacement for a rank-window argmax (same move as "
    "text_tfidf_top_term's min_by rewrite).",
)
def agg_modern_functions(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("count_if(value > 50)").cast("long").alias("n_high"),
            F.expr("bool_or(value > 99)").alias("any_near_max"),
            F.expr("bool_and(value >= 0)").alias("all_non_negative"),
            F.min_by("user_id", "event_id").cast("long").alias(
                "first_ingested_user"
            ),
            F.max_by("user_id", "event_id").cast("long").alias(
                "last_ingested_user"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "audit_referential_integrity",
    """
    SELECT 'dup_orderkeys' AS check_name,
           CAST((SELECT count(*) FROM (
                SELECT o_orderkey FROM orders
                GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'events_null_user',
           CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orphans',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_orphans',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    ORDER BY check_name
    """,
    doc="Constraint audit (the dbt-tests pattern as one query): FK "
    "orphan counts via anti joins (lineitem→orders, orders→customer), "
    "key-uniqueness violations, and null-key counts — the checks a "
    "pipeline runs after every load. Each check is an independent "
    "partial-aggregated count; anti joins broadcast the key side "
    "projections at dimension scale and shuffle-join beyond, exactly "
    "like the production joins they guard.",
)
def audit_referential_integrity(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    ev = table(spark, sf_dir, "events")

    def row(name, df_count):
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("c").cast("long").alias("n_bad"),
        )

    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nullu = ev.where(F.col("user_id").isNull()).agg(
        F.count(F.lit(1)).alias("c")
    )
    li_orph = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("c"))
    o_orph = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        row("dup_orderkeys", dup)
        .unionByName(row("events_null_user", nullu))
        .unionByName(row("lineitem_orphans", li_orph))
        .unionByName(row("orders_orphans", o_orph))
        .orderBy("check_name")
    )


#: Columns profiled by ``audit_column_profile`` — chosen so min/max
#: render identically as strings in Spark and DuckDB (doubles stay
#: under 1e7, where Spark's shortest-round-trip cast would switch to
#: scientific notation and DuckDB's would not).
PROFILE_COLS = (
    "l_returnflag",
    "l_linestatus",
    "l_quantity",
    "l_discount",
    "l_shipdate",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM lineitem"""
    for c in PROFILE_COLS
) + "\nORDER BY col_name"


@query(
    "audit_column_profile",
    _PROFILE_ORACLE,
    doc="Per-column data profile (the SUMMARIZE / dbt-docs staple every "
    "ingestion pipeline runs first): row count, null count, exact "
    "distinct count, min and max for a fixed column set, computed in "
    "ONE pass over the table — the multi-column distinct lowers to "
    "one Expand + partial-agg shuffle rather than N table scans.  At "
    "100 TB the Expand's N-fold row replication is the documented "
    "cost knob: swap count_distinct for approx_count_distinct (HLL, "
    "no Expand) when exactness isn't required — one-line change, "
    "same output shape.  min/max are cast AFTER aggregation so the "
    "comparison runs on the native type, not lexicographically.",
)
def audit_column_profile(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = li.agg(*aggs)
    profile_rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_nulls"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_val"),
                F.col(f"{c}__mx").alias("max_val"),
            )
            for c in PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(profile_rows).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


_PROFILE_APPROX_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           true AS approx_ok,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM lineitem"""
    for c in PROFILE_COLS
) + "\nORDER BY col_name"


@query(
    "audit_column_profile_approx",
    _PROFILE_APPROX_ORACLE,
    doc="The 100 TB configuration of audit_column_profile, GRADED "
    "rather than merely documented: distinct counts via "
    "approx_count_distinct (HLL++, rsd=2%) so the single-pass plan "
    "has NO Expand — no N-fold row replication for N profiled "
    "columns (plan-audited).  Sketch values can't be oracled across "
    "engines, so each column emits approx_ok = |approx - exact| <= "
    "3*rsd*exact, and the oracle asserts true — same bounds-gate "
    "recipe as sketch_distinct_users.  Exact min/max/null counts "
    "stay hash-checked.",
)
def audit_column_profile_approx(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.approx_count_distinct(c, 0.02).alias(f"{c}__ad"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = li.agg(*aggs)
    # exact distincts for the bounds check, computed once in a second
    # tiny agg and cross-joined (both rows are single-row broadcasts;
    # the PROFILED pass above is the one that must stay Expand-free)
    exact = li.agg(
        *[F.count_distinct(c).alias(f"{c}__nd") for c in PROFILE_COLS]
    )
    both = one.crossJoin(F.broadcast(exact))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_nulls"),
                (
                    F.abs(F.col(f"{c}__ad") - F.col(f"{c}__nd"))
                    <= 3 * 0.02 * F.col(f"{c}__nd")
                ).alias("approx_ok"),
                F.col(f"{c}__mn").alias("min_val"),
                F.col(f"{c}__mx").alias("max_val"),
            )
            for c in PROFILE_COLS
        ]
    )
    return (
        both.select(F.explode(rows).alias("p")).select("p.*").orderBy("col_name")
    )


@query(
    "scan_corrupt_records",
    """
    WITH mangled AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0
                    THEN substr(props, 1, length(props) - 1)
                    ELSE props END AS p
        FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN NOT json_valid(p) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN json_valid(p)
                         THEN CAST(json_extract(p, '$.k') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_k_valid
    FROM mangled GROUP BY event_type ORDER BY event_type
    """,
    doc="Corrupt-record tolerance (the schema-on-read contract a real "
    "ingest needs: malformed payloads must be COUNTED and QUARANTINED, "
    "never crash the scan and never silently vanish): every 7th "
    "record's JSON payload is deterministically truncated in-query, "
    "then parsed with from_json under PERMISSIVE semantics with a "
    "columnNameOfCorruptRecord quarantine column — malformed input "
    "lands there verbatim (PERMISSIVE returns a null-FIELDED struct, "
    "not a null struct, so a naive is-null check sees nothing; the "
    "quarantine column is the idiomatic detector), and the "
    "aggregation splits per-type corrupt/valid counts plus the "
    "valid-only sum.  The "
    "oracle re-derives the same split with json_valid, so a parser "
    "that crashed, dropped, or mis-bucketed one row is a hash "
    "mismatch.  Row-local expressions only — the corruption screen "
    "adds zero shuffles to the scan.",
)
def scan_corrupt_records(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        mangled,
        "k bigint, _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    return (
        ev.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("p._corrupt").isNotNull().cast("long"))
            .cast("long")
            .alias("n_corrupt"),
            F.sum(F.coalesce(F.col("p.k"), F.lit(0)))
            .cast("long")
            .alias("sum_k_valid"),
        )
        .orderBy("event_type")
    )
