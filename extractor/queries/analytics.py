"""Relational/event analytics: TPC-H-shaped aggregates, windows, as-of/range joins, sessionization, funnels."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _docs,
    _events,
    _lineitem,
)

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape.  Decimal accumulation → result independent of
    partial-agg ordering (shuffle-safe); map-side combine halves the
    exchange."""
    li = _lineitem(spark, sf_dir)
    dec = lambda c, s: F.col(c).cast(f"decimal(18,{s})")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 2)).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", 2)).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

@register(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dims star join.  customer/nation are broadcast (small
    dims) so the only shuffle is lineitem⋈orders on orderkey; at
    100 TB that pair would be bucketed on orderkey to eliminate it."""
    li = _lineitem(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )

@register(
    "events_windowed",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window per type — the batch twin of the streaming
    job in extractor.streaming (same expressions, readStream source)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )

@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      -- CAST: DuckDB's windowed sum yields HUGEINT (→ float64 in
      -- pandas) while Spark yields int64; the driver hashes dtypes.
      -- event_id tie-break: same total order as the lag window, so
      -- simultaneous events get deterministic session ids.
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with analytic windows (lag + running
    sum).  One shuffle on user_id serves both window functions and the
    final groupBy (same partitioning reused across stages)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # EXACT timestamp arithmetic, not truncated epochs: the oracle
    # compares microsecond timestamps against the interval, and a gap
    # like 1800.8 s computed on floor()'d seconds comes out 1800 —
    # flipping the session split on boundary cases (same trap
    # operators/joins.time_range_join documents).
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    # Running sum ordered by (ts, event_id) — the SAME total order as
    # the lag window; ts alone would make tied rows nondeterministic
    # on both engines (no ties at sf0.01, but ties at scale).
    sess = ev.select(
        "user_id", "ts", "event_id", is_new.alias("is_new")
    ).withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
    )

@register(
    "corpus_rollup",
    """
    SELECT coalesce(lang, '<all>') AS lang,
           coalesce(source, '<all>') AS source,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           grouping(lang) + 2 * grouping(source) AS grp
    FROM documents
    GROUP BY ROLLUP (lang, source)
    """,
)
def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity corpus accounting in ONE pass: per (lang,
    source), per lang, and grand total via ROLLUP — one shuffle
    computes all three levels (vs three separate aggregations), the
    standard shape for corpus-composition dashboards at 10^12 docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.grouping("lang") + F.grouping("source") * 2).alias("grp"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs",
            "total_chars",
            F.col("grp").cast("long").alias("grp"),
        )
    )

@register(
    "events_asof_join",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, 1 AS side, NULL::TIMESTAMP AS c_ts,
             NULL::BIGINT AS c_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS side, ts AS c_ts, event_id AS c_id
      FROM events WHERE event_type = 'click'
    ), carried AS (
      SELECT user_id, ts, event_id, side,
             last_value(c_ts IGNORE NULLS) OVER w AS click_ts,
             last_value(c_id IGNORE NULLS) OVER w AS click_event_id
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, ts,
           click_event_id, click_ts,
           CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(click_ts)) AS BIGINT) AS staleness_s
    FROM carried WHERE side = 1
    """,
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior-or-simultaneous click (ties broken by event_id).

    Spark has no ASOF JOIN operator; the scalable formulation
    (operators.joins.asof_join) is union-the-sides + one window pass:
    sort (user, ts, side) and carry the last click forward with
    ``last(..., ignoreNulls)``.  ONE shuffle on user_id, no range
    self-join, no per-row probe — this is the merge-scan an ASOF join
    compiles to anyway, expressed in stock DataFrame ops."""
    from extractor.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        on="ts",
        value_cols={"event_id": "click_event_id"},
        tie_breakers=["event_id"],
    )
    epoch = lambda c: F.col(c).cast("timestamp_ltz").cast("long")  # noqa: E731
    return joined.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.col("ts_right").alias("click_ts"),
        (epoch("ts") - epoch("ts_right")).cast("long").alias("staleness_s"),
    )

@register(
    "events_range_join",
    """
    WITH errors AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), others AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type <> 'error'
    )
    SELECT e.event_id, e.user_id,
           count(o.event_id)::BIGINT AS n_nearby,
           CAST(coalesce(sum(CAST(o.value AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS nearby_value
    FROM errors e LEFT JOIN others o
      ON e.user_id = o.user_id
     AND o.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    GROUP BY e.event_id, e.user_id
    """,
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, count+sum the user's other events
    within +/- 5 minutes.

    The naive form is a per-user inequality join (quadratic in events
    per user, and Spark would nested-loop it).  The scale formulation
    (operators.joins.time_range_join) buckets time into interval-width
    cells, equi-joins on (user_id, cell) with the left side exploded
    over the cells its window touches, then applies the exact range
    predicate — the join is hash-based, candidates are bounded by a
    couple of cells' worth of events, and the equi-key carries the
    skew machinery (AQE) a pure range predicate cannot use."""
    from extractor.operators.joins import time_range_join

    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    others = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id",
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    matched = (
        time_range_join(
            errors, others, by=["user_id"], on="ts", lower_s=-300, upper_s=300
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count("r_event_id").alias("n_nearby"),
            F.sum("r_value").alias("nearby_value"),
        )
    )
    # left-join back so zero-match errors still report 0 (an error
    # whose candidate cells exist but all fail the exact range test
    # must not vanish)
    all_errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id"
    )
    return all_errors.join(matched, ["event_id", "user_id"], "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n_nearby"), F.lit(0)).cast("long").alias("n_nearby"),
        F.coalesce(F.col("nearby_value"), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("nearby_value"),
    )

@register(
    "events_topk_users",
    """
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             count(*) AS n_events
      FROM events GROUP BY event_type, user_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY total_value DESC, user_id) AS rank
      FROM per_user
    )
    SELECT event_type, rank, user_id, total_value, n_events
    FROM ranked WHERE rank <= 3
    """,
)
def q_events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window over a pre-aggregate —
    the aggregate shrinks data before the window's shuffle."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "user_id", "total_value", "n_events")
    )

@register(
    "events_funnel",
    """
    -- strictly-ordered 3-step funnel (view -> click -> purchase):
    -- t2 = first click AFTER the user's first view, t3 = first
    -- purchase AFTER that click; min(ts) is deterministic on both
    -- sides (timestamps are values, not row picks)
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           (CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END)::INT AS steps
    FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
            LEFT JOIN s3 ON s3.user_id = s2.user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel matching (view → click → purchase) via the
    K-step :func:`extractor.operators.funnel.funnel` operator: the
    sequential-pattern analytics a behavioral events table exists for
    — each step's timestamp must STRICTLY follow the previous step's.

    Scale shape (see the operator's module docstring): K sequential
    steps = K-1 equi-joins on user_id after per-user min-aggregates —
    one hash partitioning serves the whole chain, each stage's input
    shrinks to the surviving users, no window over the raw stream.
    K-independence is property-tested in tests/test_properties.py."""
    from extractor.operators.funnel import funnel

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    return funnel(ev, ["view", "click", "purchase"])

@register(
    "retention_cohorts",
    """
    -- integer epoch-week buckets: (epoch_day div 7), no calendar
    -- week-numbering semantics to drift between engines
    WITH wk AS (
      SELECT DISTINCT user_id,
             (ts::DATE - DATE '1970-01-01') // 7 AS week
      FROM events
    ),
    fw AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
    SELECT f.cohort_week::BIGINT AS cohort_week,
           (w.week - f.cohort_week)::BIGINT AS week_offset,
           count(*)::BIGINT AS n_users
    FROM wk w JOIN fw f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix
    (operators.funnel.retention_cohorts): users bucketed by the epoch
    week of their FIRST event, counted in every later week they were
    active — the lifecycle view next to the funnel (and the
    ingestion-wave analog for corpus sources).  One wide shuffle (the
    distinct (user, week) projection, map-side partial-distinct
    folded); the per-user min and the activity join share the user
    hash partitioning."""
    from extractor.operators.funnel import retention_cohorts

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return retention_cohorts(ev)

@register(
    "events_spikes",
    """
    -- hourly burst detection: every 7th event is teleported into one
    -- fixed hour, so that hour spikes for every type while ordinary
    -- hours ride their trailing baseline; RANGE window over the
    -- integer hour index makes absent hours real zeros
    WITH ev AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0
                  THEN TIMESTAMP '2024-01-04 12:30:00' ELSE ts END AS ts
      FROM events
    ), hourly AS (
      SELECT event_type,
             epoch_ms(ts) // 3600000 AS hour_idx,
             count(*) AS n_events
      FROM ev GROUP BY 1, 2
    ), tr AS (
      SELECT event_type, hour_idx, n_events,
             coalesce(sum(n_events) OVER (
               PARTITION BY event_type ORDER BY hour_idx
               RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) AS _tr
      FROM hourly
    )
    SELECT event_type, hour_idx, n_events::BIGINT AS n_events,
           (_tr // 3)::BIGINT AS baseline,
           (n_events * 10000 // greatest(_tr // 3, 1))::BIGINT AS ratio_bp,
           (n_events >= 10 AND _tr > 0
            AND n_events * 10000 // greatest(_tr // 3, 1) >= 30000)
             AS is_spike
    FROM tr
    """,
)
def q_events_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly burst detection (operators.funnel.rate_spikes): every
    7th event teleports into one fixed hour, planting a burst for
    every event type on top of the stream's natural variation; the
    trailing-3-hour baseline is a RANGE window over the integer hour
    index (gaps are zeros), run over the (type, hour) count table —
    never the raw stream.  First-hours-without-history must not
    flag; the oracle mirrors the integer baseline/ratio arithmetic
    exactly."""
    from extractor.operators.funnel import rate_spikes

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0,
            F.lit("2024-01-04 12:30:00").cast("timestamp"),
        ).otherwise(F.col("ts")).alias("ts"),
    )
    return rate_spikes(ev)

@register(
    "query_traps",
    """
    -- faceted/session-id URL-space explosion per (host, path): the
    -- %3=0 path carries doc-distinct query variants (the trap), the
    -- %3=1 path repeats ONE query (benign), the rest are bare
    WITH u AS (
      SELECT doc_id,
             'h' || (doc_id % 9) AS hn,
             doc_id % 3 AS cls
      FROM documents
    ), rows_ AS (
      SELECT hn || '.shop.test' AS host,
             CASE cls WHEN 0 THEN '/search' WHEN 1 THEN '/list'
                      ELSE '/about' END AS path,
             CASE cls WHEN 0 THEN 'q=' || doc_id::VARCHAR || '&page='
                                  || (doc_id % 5)::VARCHAR
                      WHEN 1 THEN 'sort=price' ELSE '' END AS query
      FROM u
    )
    SELECT host, path, count(*)::BIGINT AS n_urls,
           count(DISTINCT query)::BIGINT AS n_variants,
           sum(CASE WHEN query <> '' THEN 1 ELSE 0 END)::BIGINT
             AS with_query
    FROM rows_ GROUP BY 1, 2
    """,
)
def q_query_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-parameter trap detection
    (operators.crawl.query_variant_stats): per (host, path), distinct
    query-string variants — the '/search?q=…&page=…' URL-space
    explosion that floods a frontier with one page's worth of
    content; the %3=0 class plants doc-distinct variants (the trap
    signature: n_variants ≈ n_urls), the %3=1 class repeats one
    query (benign: n_variants = 1), bare paths count the empty
    variant.  Map-only split, one aggregate; the oracle restates the
    classes arithmetically."""
    from extractor.operators.crawl import query_variant_stats

    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 9).cast("string"), F.lit(".shop.test"))
    url = F.concat(
        F.lit("https://"),
        host,
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("/search?q="), d.cast("string"),
                F.lit("&page="), (d % 5).cast("string"),
            ),
        )
        .when(d % 3 == 1, F.lit("/list?sort=price"))
        .otherwise(F.lit("/about")),
    )
    urls = _docs(spark, sf_dir).select(url.alias("url"))
    return query_variant_stats(urls)
