"""Event-stream queries on the `events` table (batch expressions).

The reference has no true streaming (SURVEY.md §2.10) — its analogue
is cron-driven incremental batch. We expose the standard event-time
operators here as deterministic batch plans (each with a DuckDB
oracle); `streaming/` wraps the same logic for Structured Streaming
execution with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.functions.temporal import epoch_seconds
from ccgp_data_wrangling_spark.operators.asof import asof_join
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# Tumbling event-time window (batch form of the streaming windowed agg).
# Scale: group keys (hour, type) are bounded; map-side partial agg makes the
# shuffle tiny regardless of input size.
# ---------------------------------------------------------------------------

_TUMBLE_SQL = """
SELECT DATE_TRUNC('hour', ts)  AS hour,
       event_type,
       COUNT(*)                AS n_events,
       ROUND(SUM(value), 3)    AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


@register("t_hourly_rollup", _TUMBLE_SQL)
def t_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization: lag + gap>30min flag + running sum = session id
# (the batch dual of streaming session_window; guide "Common OLAP patterns").
# Scale: one shuffle on user_id; windows evaluate within partitions. Skewed
# users are bounded by per-user event counts, AQE splits stragglers.
# ---------------------------------------------------------------------------

_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions GROUP BY 1
"""


@register("t_user_sessions", _SESSION_SQL)
def t_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order_w)
    # timestamp→double keeps microsecond precision exactly (2024 epoch
    # micros ≪ 2^53), matching DuckDB's exact interval comparison
    gap = epoch_seconds(F.col("ts")) - epoch_seconds(prev_ts)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_ts.isNull() | (gap > 1800.0), 1).otherwise(0).alias("new_session"),
    )
    run_w = order_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(run_w).alias("session_id")
    )
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# W1 within-group proportion + JSON extraction (X-class scalar work on the
# semi-structured `props` column).
# ---------------------------------------------------------------------------

_SHARE_SQL = """
WITH typed AS (
  SELECT event_type,
         CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
         value,
         CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
  FROM events
),
daily AS (
  SELECT event_type, day, ROUND(SUM(value), 3) AS day_value,
         CAST(SUM(k) AS BIGINT) AS day_k
  FROM typed GROUP BY 1, 2
)
SELECT event_type, day, day_value, day_k,
       ROUND(100.0 * day_value / SUM(day_value) OVER (PARTITION BY event_type), 4)
         AS pct_of_type
FROM daily
"""


@register("t_daily_share", _SHARE_SQL)
def t_daily_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    typed = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    daily = typed.groupBy("event_type", "day").agg(
        F.round(F.sum("value"), 3).alias("day_value"),
        F.sum("k").cast("long").alias("day_k"),
    )
    w = W.partitionBy("event_type")
    return daily.select(
        "event_type",
        "day",
        "day_value",
        "day_k",
        F.round(100.0 * F.col("day_value") / F.sum("day_value").over(w), 4).alias(
            "pct_of_type"
        ),
    )

# ---------------------------------------------------------------------------
# As-of join: each purchase gets the latest click at-or-before it by the
# same user (operators/asof.py — union + one keyed window; the oracle is
# DuckDB's native ASOF LEFT JOIN). No (user_id, ts) duplicates exist in
# the data, so the match is deterministic on both sides.
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts, ROUND(value, 3) AS purchase_value
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts, ROUND(value, 3) AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, p.purchase_value, c.click_ts, c.click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


@register("asof_last_click", _ASOF_SQL)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 3).alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.round("value", 3).alias("click_value"),
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="click_ts"
    )


# ---------------------------------------------------------------------------
# Multi-grain rollup (hypertable-style continuous aggregate): hour and
# day grains computed in ONE scan via GROUPING SETS (the grain column
# is null for the other set's rows). At scale this halves the input
# passes vs two separate rollups; both grains partial-aggregate
# map-side before one shuffle.
# ---------------------------------------------------------------------------

_MULTIGRAIN_SQL = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
       CAST(DATE_TRUNC('day', ts)  AS TIMESTAMP) AS day,
       event_type,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 3) AS total_value
FROM events
GROUP BY GROUPING SETS (
  (DATE_TRUNC('hour', ts), event_type),
  (DATE_TRUNC('day', ts), event_type)
)
"""


@register("t_multigrain_rollup", _MULTIGRAIN_SQL)
def t_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("hour", "ts").alias("hour"),
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        "value",
    ).createOrReplaceTempView("__events_grains")
    return spark.sql(
        """
        SELECT hour, day, event_type,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 3) AS total_value
        FROM __events_grains
        GROUP BY GROUPING SETS ((hour, event_type), (day, event_type))
        """
    )


# ---------------------------------------------------------------------------
# Native session_window sessionization: the engine's streaming
# session operator (streaming/incremental.session_window_rollup) run
# in batch mode, verified against the classic gaps-and-islands SQL.
# Spark merges an event into a session while ts < last_ts + gap, so a
# new island starts exactly when the gap is >= 10 minutes.
# ---------------------------------------------------------------------------

_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) >= 600.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
islands AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS session_end,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM islands GROUP BY user_id, sid
"""


@register("t_session_window_native", _SESSION_WINDOW_SQL)
def t_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.streaming.incremental import (
        session_window_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    return session_window_rollup(ev, gap="10 minutes")


# ---------------------------------------------------------------------------
# Conversion funnel: view -> click -> purchase, strictly ordered per
# user. Three conditional min-aggregates chained by inequality joins —
# each stage shuffles only (user, ts) pairs for one event type, so the
# funnel costs three keyed aggs regardless of event volume.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 'click_after_view', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'purchase_after_click', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
"""


@register("funnel_stage_conversion", _FUNNEL_SQL)
def funnel_stage_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users who viewed, then
    clicked after their first view, then purchased after that first
    qualifying click."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None) -> DataFrame:
        e = ev.where(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col("t_prev"))
        return e.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage("view", v)
        .unionByName(stage("click_after_view", c))
        .unionByName(stage("purchase_after_click", p))
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts: users bucketed by first-activity week,
# tracked by week offset. Two hash aggs + one equi-join; output is
# cohorts x offsets — bounded by the calendar, not the data.
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
  FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id
)
SELECT c.cohort_wk,
       CAST((w.wk - c.cohort_wk) / 7 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@register("cohort_weekly_retention", _COHORT_SQL)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort week x week offset ->
    distinct active users."""
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (per-user Markov bigrams): lag window
# per user, then a bounded (from, to) hash agg — path analytics whose
# output is |types|^2 regardless of event volume.
# ---------------------------------------------------------------------------

_TRANSITION_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


@register("event_transition_matrix", _TRANSITION_SQL)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# MAD outlier flags: median absolute deviation per event type — the
# robust QC gate (mean/stddev break under the very outliers being
# hunted). Two grouped exact percentiles over a bounded group count.
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH med AS (
  SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, ANY_VALUE(m.med) AS med,
         QUANTILE_CONT(ABS(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value,
       ROUND(m.med, 4) AS med, ROUND(m.mad, 4) AS mad
FROM events e JOIN mad m USING (event_type)
WHERE ABS(e.value - m.med) > 3 * m.mad
"""


@register("mad_outlier_flags", _MAD_SQL)
def mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            ),
        )
    )
    return (
        ev.join(mad, "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
        )
    )


# ---------------------------------------------------------------------------
# Recency-decayed user value: half-life weighting with power-of-two
# decay — 2^-days is EXACT in doubles, so the score is deterministic
# cross-engine (exp()/pow() rounding is libm-dependent; 1/(1<<d) is
# not). One hash agg; the decay is a pure Column expression.
# ---------------------------------------------------------------------------

_DECAY_SQL = """
WITH anchor AS (
  SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events
)
SELECT user_id,
       ROUND(SUM(value / (1 << LEAST(CAST(a.d0 - CAST(ts AS DATE) AS INT), 52))), 4)
         AS decayed_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, anchor a
GROUP BY user_id
"""


@register("decayed_user_value", _DECAY_SQL)
def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value with a 1-day half-life: each event contributes
    ``value / 2^age_days`` (capped at 52 doublings — beyond that the
    contribution is below double epsilon anyway)."""
    ev = load_table(spark, sf_dir, "events")
    # the corpus anchor date rides along as a lazy scalar subquery —
    # no 1-row cross join in the plan
    d0 = ev.agg(F.max(F.col("ts").cast("date"))).scalar()
    age = F.least(F.datediff(d0, F.col("ts").cast("date")), F.lit(52))
    return (
        ev.withColumn("age", age)
        # python F.shiftleft only takes a literal shift; the SQL form
        # shifts by a column
        .withColumn("decay", F.expr("value / shiftleft(CAST(1 AS BIGINT), age)"))
        .groupBy("user_id")
        .agg(
            F.round(F.sum("decay"), 4).alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE: all grouping combinations of (event_type, day) in ONE pass —
# Spark expands the grouping sets map-side, so the cube costs one
# shuffle regardless of how many subtotal grains it emits.
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
            ELSE event_type END AS event_type,
       CASE WHEN GROUPING(d) = 1 THEN 'ALL'
            ELSE CAST(d AS VARCHAR) END AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 3) AS total_value
FROM (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events)
GROUP BY CUBE (event_type, d)
"""


@register("cube_event_value", _CUBE_SQL)
def cube_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    )
    # grouping() is only legal inside the agg, so surface the flags
    # there and translate them in a post-projection
    return (
        ev.cube("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
            F.grouping("event_type").alias("_g1"),
            F.grouping("d").alias("_g2"),
        )
        .select(
            F.when(F.col("_g1") == 1, F.lit("ALL"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("_g2") == 1, F.lit("ALL"))
            .otherwise(F.col("d").cast("string"))
            .alias("day"),
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding moving average per user (7-row trailing frame): ROWS frames
# are the streaming-friendly window shape — state per user is the
# frame, not the history.
# ---------------------------------------------------------------------------

_MOVAVG_SQL = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 4) AS value_ma7
FROM events
"""


@register("moving_avg_user_value", _MOVAVG_SQL)
def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("value_ma7"),
    )


# ---------------------------------------------------------------------------
# PSI value-drift monitor (operators/drift.psi_drift): per event type,
# how far the value distribution moved between the first and second
# half of January. Decile bounds come from the reference half only
# (exact percentiles, rounded 6 dp); both halves are binned in ONE
# conditional aggregate. PSI terms use 6-dp-rounded LN (libm-proof).
# Bins observed in neither period contribute nothing on either engine
# (the sum runs over observed (group, bin) rows — documented in the
# operator).
# ---------------------------------------------------------------------------

_PSI_SQL = """
WITH bounds AS (
  SELECT event_type AS g,
         LIST_TRANSFORM(QUANTILE_CONT(value,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           b -> ROUND(b, 6)) AS bounds
  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
  GROUP BY 1
),
binned AS (
  SELECT e.event_type AS g,
         e.ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref,
         LEN(LIST_FILTER(b.bounds, x -> x <= e.value)) AS bin
  FROM events e JOIN bounds b ON b.g = e.event_type
),
counts AS (
  SELECT g, bin,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c_cmp
  FROM binned GROUP BY 1, 2
),
totals AS (
  SELECT g, SUM(c_ref) AS n_ref, SUM(c_cmp) AS n_cmp FROM counts GROUP BY 1
),
psi AS (
  SELECT c.g, ANY_VALUE(t.n_ref) AS n_ref, ANY_VALUE(t.n_cmp) AS n_cmp,
         ROUND(SUM(
           ((c.c_cmp + 0.5) / (t.n_cmp + 5.0)
            - (c.c_ref + 0.5) / (t.n_ref + 5.0))
           * ROUND(LN(((c.c_cmp + 0.5) / (t.n_cmp + 5.0))
                      / ((c.c_ref + 0.5) / (t.n_ref + 5.0))), 6)), 4) AS psi
  FROM counts c JOIN totals t USING (g) GROUP BY c.g
)
SELECT g AS event_type,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cmp AS BIGINT) AS n_cmp,
       psi,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'drifting'
            ELSE 'action' END AS drift_band
FROM psi
"""


@register("psi_value_drift", _PSI_SQL)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.operators.drift import psi_drift

    ev = load_table(spark, sf_dir, "events")
    return psi_drift(
        ev,
        group_col="event_type",
        value_col="value",
        ts_col="ts",
        split_ts="2024-01-16 00:00:00",
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: explicit aggregation lattice — (type, month),
# (type), (month) — without CUBE's unwanted grand total. One pass,
# one expand node; the oracle lists the identical sets.
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(DATE_TRUNC('month', ts) AS VARCHAR) || '', 'ALL') AS month,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 3) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type, DATE_TRUNC('month', ts)),
                        (event_type), (DATE_TRUNC('month', ts)))
"""


@register("grouping_sets_events", _GSETS_SQL)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-set aggregation lattice over events in ONE scan.

    CUBE/ROLLUP cousins are covered by cube_event_value /
    rollup_order_profile; GROUPING SETS is the general form users
    reach for when only specific cells are wanted — Spark expands all
    sets in a single Expand node (rows × |sets| before partial agg),
    still one shuffle.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("month", "ts").alias("m"), "value"
    )
    return (
        ev.groupingSets(
            [["event_type", "m"], ["event_type"], ["m"]],
            "event_type",
            "m",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("m").cast("date").cast("string"), F.lit("ALL")).alias(
                "month"
            ),
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Unpivot/melt: wide per-type daily counts back to long form. The
# inverse of r2_filename_pivot's PIVOT; Spark's native unpivot
# (Expand node, no join, no UDF).
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
WITH wide AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
  FROM events GROUP BY 1
)
SELECT d, metric, n FROM wide
UNPIVOT (n FOR metric IN (click, view, purchase))
"""


@register("unpivot_daily_counts", _UNPIVOT_SQL)
def unpivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot wide → melt long round trip over daily event counts.

    The conditional-aggregate pivot is one hash aggregate; unpivot is
    a pure Expand projection (3 rows out per input row, no shuffle).
    DuckDB's UNPIVOT drops NULL cells by default and Spark's unpivot
    does the same — counts here are never NULL, so the duals agree.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "event_type"
    )
    wide = ev.groupBy("d").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in ("click", "view", "purchase")
        ]
    )
    return wide.unpivot(
        ["d"], ["click", "view", "purchase"], "metric", "n"
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance: fold a delta (late-arriving rows +
# retractions of error events) into a stored per-type aggregate
# without touching the base period (operators/matview.py). Oracle
# replays state-build + fold arithmetic.
# ---------------------------------------------------------------------------

_MV_SQL = """
WITH base AS (
  SELECT event_type, value FROM events WHERE ts < TIMESTAMP '2024-02-15 00:00:00'
),
state AS (
  SELECT event_type AS g,
         CAST(COUNT(*) AS BIGINT) AS n, SUM(value) AS total,
         MIN(value) AS vmin, MAX(value) AS vmax,
         FALSE AS has_retract
  FROM base GROUP BY 1
),
delta AS (
  SELECT event_type, value, 1 AS w FROM events
  WHERE ts >= TIMESTAMP '2024-02-15 00:00:00'
  UNION ALL
  SELECT event_type, value, -1 FROM events
  WHERE ts < TIMESTAMP '2024-02-15 00:00:00' AND event_type = 'error'
    AND value > 90
),
dstate AS (
  SELECT event_type AS g,
         CAST(SUM(w) AS BIGINT) AS n, SUM(w * value) AS total,
         MIN(CASE WHEN w > 0 THEN value END) AS vmin,
         MAX(CASE WHEN w > 0 THEN value END) AS vmax,
         MAX(w < 0) AS has_retract
  FROM delta GROUP BY 1
),
merged AS (
  SELECT g, CAST(SUM(n) AS BIGINT) AS n, SUM(total) AS total,
         MIN(vmin) AS vmin, MAX(vmax) AS vmax,
         MAX(has_retract) AS needs_rescan
  FROM (SELECT * FROM state UNION ALL SELECT * FROM dstate)
  GROUP BY g HAVING SUM(n) > 0
)
SELECT g, n, ROUND(total, 4) AS total, vmin, vmax,
       ROUND(total / n, 4) AS avg, needs_rescan
FROM merged
"""


@register("incremental_rollup_fold", _MV_SQL)
def incremental_rollup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-type rollup folded forward by one delta batch
    (operators/matview.rollup_state / rollup_fold).

    The delta carries the new period's insertions plus retractions of
    bad base-period rows (error events with value > 90); counts/sums
    absorb retractions exactly, min/max groups are flagged
    ``needs_rescan`` — cost is delta-sized, the base period is never
    rescanned.
    """
    from ccgp_data_wrangling_spark.operators.matview import (
        rollup_fold,
        rollup_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    )
    cutoff = "2024-02-15 00:00:00"
    base = ev.where(F.col("ts") < cutoff)
    state = rollup_state(base, "event_type", "value").drop("has_retract")
    late = ev.where(F.col("ts") >= cutoff).select(
        "event_type", "value", F.lit(1).alias("w")
    )
    retract = ev.where(
        (F.col("ts") < cutoff)
        & (F.col("event_type") == "error")
        & (F.col("value") > 90)
    ).select("event_type", "value", F.lit(-1).alias("w"))
    dstate = rollup_state(
        late.unionByName(retract), "event_type", "value", weight_col="w"
    )
    return rollup_fold(state, dstate)


# ---------------------------------------------------------------------------
# Interval coverage merge (BED-merge primitive): per user, events
# open [epoch_min, epoch_min + ceil(value)) activity intervals;
# merge overlaps, report island count + covered minutes. Oracle
# replays the running-max island construction with a window.
# ---------------------------------------------------------------------------

_COVER_SQL = """
WITH iv AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(ts) / 60) AS BIGINT) AS s,
         CAST(FLOOR(EPOCH(ts) / 60) AS BIGINT)
           + CAST(CEIL(value / 10.0) AS BIGINT) AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islanded AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
per_island AS (
  SELECT user_id, island, MIN(s) AS is_, MAX(e) AS ie
  FROM islanded GROUP BY 1, 2
)
SELECT p.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_merged,
       CAST(SUM(ie - is_) AS BIGINT) AS covered,
       ANY_VALUE(n.n) AS n_intervals
FROM per_island p
JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM iv GROUP BY 1) n
  ON n.user_id = p.user_id
GROUP BY 1
"""


@register("interval_coverage_users", _COVER_SQL)
def interval_coverage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged activity coverage
    (operators/rangejoin.interval_coverage).

    The BED-merge primitive the reference's sequencing domain
    ultimately needs (read-coverage islands); one running-max window
    per key, no self-join, no position explode.
    """
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_coverage,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_timestamp("ts") / 60).cast("long").alias("s"),
        (
            (F.unix_timestamp("ts") / 60).cast("long")
            + F.ceil(F.col("value") / 10.0).cast("long")
        ).alias("e"),
    )
    return interval_coverage(ev, "user_id", "s", "e")


# ---------------------------------------------------------------------------
# Interval INTERSECTION join (BED-intersect): click activity windows ×
# error windows per user — every overlapping pair with its overlap
# length. Grid-bucketed with the emit-once rule (pair kept only in the
# cell of max(starts)), so the oracle's plain overlap join must match
# row-for-row with no dedup on either side.
# ---------------------------------------------------------------------------

_ISECT_SQL = """
WITH iv AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(EPOCH(ts) / 60) AS BIGINT) AS s,
         CAST(FLOOR(EPOCH(ts) / 60) AS BIGINT)
           + CAST(CEIL(value * 3) AS BIGINT) AS e
  FROM events
)
SELECT a.user_id,
       a.event_id AS click_id,
       b.event_id AS error_id,
       CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_len
FROM iv a JOIN iv b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'error'
 AND a.s < b.e AND b.s < a.e
 AND a.s < a.e AND b.s < b.e
"""


@register("interval_intersect_click_error", _ISECT_SQL)
def interval_intersect_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (click, error) activity-window pairs per user
    (operators/rangejoin.interval_intersect_join).

    The interval-vs-interval shape interval_coverage (BED merge)
    doesn't cover: bedtools-intersect semantics, half-open intervals.
    Both sides explode to 256-minute grid cells and equi-join on
    (user_id, cell); the emit-once rule replaces the dedup shuffle.
    The oracle is the naive overlap join — any double-emit or missed
    boundary pair breaks the row-level hash.
    """
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_timestamp("ts") / 60).cast("long").alias("s"),
        (
            (F.unix_timestamp("ts") / 60).cast("long")
            + F.ceil(F.col("value") * 3).cast("long")
        ).alias("e"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("s").alias("cs"),
        F.col("e").alias("ce"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("s").alias("es"),
        F.col("e").alias("ee"),
    )
    pairs = interval_intersect_join(
        clicks, errors, "cs", "ce", "es", "ee",
        on=["user_id"], bucket_width=256.0,
    )
    return pairs.select(
        "user_id", "click_id", "error_id",
        F.col("overlap_len").cast("long").alias("overlap_len"),
    )


# ---------------------------------------------------------------------------
# Click-path trigrams: most common 3-step event-type sequences.
# Per-user window (millions of tiny partitions) + hash rollup.
# ---------------------------------------------------------------------------

_PATH_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS nxt1,
         LEAD(event_type, 2) OVER w AS nxt2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ordered
WHERE nxt2 IS NOT NULL
GROUP BY 1
HAVING COUNT(*) >= 50
"""


@register("event_path_trigrams", _PATH_SQL)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step user journeys (sequence mining, n=3).

    lead() windows partition per user — no global sort; the trigram
    rollup is one map-side-combining aggregate. The (ts, event_id)
    ordering key makes simultaneous events deterministic.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).where(F.col("nxt2").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 50)
    )


# ---------------------------------------------------------------------------
# Skew profile: distribution diagnostics a planner (or an engineer
# choosing a salt factor) needs before a big join/agg on a key.
# ---------------------------------------------------------------------------

_SKEWPROF_SQL = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
               MAX(c) AS cmax FROM counts)
SELECT n AS n_rows, k AS n_keys, cmax AS max_key_rows,
       ROUND(CAST(cmax AS DOUBLE) * k / n, 4) AS skew_factor,
       ROUND(CAST(n AS DOUBLE) / k, 4) AS mean_key_rows,
       CAST((SELECT COUNT(*) FROM counts, tot
             WHERE c > 2.0 * n / k) AS BIGINT) AS n_hot_keys
FROM tot
"""


@register("skew_profile_events", _SKEWPROF_SQL)
def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostics for events.user_id: max/mean key
    size, skew factor (max/mean ratio), hot-key count (> 2× mean).

    One hash aggregate + one tiny rollup — the measurement that
    decides whether a downstream join needs salting (operators/skew)
    BEFORE it runs. Everything rides scalar subqueries; no window,
    no sort.
    """
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
    )
    n = tot.select("n_rows").scalar()
    k = tot.select("n_keys").scalar()
    hot = counts.where(F.col("c") > 2.0 * n / k).agg(
        F.count(F.lit(1)).cast("long")
    ).scalar()
    return tot.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(F.col("max_key_rows").cast("double") * k / n, 4).alias(
            "skew_factor"
        ),
        F.round(F.col("n_rows").cast("double") / k, 4).alias("mean_key_rows"),
        F.lit(hot).cast("long").alias("n_hot_keys"),
    )


# ---------------------------------------------------------------------------
# Calendar-gap detection: days with ZERO events per type, via a
# generated date scaffold anti-joined against observed days. The
# scaffold is sequence()+explode — no driver-side date loop.
# ---------------------------------------------------------------------------

_GAPS_SQL = """
WITH hi AS (SELECT event_type, ts FROM events WHERE value > 300),
bounds AS (
  SELECT event_type,
         CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
  FROM hi GROUP BY 1
),
scaffold AS (
  SELECT event_type, CAST(UNNEST(RANGE(d0, d1 + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
observed AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d FROM hi
)
SELECT s.event_type, s.d AS missing_day
FROM scaffold s
LEFT JOIN observed o ON o.event_type = s.event_type AND o.d = s.d
WHERE o.d IS NULL
"""


@register("calendar_gap_days", _GAPS_SQL)
def calendar_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days with zero HIGH-VALUE (value > 300) events per type inside
    each type's active range — the SLA-gap probe.

    The scaffold (all days per type) is sequence()+explode off a
    per-type MIN/MAX aggregate — rows ∝ types × days, never a driver
    loop; the gap test is one anti-join on (type, day).
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value") > 300
    ).select("event_type", F.col("ts").cast("date").alias("d"))
    bounds = ev.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    scaffold = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    observed = ev.dropDuplicates()
    return (
        scaffold.join(observed, ["event_type", "d"], "left_anti")
        .select("event_type", F.col("d").alias("missing_day"))
    )


# ---------------------------------------------------------------------------
# Sliding-rate per user: events in the trailing hour at each event —
# a RANGE (time-interval) window frame, the frame family the
# ROWS-based moving average cannot express.
# ---------------------------------------------------------------------------

_RATE_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY EPOCH(ts)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_1h
FROM events
WHERE user_id % 25 = 0
"""


@register("sliding_rate_per_user", _RATE_SQL)
def sliding_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour event count at every event (burst/rate probe).

    RANGE frame over epoch seconds, partitioned per user — state is
    the frame, partitions are user-sized; the streaming dual is a
    watermarked sliding window.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
    )


# ---------------------------------------------------------------------------
# First/last-touch attribution: each purchase credits 50% of its
# value to the user's FIRST and LAST non-purchase touch inside the
# trailing 24 h. Two argmin/argmax aggregates per purchase over a
# bounded interval join — no window over the fact table.
# ---------------------------------------------------------------------------

_ATTR_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts, event_type FROM events WHERE event_type != 'purchase'
),
joined AS (
  SELECT p.event_id, p.value, t.event_type, t.ts
  FROM purchases p
  JOIN touches t
    ON t.user_id = p.user_id
   AND t.ts <= p.ts
   AND t.ts >= p.ts - INTERVAL 24 HOURS
),
per_purchase AS (
  SELECT event_id, ANY_VALUE(value) AS value,
         ARG_MIN(event_type, LPAD(CAST(CAST(EPOCH(ts) AS BIGINT) AS VARCHAR), 12, '0') || event_type) AS first_touch,
         ARG_MAX(event_type, LPAD(CAST(CAST(EPOCH(ts) AS BIGINT) AS VARCHAR), 12, '0') || event_type) AS last_touch
  FROM joined GROUP BY 1
),
credits AS (
  -- credits in exact integer milli-units (value has 2 dp → value*100
  -- is integral; ×5 = half the value in thousandths): the channel
  -- SUM is then order-independent, unlike a double Σ(0.5·value)
  -- whose partition order can flip a half-cent rounding boundary
  SELECT first_touch AS channel,
         CAST(ROUND(value * 100, 0) AS BIGINT) * 5 AS credit_m
  FROM per_purchase
  UNION ALL
  SELECT last_touch, CAST(ROUND(value * 100, 0) AS BIGINT) * 5
  FROM per_purchase
)
SELECT channel, CAST(SUM(credit_m) AS BIGINT) AS credited_milli,
       CAST(COUNT(*) AS BIGINT) AS n_credits
FROM credits GROUP BY 1
"""


@register("attribution_first_last", _ATTR_SQL)
def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50/50 first/last-touch attribution of purchase value to the
    preceding 24 h of non-purchase touches.

    The touch join is an equi-key (user) + bounded-interval condition
    — the same shape as the as-of/interval family, state bounded by
    the window; first/last picks are min_by/max_by aggregates (the
    pick key is zero-padded-epoch + channel — a total order, so
    same-second ties resolve identically in both engines).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), "value"
    )
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("ch")
    )
    joined = purchases.join(
        touches,
        (purchases.user_id == touches.user_id)
        & (touches.t_ts <= purchases.p_ts)
        & (touches.t_ts >= purchases.p_ts - F.expr("INTERVAL 24 HOURS")),
    )
    # total order for the first/last pick: zero-padded epoch + channel
    # (ties at the same second resolve identically in both engines)
    _touch_key = F.concat(
        F.lpad(F.unix_timestamp("t_ts").cast("string"), 12, "0"), F.col("ch")
    )
    per_purchase = joined.groupBy("event_id").agg(
        F.any_value("value").alias("value"),
        F.min_by("ch", _touch_key).alias("first_touch"),
        F.max_by("ch", _touch_key).alias("last_touch"),
    )
    # exact integer milli-credits (see oracle comment): Σ is
    # order-independent, the single division happens after the sum
    credit_m = (F.round(F.col("value") * 100, 0).cast("long") * 5).alias(
        "credit_m"
    )
    credits = per_purchase.select(
        F.col("first_touch").alias("channel"), credit_m
    ).unionByName(
        per_purchase.select(F.col("last_touch").alias("channel"), credit_m)
    )
    # output stays in exact integer milli-units: a /1000.0 display
    # division can land exactly on a .005 boundary where Spark's
    # BigDecimal-of-shortest-string HALF_UP and DuckDB's binary
    # rounding disagree — integers have no such boundary
    return credits.groupBy("channel").agg(
        F.sum("credit_m").cast("long").alias("credited_milli"),
        F.count(F.lit(1)).alias("n_credits"),
    )


# ---------------------------------------------------------------------------
# Trajectory similarity (PAPERS.md: REPOSE, ICDE 2021 family):
# grid-pruned exact-Hausdorff pairs over per-user trajectories.
# Coordinates are synthesized deterministically with per-user home
# regions — x = (uid%12)*8 + eid%7, y = (uid%9)*8 + eid%5 — so each
# trajectory occupies exactly one grid cell at cell_size=8 and only
# same/adjacent-home users become candidates (the pruning is real,
# not vacuous). All arithmetic is exact small integers in doubles;
# the borderline adjacent-home pairs land on hausdorff_sq == 64
# exactly, deterministic on both engines.
# ---------------------------------------------------------------------------

_TRAJ_SQL = """
WITH pts AS (
  SELECT user_id AS k,
         CAST((user_id % 12) * 8 + (event_id % 7) AS DOUBLE) AS x,
         CAST((user_id % 9) * 8 + (event_id % 5) AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
kept AS (SELECT k, x, y FROM pts WHERE rn <= 30),
cells AS (
  SELECT DISTINCT k, CAST(FLOOR(x / 8) AS BIGINT) AS cx, CAST(FLOOR(y / 8) AS BIGINT) AS cy
  FROM kept
),
lcells AS (
  SELECT DISTINCT k AS ka, cx + dx AS cx, cy + dy AS cy
  FROM cells, UNNEST(range(-1, 2)) AS ox(dx), UNNEST(range(-1, 2)) AS oy(dy)
),
cand AS (
  SELECT DISTINCT l.ka, c.k AS kb
  FROM lcells l JOIN cells c ON l.cx = c.cx AND l.cy = c.cy
  WHERE l.ka < c.k
),
pp AS (
  SELECT cand.ka, cand.kb, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM cand
  JOIN kept a ON a.k = cand.ka
  JOIN kept b ON b.k = cand.kb
),
dir_a AS (
  SELECT ka, kb, MAX(m) AS h_ab FROM (
    SELECT ka, kb, ax, ay, MIN(d2) AS m FROM pp GROUP BY 1, 2, 3, 4
  ) GROUP BY 1, 2
),
dir_b AS (
  SELECT ka, kb, MAX(m) AS h_ba FROM (
    SELECT ka, kb, bx, by, MIN(d2) AS m FROM pp GROUP BY 1, 2, 3, 4
  ) GROUP BY 1, 2
)
SELECT dir_a.ka AS key_a, dir_a.kb AS key_b,
       ROUND(GREATEST(h_ab, h_ba), 4) AS hausdorff_sq
FROM dir_a JOIN dir_b ON dir_a.ka = dir_b.ka AND dir_a.kb = dir_b.kb
WHERE ROUND(GREATEST(h_ab, h_ba), 4) <= 64.0
"""


@register("trajectory_hausdorff_pairs", _TRAJ_SQL)
def trajectory_hausdorff_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-trajectory pairs within Hausdorff distance 8 of each other
    (operators/trajectory.trajectory_hausdorff_pairs): 30-vertex
    simplification, 3×3 grid-cell candidates (complete at threshold ≤
    cell_size — proof in the operator docstring), exact squared
    verify. The pair space never materializes; verify cost is bounded
    by cell co-occupancy × max_points²."""
    from ccgp_data_wrangling_spark.operators.trajectory import (
        trajectory_hausdorff_pairs,
    )

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("user_id").alias("uid"),
        ((F.col("user_id") % 12) * 8 + F.col("event_id") % 7)
        .cast("double").alias("x"),
        ((F.col("user_id") % 9) * 8 + F.col("event_id") % 5)
        .cast("double").alias("y"),
        F.col("event_id"),
    )
    return trajectory_hausdorff_pairs(
        pts, "uid", "x", "y", "event_id",
        cell_size=8.0, threshold=8.0, max_points=30,
    )
