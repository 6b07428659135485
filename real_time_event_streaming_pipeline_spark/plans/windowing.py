"""Windowing beyond the reference's tumbling-only surface
(SURVEY.md §2.4 notes sliding and session windows are ABSENT in the
reference — engine obligations, not parity). Three additions:

- sliding (hopping) window aggregation — ``F.window(ts, W, S)``;
  the oracle expands each event into its W/S overlapping buckets.
- native gap-based sessions — ``F.session_window`` (the built-in
  operator; the manual lag+cumsum form is rel_user_sessions). Session
  boundaries are compared in integer microseconds on both engines so
  the merge condition (gap >= 30 min) can never float-flip.
- map-typed columns — map construction/extraction stays in codegen.

Scale: sliding windows multiply agg input by W/S (here 3×) — that
fan-out happens inside the hash-agg's map side, not as a stored
explode; session_window keeps per-key state bounded by the gap, and
the shuffle key (user_id) is high-cardinality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import MICRO_FMT_SPARK, WINDOW_FMT_SPARK
from .relational import _exact_sum, _exact_sum_sql


def q_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute window sliding every 5 minutes over events: each row
    lands in exactly 3 windows. One hash-agg; the window expansion is
    a Generate inside the same stage, no extra shuffle."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            _exact_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", WINDOW_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_AGG_SQL = f"""
WITH b AS (
  SELECT event_type, value,
    make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) - t.i) * 300 * 1000000) AS ws
  FROM events, generate_series(0, 2) AS t(i)
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
  count(*) AS n_events,
  {_exact_sum_sql("value", 2)} AS total_value
FROM b
GROUP BY 1, 2
"""


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via the built-in session_window operator
    (30-minute inactivity gap) — the Spark-native form of
    rel_user_sessions' manual lag+cumsum. Emits per-session bounds;
    session_end = last event + gap by definition."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _exact_sum(F.col("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", MICRO_FMT_SPARK).alias("session_start"),
            F.date_format("w.end", MICRO_FMT_SPARK).alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# Session merge in integer µs: a new session starts iff the gap from
# the previous event is >= 30 min (windows [t, t+30m) overlap-merge
# strictly below it). epoch_us keeps the comparison exact.
_SESSION_WINDOW_NATIVE_SQL = f"""
WITH gaps AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(make_timestamp(epoch_us(max(ts)) + 1800000000), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  count(*) AS n_events,
  {_exact_sum_sql("value", 2)} AS session_value
FROM sess
GROUP BY user_id, session_id
"""


def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map per row, extract by key,
    enumerate keys/values. All codegen expressions; the map never
    leaves the projection (output is plain columns so the oracle can
    hash it)."""
    ev = load(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        # try_element_at: ANSI mode makes plain element_at THROW on a
        # missing map key; the try_ variant gives the NULL the oracle
        # (and any sane user) expects.
        F.try_element_at(m, F.lit("absent")).alias("m_missing"),
        F.size(m).cast("long").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.array_join(F.map_values(m), ",").alias("m_vals"),
    )


_FN_MAP_SQL = """
WITH m AS (
  SELECT event_id,
    map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS mp
  FROM events
)
SELECT event_id,
  map_extract(mp, 'type')[1] AS m_type,
  map_extract(mp, 'uid')[1] AS m_uid,
  CAST(NULL AS VARCHAR) AS m_missing,
  CAST(cardinality(mp) AS BIGINT) AS m_size,
  array_to_string(map_keys(mp), ',') AS m_keys,
  array_to_string(map_values(mp), ',') AS m_vals
FROM m
"""


def q_fn_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function family the other plans don't touch:
    ntile / percent_rank / cume_dist / first_value / last_value /
    nth_value / lead. Total order inside each partition (ts, event_id)
    so every value is deterministic; rank ratios are int/int
    divisions, bitwise-stable cross-engine."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("event_type").over(wall).alias("first_type"),
        F.last("event_type").over(wall).alias("last_type"),
        F.nth_value("event_type", 2).over(wall).alias("second_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


_FN_WINDOW_ANALYTIC_SQL = """
SELECT event_id, user_id,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  first_value(event_type) OVER wall AS first_type,
  last_value(event_type) OVER wall AS last_type,
  nth_value(event_type, 2) OVER wall AS second_type,
  lead(event_type, 1) OVER w AS next_type
FROM events
WINDOW
  w AS (PARTITION BY user_id ORDER BY ts, event_id),
  wall AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_rel_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames: a 3-row moving aggregate (ROWS frame)
    and a trailing-15-minute sum (RANGE frame over epoch seconds).
    Frame sums accumulate integer cents so the sliding-aggregate
    implementation order can't produce float drift."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    v_e2 = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ev = ev.withColumn("v_e2", v_e2).withColumn(
        "ev_s", F.floor(F.unix_timestamp("ts")).cast("long")
    )
    wrows = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    )
    wrange = Window.partitionBy("user_id").orderBy("ev_s").rangeBetween(-900, 0)
    return ev.select(
        "event_id",
        "user_id",
        (F.sum("v_e2").over(wrows) / F.lit(100.0)).alias("moving_sum3"),
        (
            F.sum("v_e2").over(wrows) / (F.count("*").over(wrows) * F.lit(100.0))
        ).alias("moving_avg3"),
        (F.sum("v_e2").over(wrange) / F.lit(100.0)).alias("trailing_15m"),
    )


_REL_WINDOW_FRAMES_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2,
    CAST(floor(epoch(ts)) AS BIGINT) AS ev_s
  FROM events
)
SELECT event_id, user_id,
  sum(v_e2) OVER wrows / 100.0 AS moving_sum3,
  sum(v_e2) OVER wrows / (count(*) OVER wrows * 100.0) AS moving_avg3,
  sum(v_e2) OVER wrange / 100.0 AS trailing_15m
FROM e
WINDOW
  wrows AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wrange AS (PARTITION BY user_id ORDER BY ev_s
             RANGE BETWEEN 900 PRECEDING AND CURRENT ROW)
"""


def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (and/or/xor/not, shifts, popcount) —
    long-typed on both engines.

    Retired from the registry in r7 (capacity consolidation): the
    same seven bitwise surfaces now ride the fn_math battery over the
    lineitem BIGINT keys (plans/scalar.py), so this row duplicated a
    registered, oracle-checked face. The events-side expressions stay
    pinned by tests/test_relational_extra.py against the DuckDB twin
    kept below."""
    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        uid.bitwiseAND(F.lit(255)).alias("b_and"),
        uid.bitwiseOR(F.lit(4096)).alias("b_or"),
        uid.bitwiseXOR(eid).alias("b_xor"),
        F.bitwise_not(uid).alias("b_not"),
        F.shiftleft(uid, 3).alias("shl3"),
        F.shiftright(eid, 2).alias("shr2"),
        F.bit_count(uid).cast("long").alias("popcount"),
    )


_FN_BITWISE_SQL = """
SELECT event_id,
  user_id & 255 AS b_and,
  user_id | 4096 AS b_or,
  xor(user_id, event_id) AS b_xor,
  ~user_id AS b_not,
  user_id << 3 AS shl3,
  event_id >> 2 AS shr2,
  CAST(bit_count(user_id) AS BIGINT) AS popcount
FROM events
"""


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value — a sequential recurrence no
    built-in window/agg can express (output depends on previous
    OUTPUT), hence the one applyInPandas batch operator in the
    engine (operators/timeseries.py). Bitwise oracle-checked since
    r6: pandas ewm(adjust=False) is the pure double fold
    y = 0.8·y + 0.2·x (pinned against the hand-rolled reference in
    tests/test_operators.py), which the SQL twin replays with a
    list_reduce over each ordered prefix — identical IEEE ops in
    identical order, so the 6-decimal rounds agree."""
    from ..operators.timeseries import ewma_by_key

    return ewma_by_key(load(spark, sf_dir, "events"), alpha=0.2)


# The oracle's prefix fold is O(rows²/users) — fine at oracle SF; the
# Spark face is the O(n) single-pass recurrence (the production path).
_REL_EWMA_SQL = """
WITH lists AS (
  SELECT user_id,
    list(value ORDER BY ts, event_id) AS vs,
    list(event_id ORDER BY ts, event_id) AS ids
  FROM events GROUP BY user_id
)
SELECT user_id,
  unnest(ids) AS event_id,
  unnest(vs) AS value,
  unnest(list_transform(generate_series(1, len(vs)),
    i -> round(list_reduce(vs[1:i],
      (acc, x) -> (1.0::DOUBLE - 0.2::DOUBLE) * acc + 0.2::DOUBLE * x), 6))) AS ewma
FROM lists
"""


def q_recursive_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via native `WITH RECURSIVE` (Spark 4 SQL
    surface): session roots anchor the recursion, each level attaches
    the next event of every open chain through its lag-predecessor
    edge (event_id-keyed, so equal timestamps cannot cross wires).
    Produces the same sessions as the window-based rel_user_sessions;
    bounds are exact integer microseconds (see the session-window
    oracle note). The declarative window/cumsum form IS the production
    path — recursion re-joins the lag table once per chain depth — but
    per-level work is one equi-join, so the plan is sane for the
    shallow-chain shape (max depth 4 on this corpus), and the query
    pins the recursive-CTE surface cross-engine."""
    load(spark, sf_dir, "events").createOrReplaceTempView("_rs_events")
    # r13 opt: the recursive step references the lag table once per
    # chain-depth level, and a CTE subplan is re-evaluated per
    # reference — the scan + user-window sort ran at every level
    # (depth 4 on this corpus = 4 redundant window passes). The lag
    # table is level-invariant, so materialize it ONCE behind a lazy
    # localCheckpoint (first level's job computes it; later levels
    # read the persisted partitions) and keep WITH RECURSIVE for the
    # chain itself — the surface this face pins. Same rows, same
    # recursion, bitwise-identical output. Each call persists a fresh
    # checkpoint copy; it is reclaimed by the ContextCleaner once the
    # returned DataFrame is garbage-collected (no explicit unpersist:
    # a caller may still hold the previous result, and unpersisting a
    # LOCAL checkpoint under a live reader is unrecoverable — the
    # truncated lineage cannot recompute). The temp view is dropped
    # below once the outer query is analyzed (r14, r13 ADVICE:
    # createOrReplaceTempView would otherwise hold the LAST call's
    # checkpointed plan in the session catalog for the session
    # lifetime — spark.sql resolves the view eagerly at analysis, so
    # the returned plan keeps its own reference and the drop is safe).
    lagged = spark.sql(
        """
        SELECT user_id, event_id, ts,
          lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
          unix_micros(ts) - unix_micros(
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM _rs_events
        """
    ).localCheckpoint(eager=False)
    lagged.createOrReplaceTempView("_rs_lagged")
    out = spark.sql(
        """
        WITH RECURSIVE lagged AS (
          SELECT * FROM _rs_lagged
        ),
        chain (user_id, event_id, ts, session_start_us) AS (
          SELECT user_id, event_id, ts, unix_micros(ts)
          FROM lagged WHERE prev_id IS NULL OR gap_us >= 1800000000
          UNION ALL
          SELECT l.user_id, l.event_id, l.ts, c.session_start_us
          FROM chain c JOIN lagged l
            ON l.user_id = c.user_id AND l.prev_id = c.event_id
           AND l.gap_us < 1800000000
        )
        SELECT user_id, session_start_us,
          max(unix_micros(ts)) AS session_end_us,
          count(*) AS n_events
        FROM chain GROUP BY user_id, session_start_us
        """
    )
    spark.catalog.dropTempView("_rs_lagged")
    return out


_RECURSIVE_SESSIONS_SQL = """
WITH RECURSIVE lagged AS (
  SELECT user_id, event_id, ts,
    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
    epoch_us(ts) - epoch_us(
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
chain (user_id, event_id, ts, session_start_us) AS (
  SELECT user_id, event_id, ts, epoch_us(ts)
  FROM lagged WHERE prev_id IS NULL OR gap_us >= 1800000000
  UNION ALL
  SELECT l.user_id, l.event_id, l.ts, c.session_start_us
  FROM chain c JOIN lagged l
    ON l.user_id = c.user_id AND l.prev_id = c.event_id
   AND l.gap_us < 1800000000
)
SELECT user_id, session_start_us,
  max(epoch_us(ts)) AS session_end_us,
  count(*) AS n_events
FROM chain GROUP BY user_id, session_start_us
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition mining over per-user event sequences: order
    each user's events by (ts, event_id), pair each with its
    successor via lead(), count (from, to) transitions globally, and
    rank each from-type's successors — the funnel/next-action
    analysis every event pipeline grows.

    One window pass (partitioned by user — the same shuffle key the
    sessionization family uses) into one small groupBy (|types|² keys
    at most); ranks are integers with a deterministic (n desc, to_type
    asc) tiebreak."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type", F.lead("event_type", 1).over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = t.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    w2 = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("next_type"))
    return counts.withColumn("rk", F.row_number().over(w2).cast("long"))


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type,
    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
),
counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
  CAST(row_number() OVER (PARTITION BY event_type ORDER BY n DESC, next_type ASC)
       AS BIGINT) AS rk
FROM counts
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click → purchase, each stage strictly
    after the previous one for the same user (first-touch semantics:
    stage k anchors on the EARLIEST qualifying event after stage k−1).
    Output is the one-row conversion table.

    Shape: three per-user min-aggregations chained by user_id joins —
    every join key is the one the aggregations already partitioned by,
    so at scale AQE reuses co-partitioning; no windows, no ordering of
    the full stream. All outputs are counts (integers)."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    total = ev.agg(F.count_distinct("user_id").alias("users_total"))
    return (
        total.join(F.broadcast(v.agg(F.count(F.lit(1)).alias("stage_view"))))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("stage_click"))))
        .join(F.broadcast(p.agg(F.count(F.lit(1)).alias("stage_purchase"))))
    )


_FUNNEL_CONVERSION_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT
  (SELECT count(DISTINCT user_id) FROM events) AS users_total,
  (SELECT count(*) FROM v) AS stage_view,
  (SELECT count(*) FROM c) AS stage_click,
  (SELECT count(*) FROM p) AS stage_purchase
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) anomaly detection per event type: exact
    p25/p75 (the percentile parity fn_percentiles already pins
    cross-engine), fences at 1.5·IQR, outliers counted per type.

    Two aggregations over one scan: the quantile pass produces a
    |types|-row fence table that broadcasts back onto the scan-side
    comparison — the same tiny-dimension broadcast shape as
    llm_source_mixture. Since both engines compute bitwise-identical
    fences, the boundary comparisons can never disagree."""
    ev = load(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.75)").alias("p75"),
    )
    fenced = ev.join(F.broadcast(fences), "event_type")
    iqr = F.col("p75") - F.col("p25")
    is_out = (F.col("value") < F.col("p25") - 1.5 * iqr) | (
        F.col("value") > F.col("p75") + 1.5 * iqr
    )
    return fenced.groupBy("event_type", "p25", "p75").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(is_out).alias("n_outliers"),
    )


_VALUE_OUTLIERS_SQL = """
WITH fences AS (
  SELECT event_type,
    CAST(quantile_cont(value, 0.25) AS DOUBLE) AS p25,
    CAST(quantile_cont(value, 0.75) AS DOUBLE) AS p75
  FROM events GROUP BY event_type
)
SELECT event_type, p25, p75,
  count(*) AS n_total,
  count(*) FILTER (
    WHERE value < p25 - 1.5 * (p75 - p25) OR value > p75 + 1.5 * (p75 - p25)
  ) AS n_outliers
FROM events JOIN fences USING (event_type)
GROUP BY event_type, p25, p75
"""


def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern matching (the MATCH_RECOGNIZE class;
    HYPERSONIC, SIGMOD 2022 is the scale-out treatment): `view
    FOLLOWED BY purchase WITHIN 30 min, NO error BETWEEN`, first-match
    semantics per view. Spark has no MATCH_RECOGNIZE; the pattern
    compiles to relational primitives that DO scale:

    - the "no C between" negation becomes an equality on the running
      error count (one user-partitioned window pass — prefix sums
      turn sequence negation into an equi-predicate);
    - the "followed by within T" becomes a per-user join with a time
      horizon; per-user candidates are bounded by event rate × T
      (the cs_alert_followups analysis — bucket the equi key by T if
      a key gets hot);
    - first-match is a WindowGroupLimit rank, pruned pre-shuffle.

    The gap is integer microseconds end to end."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.count_if(F.col("event_type") == "error").over(wcum).alias("err_cum"),
        F.unix_micros("ts").alias("ts_us"),
    )
    v = seq.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.col("ts_us").alias("v_us"),
        F.col("err_cum").alias("v_err"),
    )
    p = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts_us").alias("p_us"),
        F.col("err_cum").alias("p_err"),
    )
    cand = v.join(p, "user_id").filter(
        (F.col("p_us") > F.col("v_us"))
        & (F.col("p_us") - F.col("v_us") <= 1_800_000_000)
        & (F.col("p_err") == F.col("v_err"))
    )
    first = Window.partitionBy("v_id").orderBy("p_us", "p_id")
    return (
        cand.withColumn("rk", F.row_number().over(first))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "v_id",
            "p_id",
            (F.col("p_us") - F.col("v_us")).alias("gap_us"),
        )
    )


_CEP_PATTERN_SQL = """
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
    count(*) FILTER (WHERE event_type = 'error')
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_cum
  FROM events
),
v AS (
  SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_us, err_cum AS v_err
  FROM seq WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us, err_cum AS p_err
  FROM seq WHERE event_type = 'purchase'
),
matched AS (
  SELECT v.user_id, v.v_id, p.p_id, p.p_us - v.v_us AS gap_us,
    row_number() OVER (PARTITION BY v.v_id ORDER BY p.p_us, p.p_id) AS rk
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.p_us > v.v_us
   AND p.p_us - v.v_us <= 1800000000
   AND p.p_err = v.v_err
)
SELECT user_id, v_id, p_id, CAST(gap_us AS BIGINT) AS gap_us
FROM matched WHERE rk = 1
"""


def q_ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the EDBT 2019 streaming-TS
    class): resample each user's value series to hourly integer-cent
    sums, then find the top-3 most Pearson-correlated users for each
    query user (user_id < 5), over ≥3 shared hours.

    Determinism: every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    BIGINT from cent-integers, so both engines feed IDENTICAL integers
    into the one double expression; division and sqrt are
    IEEE-correctly-rounded, so r matches bitwise and ranks can't flip.

    Scale: resample is one (user, hour) agg; the query side is tiny by
    construction (broadcast), so candidate scoring is a linear scan of
    the series table joined on hour — never user × user. Top-3 is a
    WindowGroupLimit."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    series = (
        ev.withColumn("h", F.date_trunc("hour", "ts"))
        .withColumn("cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .groupBy("user_id", "h")
        .agg(F.sum("cents").alias("v"))
    )
    q = series.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("qu"), "h", F.col("v").alias("x")
    )
    c = series.select(F.col("user_id").alias("other"), "h", F.col("v").alias("y"))
    moments = (
        F.broadcast(q)
        .join(c, "h")
        .filter(F.col("qu") != F.col("other"))
        .groupBy("qu", "other")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        .filter(F.col("n") >= 3)
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    scored = moments.filter(den > 0).select(
        "qu", "other", "n", F.round(num / den, 6).alias("r")
    )
    w = Window.partitionBy("qu").orderBy(F.desc("r"), F.asc("other"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


_TS_SIMILARITY_SQL = """
WITH series AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY user_id, date_trunc('hour', ts)
),
moments AS (
  SELECT q.user_id AS qu, c.user_id AS other,
    count(*) AS n,
    CAST(sum(q.v) AS BIGINT) AS sx, CAST(sum(c.v) AS BIGINT) AS sy,
    CAST(sum(q.v * c.v) AS BIGINT) AS sxy,
    CAST(sum(q.v * q.v) AS BIGINT) AS sxx,
    CAST(sum(c.v * c.v) AS BIGINT) AS syy
  FROM series q JOIN series c ON q.h = c.h AND q.user_id != c.user_id
  WHERE q.user_id < 5
  GROUP BY q.user_id, c.user_id
  HAVING count(*) >= 3
),
scored AS (
  SELECT qu, other, n,
    round(CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
  FROM moments
  WHERE sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             * CAST(n * syy - sy * sy AS DOUBLE)) > 0
)
SELECT qu, other, n, r,
  CAST(row_number() OVER (PARTITION BY qu ORDER BY r DESC, other ASC) AS BIGINT)
    AS rk
FROM scored
QUALIFY rk <= 3
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the product-analytics staple: users grouped
    by first-active day, counted at each day offset they return.
    Output is the (cohort_day, offset_days, n_users) retention
    triangle.

    Shape: one distinct over (user, day) — the only event-volume
    shuffle; the first-day aggregate and the join back both reuse the
    user partitioning (AQE co-partitions), and the final aggregate
    has cohort×offset keys (≤ span² rows). Everything is dates and
    integers."""
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort", F.datediff("day", "cohort").cast("long").alias("offset_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_users",
        )
    )


_RETENTION_COHORTS_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
firsts AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
  CAST(date_diff('day', cohort, day) AS BIGINT) AS offset_days,
  count(*) AS n_users
FROM act JOIN firsts USING (user_id)
GROUP BY cohort, date_diff('day', cohort, day)
"""


QUERIES = {
    "cs_sliding_agg": q_sliding_agg,
    "rel_recursive_sessions": q_recursive_sessions,
    "rel_ewma_user_value": q_ewma_user_value,
    "fn_window_analytic": q_fn_window_analytic,
    "rel_window_frames": q_rel_window_frames,
    "rel_session_window_native": q_session_window_native,
    "fn_map": q_fn_map,
    "rel_event_transitions": q_event_transitions,
    "rel_funnel_conversion": q_funnel_conversion,
    "rel_value_outliers": q_value_outliers,
    "rel_cep_pattern": q_cep_pattern,
    "rel_ts_similarity": q_ts_similarity,
    "rel_retention_cohorts": q_retention_cohorts,
}

ORACLE = {
    "cs_sliding_agg": _SLIDING_AGG_SQL,
    "rel_recursive_sessions": _RECURSIVE_SESSIONS_SQL,
    "fn_window_analytic": _FN_WINDOW_ANALYTIC_SQL,
    "rel_window_frames": _REL_WINDOW_FRAMES_SQL,
    "rel_ewma_user_value": _REL_EWMA_SQL,
    "rel_session_window_native": _SESSION_WINDOW_NATIVE_SQL,
    "fn_map": _FN_MAP_SQL,
    "rel_event_transitions": _EVENT_TRANSITIONS_SQL,
    "rel_funnel_conversion": _FUNNEL_CONVERSION_SQL,
    "rel_value_outliers": _VALUE_OUTLIERS_SQL,
    "rel_cep_pattern": _CEP_PATTERN_SQL,
    "rel_ts_similarity": _TS_SIMILARITY_SQL,
    "rel_retention_cohorts": _RETENTION_COHORTS_SQL,
}
