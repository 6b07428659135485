"""Scalar-function surface + remaining reference operators.

The reference itself uses only 11 scalar functions (SURVEY.md §2.2
note); the engine ships Spark's whole built-in library — these queries
pin the cross-engine semantics of the families the oracle can check
(math, string, datetime, conditional, percentiles, unpivot), plus the
two reference operators not yet covered: the Kafka producer frame
(S5, KafkaProducerService.java:51-55) and producer metrics (A7,
KafkaProducerService.java:124-145).

Cross-engine float discipline: sqrt is IEEE-exact (raw); ln/log10/pow
go through libm and may differ in the last ulp between JVM and C —
those are rounded to 6 decimals. Exact-integer math stays raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .citystream import CITY_EVENTS_CTE, city_events


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar battery. Since r7 this also carries the bitwise
    family (and/or/xor/not, shifts, popcount) over the BIGINT keys —
    the former fn_bitwise query folded in (registry consolidation: one
    scan, one battery, same per-row-projection shape)."""
    li = load(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey")
    pk = F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("tax_pct_floor"),
        (F.col("l_quantity") % 7).alias("qty_mod7"),
        ok.bitwiseAND(F.lit(255)).alias("b_and"),
        ok.bitwiseOR(F.lit(4096)).alias("b_or"),
        ok.bitwiseXOR(pk).alias("b_xor"),
        F.bitwise_not(ok).alias("b_not"),
        F.shiftleft(ok, 3).alias("shl3"),
        F.shiftright(pk, 2).alias("shr2"),
        F.bit_count(ok).cast("long").alias("popcount"),
    )


_FN_MATH_SQL = """
SELECT
  l_orderkey, l_linenumber,
  sqrt(l_quantity) AS sqrt_qty,
  round(ln(l_extendedprice), 6) AS ln_price,
  round(log10(l_extendedprice), 6) AS log10_price,
  round(power(l_discount, 2), 6) AS disc_sq,
  abs(l_quantity - 25) AS abs_dev,
  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
  l_quantity % 7 AS qty_mod7,
  l_orderkey & 255 AS b_and,
  l_orderkey | 4096 AS b_or,
  xor(l_orderkey, l_partkey) AS b_xor,
  ~l_orderkey AS b_not,
  l_orderkey << 3 AS shl3,
  l_partkey >> 2 AS shr2,
  CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
FROM lineitem
"""


def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


_FN_STRING_SQL = """
SELECT
  c_custkey,
  upper(c_name) AS name_upper,
  lower(c_mktsegment) AS seg_lower,
  substring(c_name, 1, 8) AS name_prefix,
  length(c_name) AS name_len,
  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
  c_mktsegment || '|' || c_name AS tagged,
  reverse(c_mktsegment) AS seg_rev,
  trim('  x  ') AS trimmed
FROM customer
"""


def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_sun0"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
    )


_FN_DATETIME_SQL = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS yr,
  CAST(month(o_orderdate) AS BIGINT) AS mo,
  CAST(day(o_orderdate) AS BIGINT) AS dom,
  CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow_sun0,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr
FROM orders
"""


def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional + ANSI-safe-arithmetic battery over orders. r8
    capacity consolidation (VERDICT r7 #2): absorbs the retired
    fn_try_arith row — the try_* family (the session runs ANSI mode,
    Spark 4 default, where plain division-by-zero or a bad cast THROWS;
    try_* gives the NULL a pipeline wants instead of a dead job) is
    the same single-scan expression-battery shape as the conditional
    surfaces, so two registry rows bought no extra semantics. The
    original events-side try_* face stays parity-pinned against its
    own DuckDB twin in tests/test_retired_faces.py."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p >= 300000, "large")
        .when(p >= 100000, "medium")
        .otherwise("small")
        .alias("tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_or_open"),
        F.greatest(p, F.lit(150000.0)).alias("floor_150k"),
        F.least(p, F.lit(150000.0)).alias("cap_150k"),
        F.isnull(F.nullif("o_orderpriority", F.lit("5-LOW"))).alias("is_low"),
        F.try_divide(p, (F.col("o_custkey") % 3).cast("double")).alias("safe_div"),
        F.concat(F.lit("x"), F.col("o_orderkey")).try_cast("long").alias("bad_cast"),
        F.col("o_orderkey").cast("string").try_cast("long").alias("good_cast"),
        F.try_to_timestamp(F.col("o_orderstatus")).alias("bad_ts"),
    )


_FN_CONDITIONAL_SQL = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice >= 300000 THEN 'large'
       WHEN o_totalprice >= 100000 THEN 'medium'
       ELSE 'small' END AS tier,
  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
  greatest(o_totalprice, 150000.0) AS floor_150k,
  least(o_totalprice, 150000.0) AS cap_150k,
  nullif(o_orderpriority, '5-LOW') IS NULL AS is_low,
  CASE WHEN o_custkey % 3 = 0 THEN NULL
       ELSE o_totalprice / CAST(o_custkey % 3 AS DOUBLE) END AS safe_div,
  TRY_CAST('x' || CAST(o_orderkey AS VARCHAR) AS BIGINT) AS bad_cast,
  TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS good_cast,
  TRY_CAST(o_orderstatus AS TIMESTAMP) AS bad_ts
FROM orders
"""


def q_fn_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles + dispersion per group (the
    approx_percentile twin is in rel_approx_distinct_users territory:
    sketch-based, rows-only)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("qty_p90"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.round(F.stddev("l_quantity"), 4).alias("qty_std"),
        F.round(F.variance("l_quantity"), 4).alias("qty_var"),
    )


_FN_PERCENTILES_SQL = """
SELECT
  l_returnflag,
  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS qty_p50,
  CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS qty_p90,
  min(l_quantity) AS qty_min,
  max(l_quantity) AS qty_max,
  round(stddev_samp(l_quantity), 4) AS qty_std,
  round(var_samp(l_quantity), 4) AS qty_var
FROM lineitem
GROUP BY l_returnflag
"""


def q_fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip: the wide event-type count matrix
    melted back to (user_bucket, event_type, n) long form."""
    from .relational import EVENT_TYPES, q_pivot_event_matrix

    wide = q_pivot_event_matrix(spark, sf_dir)
    return wide.unpivot(
        "user_bucket",
        [f"n_{t}" for t in EVENT_TYPES],
        "event_type",
        "n",
    ).withColumn("event_type", F.expr("substring(event_type, 3)"))


_FN_UNPIVOT_SQL = """
WITH wide AS (
  SELECT
    user_id % 5 AS user_bucket,
    count(*) FILTER (event_type = 'click') AS n_click,
    count(*) FILTER (event_type = 'error') AS n_error,
    count(*) FILTER (event_type = 'purchase') AS n_purchase,
    count(*) FILTER (event_type = 'signup') AS n_signup,
    count(*) FILTER (event_type = 'view') AS n_view
  FROM events GROUP BY user_id % 5
)
SELECT user_bucket, substring(name, 3) AS event_type, n
FROM (UNPIVOT wide ON n_click, n_error, n_purchase, n_signup, n_view INTO NAME name VALUE n)
"""


def q_kafka_producer_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the Kafka write frame — key = city (per-city partition
    ordering, KafkaProducerService.java:51-55), value = JSON of the
    event struct. This exact DataFrame feeds
    .writeStream.format('kafka') in production."""
    ce = city_events(spark, sf_dir)
    return ce.select(
        F.col("city").alias("key"),
        F.to_json(
            F.struct(
                F.col("city"),
                F.col("event_type"),
                F.col("severity"),
                F.col("ts_iso").alias("timestamp"),
                F.col("event_id"),
            )
        ).alias("value"),
    )


_KAFKA_FRAME_SQL = (
    CITY_EVENTS_CTE
    + """
SELECT
  city AS key,
  CAST(to_json(struct_pack(
    city := city,
    event_type := event_type,
    severity := severity,
    "timestamp" := ts_iso,
    event_id := event_id
  )) AS VARCHAR) AS value
FROM windowed
"""
)


def q_producer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: the producer's running metrics (count, min/max/avg latency
    proxy, events/sec over the span — KafkaProducerService.java:124-145)
    as one aggregation; the live-streaming twin uses df.observe() in
    streaming/metrics.py."""
    ce = city_events(spark, sf_dir)
    span = F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
    # exact-units average: double sums are not reproducible across
    # engines/partitionings (see relational._exact_sum)
    value_e2 = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return ce.agg(
        F.count("*").alias("events_total"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        (F.sum(value_e2) / F.lit(100.0) / F.count("*")).alias("value_avg"),
        span.cast("long").alias("span_seconds"),
        (F.count("*") / span.cast("double")).alias("events_per_sec"),
    )


_PRODUCER_METRICS_SQL = (
    CITY_EVENTS_CTE
    + """
SELECT
  count(*) AS events_total,
  min(value) AS value_min,
  max(value) AS value_max,
  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 / count(*) AS value_avg,
  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_seconds,
  count(*) / CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS DOUBLE) AS events_per_sec
FROM windowed
"""
)


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family + lateral posexplode in ONE face (r7
    registry consolidation: the former fn_posexplode row folded in).
    The generator and the array scalars share a single staged split —
    per-token rows carry position plus the array-level columns, so the
    tokenize → per-token-row shape AND the array battery are both
    pinned by one oracle. doc_id < 100 keeps the exploded row count at
    oracle scale (the shape is identical at any SF)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toked = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    toks = F.col("_toks")
    return toked.select(
        "doc_id",
        F.posexplode(toks).alias("pos", "tok"),
        F.size(toks).cast("long").alias("n"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("head3"),
        F.size(F.array_intersect(F.array_distinct(toks), F.array(F.lit("join"), F.lit("scan"), F.lit("sort"))))
        .cast("long")
        .alias("n_ops_words"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "tok",
        "n",
        "has_spark",
        "first_tok",
        "last_tok",
        "head3",
        "n_ops_words",
    )


_FN_ARRAY_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 100),
pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM tok)
SELECT
  doc_id,
  i - 1 AS pos,
  toks[i] AS tok,
  len(toks) AS n,
  list_contains(toks, 'spark') AS has_spark,
  toks[1] AS first_tok,
  toks[-1] AS last_tok,
  array_to_string(toks[1:3], ' ') AS head3,
  len(list_intersect(list_distinct(toks), ['join', 'scan', 'sort'])) AS n_ops_words
FROM pos
"""


def q_sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-parser surface: scalar subquery + IN subquery (Catalyst
    decorrelates/rewrites to joins). The scalar avg uses exact integer
    units so the comparison threshold is engine-independent."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 / count(*)
            FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


_SQL_SUBQUERIES_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
    SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 / count(*)
    FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL-parser surface beyond
    rel_sql_subqueries): top-2 orders per customer expressed as a
    JOIN LATERAL with ORDER BY + LIMIT — the per-row-subquery idiom
    SQL users reach for before they learn window functions. Catalyst
    decorrelates it into the same ranked-window/join shape as
    rel_top_orders_per_customer, so the plan scales identically; the
    point here is parser + decorrelation coverage."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.orderkey, t.price
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey AS orderkey, o_totalprice AS price
          FROM orders WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, t.orderkey, t.price
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey AS orderkey, o_totalprice AS price
  FROM orders WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t ON true
"""


def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing scalar family (parse_url HOST/PATH/QUERY + keyed
    query param): the log-processing staple. The URL is synthesized
    from event columns (the corpus carries none), so every extraction
    is a deterministic string op — floor(value) is IEEE-exact, no
    float reaches the output. Pure codegen projection, no shuffle."""
    ev = load(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"),
        F.col("event_type"),
        F.lit(".example.com/u/"),
        F.col("user_id"),
        F.lit("?v="),
        F.floor("value").cast("long"),
        F.lit("&t="),
        F.col("event_type"),
    )
    u = F.col("url")
    return ev.select("event_id", url.alias("url")).select(
        "event_id",
        "url",
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"),
        F.parse_url(u, F.lit("QUERY"), F.lit("v")).alias("v"),
    )


_FN_URL_SQL = """
WITH u AS (
  SELECT event_id,
    'https://' || event_type || '.example.com/u/' || user_id
      || '?v=' || CAST(floor(value) AS BIGINT) || '&t=' || event_type AS url
  FROM events
)
SELECT event_id, url,
  regexp_extract(url, '^https://([^/]+)', 1) AS host,
  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
  regexp_extract(url, '\\?(.*)$', 1) AS query,
  regexp_extract(url, '[?&]v=([^&]*)', 1) AS v
FROM u
"""


def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (the S2 from_json family generalized):
    typed extraction, modular bucketing of the extracted value, and a
    missing-path probe (NULL in both engines). Stays in codegen —
    get_json_object is a JVM-side expression, no UDF."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


_FN_JSON_SQL = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
  json_extract_string(props, '$.missing') AS missing_key
FROM events
"""


def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column:
    filter (count positives), aggregate (L1 norm, left-to-right fold
    — same order as the oracle's list_sum), zip_with against the
    reversed vector. All whole-stage-codegen lambda expressions; at
    scale this is a pure scan-side projection, no shuffle. libm-free
    terms stay raw except the float folds, rounded to 6 (the
    cross-engine float discipline of plans/llmdata._cos_sql)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    l1 = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
    )
    dot_rev = F.aggregate(
        F.zip_with(
            emb,
            F.reverse(emb),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(l1, 6).alias("l1_norm"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.round(dot_rev, 6).alias("dot_reversed"),
    )


_FN_HIGHER_ORDER_SQL = """
SELECT
  vec_id,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
  round(list_sum(list_transform(generate_series(1, 64), i -> abs(embedding[i]::DOUBLE))), 6) AS l1_norm,
  CAST(list_max(embedding) AS DOUBLE) AS max_val,
  round(list_sum(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[65 - i]::DOUBLE)), 6) AS dot_reversed
FROM embeddings
"""


def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: the session runs ANSI mode (Spark 4
    default), where a plain division by zero or bad cast THROWS —
    the try_* family gives the NULL a pipeline wants instead of a
    dead job. Oracle mirrors with explicit CASE / TRY_CAST.

    Retired from the registry in r8 (capacity consolidation, VERDICT
    r7 #2): the same four try_* surfaces are registered on the
    fn_conditional battery over orders; this events-side face stays
    verified against _FN_TRY_ARITH_SQL in tests/test_retired_faces.py."""
    ev = load(spark, sf_dir, "events")
    denom = (F.col("user_id") % 3).cast("double")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom).alias("safe_div"),
        F.concat(F.lit("x"), F.col("user_id")).try_cast("long").alias("bad_cast"),
        F.col("user_id").cast("string").try_cast("long").alias("good_cast"),
        F.try_to_timestamp(F.col("event_type")).alias("bad_ts"),
    )


_FN_TRY_ARITH_SQL = """
SELECT
  event_id,
  CASE WHEN user_id % 3 = 0 THEN NULL
       ELSE value / CAST(user_id % 3 AS DOUBLE) END AS safe_div,
  TRY_CAST('x' || CAST(user_id AS VARCHAR) AS BIGINT) AS bad_cast,
  TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS good_cast,
  TRY_CAST(event_type AS TIMESTAMP) AS bad_ts
FROM events
"""


def q_null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs a subquery that may contain NULL — the classic
    three-valued-logic trap: one NULL in the subquery empties the
    whole result (x NOT IN (…, NULL) is never TRUE). Catalyst plans a
    null-aware anti join for it; the twin count shows the NULL-free
    semantics. Both engines implement ANSI semantics, so the counts
    hash-match."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM supplier
           WHERE s_suppkey NOT IN
             (SELECT l_suppkey FROM lineitem WHERE l_quantity = 50 AND l_discount > 0.09)) AS n_without_nulls,
          (SELECT count(*) FROM supplier
           WHERE s_suppkey NOT IN
             (SELECT nullif(l_suppkey, 1) FROM lineitem WHERE l_quantity = 50 AND l_discount > 0.09)) AS n_with_nulls
        """
    )


_NULL_AWARE_ANTI_SQL = """
SELECT
  (SELECT count(*) FROM supplier
   WHERE s_suppkey NOT IN
     (SELECT l_suppkey FROM lineitem WHERE l_quantity = 50 AND l_discount > 0.09)) AS n_without_nulls,
  (SELECT count(*) FROM supplier
   WHERE s_suppkey NOT IN
     (SELECT nullif(l_suppkey, 1) FROM lineitem WHERE l_quantity = 50 AND l_discount > 0.09)) AS n_with_nulls
"""


def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse the props
    JSON once into a variant, extract typed fields with variant_get —
    the open-schema complement to fn_json's fixed-path
    get_json_object. The variant parse + shredded access stays
    JVM-side (no UDF); at scale VARIANT beats repeated string JSON
    parsing because the binary encoding is parsed once per row.
    Exact-integer aggregate on top pins the extraction end-to-end.

    Output discipline (CORRECTNESS_r02 hash-FAIL): both sides extract
    `k` as BIGINT through one explicit chain and every aggregate is
    BIGINT — DuckDB's sum(INT) returns HUGEINT and min/max(INT)
    return 32-bit, which canonicalize differently from Spark's
    longs in the driver's oracle environment."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    per_row = ev.select(
        "event_id",
        "event_type",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_field"),
    )
    return (
        per_row.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("missing_field").alias("n_missing_present"),
        )
    )


def q_fn_hll_mergeable_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark 4's hll_sketch_agg / hll_union_agg) — THE cardinality
    pattern at 100 TB: each partition/day builds its own fixed-size
    sketch, and any rollup is a cheap sketch union instead of a
    re-scan. Per city this query builds per-day sketches, unions them,
    and emits the estimate beside the single-pass sketch estimate and
    the exact distinct count. Rows-only by design (DataSketches
    binaries aren't reproducible in DuckDB); pytest pins the identity
    that makes the pattern sound — union-of-partials == one-pass
    sketch, bitwise — plus an error bound against the exact count, so
    a regression in either mergeability or accuracy fails loudly.

    Scale shape: two partial aggregations (day then city) shipping
    ~1.5 KB sketch blobs, never user ids; the exact column is the
    small-SF audit and would be dropped at 100 TB."""
    ev = city_events(spark, sf_dir)
    daily = ev.groupBy("city", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    merged = daily.groupBy("city").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_merged"),
    )
    single = ev.groupBy("city").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est_single"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(single, "city")
        .select("city", "n_days", "est_merged", "est_single", "exact_users")
        .orderBy("city")
    )


def q_fn_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 (VERDICT #6): the registered surface is now fully
    oracle-checkable — exact columns plus the two CONTRACTS as
    booleans the oracle pins TRUE: (a) mergeability, union-of-daily-
    partials == one-pass sketch (the identity pytest pins bitwise on
    the raw face); (b) accuracy, lgK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%,
    pinned at 5% (≈3σ) relative error. A broken sketch or merge flips
    the row red instead of hiding behind rows-only. The raw estimates
    stay on q_fn_hll_mergeable_raw (pytest-pinned)."""
    return q_fn_hll_mergeable_raw(spark, sf_dir).select(
        "city",
        "n_days",
        "exact_users",
        (F.col("est_merged") == F.col("est_single")).alias("merge_consistent"),
        (
            F.abs(F.col("est_single") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_rel_err_ok"),
    )


_FN_HLL_SQL = (
    CITY_EVENTS_CTE
    + """
SELECT city,
  count(DISTINCT CAST(ts AS DATE)) AS n_days,
  count(DISTINCT user_id) AS exact_users,
  TRUE AS merge_consistent,
  TRUE AS est_rel_err_ok
FROM windowed
GROUP BY city
ORDER BY city
"""
)


def q_fn_sketch_set_algebra_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra WITHOUT joins (DataSketches theta): how
    many users viewed, purchased, did both, or viewed without ever
    purchasing — at 100 TB these are sketch-lattice operations over
    per-segment theta sketches, not self-joins over user ids. Emits
    the estimates beside exact counts (the small-SF audit columns);
    rows-only by design, with the estimates' error envelope and the
    inclusion-exclusion consistency pinned in pytest."""
    ev = city_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").agg(
        F.theta_sketch_agg("user_id").alias("s")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("s")
    )
    both = views.crossJoin(purchases.select(F.col("s").alias("t"))).select(
        F.theta_sketch_estimate(F.col("s")).alias("est_view"),
        F.theta_sketch_estimate(F.col("t")).alias("est_purchase"),
        F.theta_sketch_estimate(F.theta_union("s", "t")).alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("s", "t")).alias("est_both"),
        F.theta_sketch_estimate(F.theta_difference("s", "t")).alias("est_view_only"),
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        v.agg(F.count_distinct("user_id").alias("exact_view"))
        .crossJoin(p.agg(F.count_distinct("user_id").alias("exact_purchase")))
        .crossJoin(
            v.intersect(p).agg(F.count(F.lit(1)).alias("exact_both"))
        )
    )
    return both.crossJoin(exact)


def q_fn_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 (VERDICT #6): exact columns oracle-checked, estimates pinned
    as boolean contracts the oracle states TRUE. Theta errors scale
    with the UNION support (the sketch's sampled universe), so every
    bound normalizes by exact_union; +0.5 absorbs exact-mode integer
    rounding at small SF where the estimates are exact and view_only
    can be 0. Envelope audit (r7 ADVICE): theta default lgK=12 → RSE
    ≈ 1/√4096 ≈ 1.6%, so the 5% bound is ≈3σ already — kept as-is.
    Raw estimates stay on q_fn_sketch_set_algebra_raw
    (pytest-pinned inclusion-exclusion consistency)."""
    exact_union = (
        F.col("exact_view") + F.col("exact_purchase") - F.col("exact_both")
    ).cast("double")
    tol = 0.05 * exact_union + F.lit(0.5)

    def ok(est, target):
        return (F.abs(F.col(est) - target) <= tol).alias(f"{est}_ok")

    return q_fn_sketch_set_algebra_raw(spark, sf_dir).select(
        "exact_view",
        "exact_purchase",
        "exact_both",
        ok("est_view", F.col("exact_view")),
        ok("est_purchase", F.col("exact_purchase")),
        ok("est_union", exact_union),
        ok("est_both", F.col("exact_both")),
        ok("est_view_only", F.col("exact_view") - F.col("exact_both")),
    )


_FN_SKETCH_ALGEBRA_SQL = (
    CITY_EVENTS_CTE
    + """
SELECT
  (SELECT count(DISTINCT user_id) FROM windowed WHERE event_type = 'view') AS exact_view,
  (SELECT count(DISTINCT user_id) FROM windowed WHERE event_type = 'purchase') AS exact_purchase,
  (SELECT count(*) FROM (
     SELECT DISTINCT user_id FROM windowed WHERE event_type = 'view'
     INTERSECT
     SELECT DISTINCT user_id FROM windowed WHERE event_type = 'purchase')) AS exact_both,
  TRUE AS est_view_ok,
  TRUE AS est_purchase_ok,
  TRUE AS est_union_ok,
  TRUE AS est_both_ok,
  TRUE AS est_view_only_ok
"""
)


def q_fn_kll_quantiles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (DataSketches KLL): per-day
    sketches of the event value merged into one, quantiles read from
    the merged sketch beside the exact percentiles — the streaming/
    partitioned answer to "median at 100 TB" (fixed-size state,
    mergeable across partitions and days, vs an exact full sort).
    Rows-only; pytest pins KLL's rank-error guarantee against the
    exact distribution."""
    ev = city_events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), F.col("value").cast("double").alias("v")
    )
    daily = ev.groupBy("day").agg(F.kll_sketch_agg_double("v").alias("sk"))
    # kll_sketch_merge_* is a binary scalar, not an aggregate: fold the
    # (bounded: one per day) sketch list pairwise — the same shape a
    # tree-reduce over partitions takes at scale
    merged = daily.agg(F.collect_list("sk").alias("sks")).select(
        F.expr(
            "reduce(slice(sks, 2, size(sks) - 1), element_at(sks, 1), "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk")
    )
    qs = merged.select(
        F.kll_sketch_get_n_double("sk").alias("n"),
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(f"kll_p{int(q*100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
    )
    exact = ev.agg(
        *[
            F.percentile("v", F.lit(q)).alias(f"exact_p{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
        *[
            F.percentile("v", F.lit(max(0.0, q - 0.05))).alias(f"_lo{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
        *[
            F.percentile("v", F.lit(min(1.0, q + 0.05))).alias(f"_hi{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
    )
    return qs.crossJoin(exact)


def q_fn_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 (VERDICT #6): n and the exact percentiles oracle-check
    bitwise; each KLL quantile is pinned as a RANK-error contract
    (KLL's guarantee is on rank, not value): the sketch's q-quantile
    must lie within the exact [q−5%, q+5%] value window (k=200 →
    one-sided normalized rank error ≈1.65%; 5% ≈ a 3σ envelope — r7
    ADVICE: 2σ contracts can intermittently breach once a soak-scale
    corpus takes the sketch out of exact mode; the tight 2σ pin stays
    in pytest at exact-regime sfs). Raw quantiles stay on
    q_fn_kll_quantiles_raw (pytest rank pin)."""
    qlist = (0.25, 0.5, 0.75, 0.95)
    return q_fn_kll_quantiles_raw(spark, sf_dir).select(
        "n",
        *[F.col(f"exact_p{int(q * 100)}") for q in qlist],
        *[
            (
                (F.col(f"kll_p{int(q * 100)}") >= F.col(f"_lo{int(q * 100)}"))
                & (F.col(f"kll_p{int(q * 100)}") <= F.col(f"_hi{int(q * 100)}"))
            ).alias(f"kll_p{int(q * 100)}_rank_ok")
            for q in qlist
        ],
    )


# twin routed through the same CITY_EVENTS_CTE enrichment the Spark
# face reads (code-review r7: a future filter in city_events must
# break BOTH sides, not silently diverge), and n counts non-NULL
# values exactly like kll_sketch_get_n_double
_FN_KLL_SQL = (
    CITY_EVENTS_CTE
    + """
SELECT
  count(value) AS n,
  CAST(quantile_cont(value, 0.25) AS DOUBLE) AS exact_p25,
  CAST(quantile_cont(value, 0.5) AS DOUBLE) AS exact_p50,
  CAST(quantile_cont(value, 0.75) AS DOUBLE) AS exact_p75,
  CAST(quantile_cont(value, 0.95) AS DOUBLE) AS exact_p95,
  TRUE AS kll_p25_rank_ok,
  TRUE AS kll_p50_rank_ok,
  TRUE AS kll_p75_rank_ok,
  TRUE AS kll_p95_rank_ok
FROM windowed
"""
)


_FN_VARIANT_SQL = """
SELECT event_type,
  count(*) AS n,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
  count(CAST(json_extract(props, '$.missing') AS BIGINT)) AS n_missing_present
FROM events
GROUP BY event_type
"""


QUERIES = {
    "fn_math": q_fn_math,
    "fn_json": q_fn_json,
    "fn_variant": q_fn_variant,
    "fn_higher_order": q_fn_higher_order,
    "rel_null_aware_anti_join": q_null_aware_anti_join,
    "fn_string": q_fn_string,
    "fn_datetime": q_fn_datetime,
    "fn_conditional": q_fn_conditional,
    "fn_percentiles": q_fn_percentiles,
    "fn_unpivot": q_fn_unpivot,
    "fn_array": q_fn_array,
    "rel_sql_subqueries": q_sql_subqueries,
    "rel_lateral_topk": q_lateral_topk,
    "fn_url": q_fn_url,
    "cs_kafka_producer_frame": q_kafka_producer_frame,
    "cs_producer_metrics": q_producer_metrics,
    # rows-only (DataSketches binaries not reproducible in DuckDB);
    # mergeability/error/consistency pinned in tests/test_semantics_extras.py
    "fn_hll_mergeable": q_fn_hll_mergeable,
    "fn_sketch_set_algebra": q_fn_sketch_set_algebra,
    "fn_kll_quantiles": q_fn_kll_quantiles,
}

ORACLE = {
    "fn_math": _FN_MATH_SQL,
    "fn_json": _FN_JSON_SQL,
    "fn_variant": _FN_VARIANT_SQL,
    "fn_higher_order": _FN_HIGHER_ORDER_SQL,
    "rel_null_aware_anti_join": _NULL_AWARE_ANTI_SQL,
    "fn_string": _FN_STRING_SQL,
    "fn_datetime": _FN_DATETIME_SQL,
    "fn_conditional": _FN_CONDITIONAL_SQL,
    "fn_percentiles": _FN_PERCENTILES_SQL,
    "fn_unpivot": _FN_UNPIVOT_SQL,
    "fn_array": _FN_ARRAY_SQL,
    "rel_sql_subqueries": _SQL_SUBQUERIES_SQL,
    "rel_lateral_topk": _LATERAL_TOPK_SQL,
    "fn_url": _FN_URL_SQL,
    "cs_kafka_producer_frame": _KAFKA_FRAME_SQL,
    "cs_producer_metrics": _PRODUCER_METRICS_SQL,
    # sketch family (r7 conversion): exact columns checked bitwise,
    # estimate contracts pinned as booleans the oracle states TRUE —
    # an accuracy or mergeability regression flips the row red
    "fn_hll_mergeable": _FN_HLL_SQL,
    "fn_sketch_set_algebra": _FN_SKETCH_ALGEBRA_SQL,
    "fn_kll_quantiles": _FN_KLL_SQL,
}
