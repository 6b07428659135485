"""Relational completeness layer (SURVEY.md §2.6).

The reference contains no joins, set ops, window functions, or
subqueries anywhere (verified against consumer/.../
SparkDynamoDBConsumer.java:1-283 and api/.../
CityStreamApiApplication.java:1-350) — but a complete engine needs
them, and the driver oracle exercises them over the TPC-H-ish corpus.
Everything here is a built-in Catalyst plan; no UDFs.

Scale notes baked into each plan:
- dimension joins (region/nation/supplier/customer at TPC-H ratios)
  are broadcast — no shuffle of the fact table for the small side;
- fact-fact joins shuffle on their equi-keys and rely on AQE for
  skew splitting;
- every top-k is expressed sort-then-limit so Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  never a global sort);
- window functions partition on high-cardinality keys (custkey,
  suppkey, user_id) so state per partition stays bounded.

Determinism for the oracle hash: money aggregates ROUND()ed, LIMIT
always behind a total order, timestamps emitted as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load

DATE_FMT = "yyyy-MM-dd"


def _dstr(col: str | F.Column, alias: str) -> F.Column:
    return F.date_format(col, DATE_FMT).alias(alias)


def _exact_sum(expr, scale: int):
    """Order-independent money sum: convert each term to integer
    units (a deterministic function of a double that is identical in
    every engine), sum exactly, divide once. Floating-point sums are
    NOT reproducible across engines or even across partitionings —
    this removes the dependence entirely (SURVEY.md §7.3)."""
    unit = 10 ** scale
    e = F.floor(expr * unit + F.lit(0.5)).cast("long")
    return F.sum(e) / F.lit(float(unit))


def _exact_sum_sql(expr: str, scale: int) -> str:
    unit = 10 ** scale
    return f"sum(CAST(floor(({expr}) * {unit} + 0.5) AS BIGINT)) / {unit}.0"


# ---------------------------------------------------------------------------
# Aggregation over the fact table
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter-hashagg over the
    biggest table. Filter + column pruning push into the parquet scan;
    partial aggregation happens map-side so the shuffle carries only
    (flag,status) groups."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integer-valued: exact
            _exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _exact_sum(disc_price, 4).alias("sum_disc_price"),
            _exact_sum(charge, 6).alias("sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (_exact_sum(F.col("l_extendedprice"), 2) / n).alias("avg_price"),
            (_exact_sum(F.col("l_discount"), 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


_PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  {_exact_sum_sql("l_extendedprice", 2)} AS sum_base_price,
  {_exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
  {_exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
  sum(l_quantity) / count(*) AS avg_qty,
  {_exact_sum_sql("l_extendedprice", 2)} / count(*) AS avg_price,
  {_exact_sum_sql("l_discount", 2)} / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: customer⋈orders⋈lineitem, revenue top-10.
    No forced broadcast on customer — it grows linearly with SF, so
    the join strategy is left to size stats/AQE (which still picks
    broadcast at small SF and degrades safely to shuffle at 100 TB);
    orders⋈lineitem shuffles on orderkey. Top-10 via
    TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-30").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            _dstr("o_orderdate", "o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_SHIPPING_PRIORITY_SQL = """
SELECT
  l_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: revenue by nation where customer
    and supplier share the nation, one region, one year. region+nation
    +supplier+customer all broadcast; the only shuffle is
    lineitem⋈orders on orderkey."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name, sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-aware counting: orders per customer
    including zero-order customers (count(o_orderkey), not count(*))."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


_CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS: customers having ≥1 URGENT order.
    Semi-join shuffles only the key column of the probe side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


_CUSTOMERS_WITH_URGENT_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers with no orders at all."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def q_setops_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over derived key sets, tagged so all
    three land in one result: suppliers shipping high-quantity lines vs
    suppliers shipping discounted lines."""
    li = load(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") >= 48).select("l_suppkey").distinct()
    disc = li.filter(F.col("l_discount") >= 0.09).select("l_suppkey").distinct()
    return (
        hi.union(disc).distinct().select(F.lit("union").alias("op"), "l_suppkey")
        .unionByName(
            hi.intersect(disc).select(F.lit("intersect").alias("op"), "l_suppkey")
        )
        .unionByName(
            hi.exceptAll(disc).select(F.lit("except").alias("op"), "l_suppkey")
        )
    )


_SETOPS_SUPPLIERS_SQL = """
WITH hi AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity >= 48),
     disc AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_discount >= 0.09)
SELECT 'union' AS op, l_suppkey FROM (SELECT l_suppkey FROM hi UNION SELECT l_suppkey FROM disc)
UNION ALL
SELECT 'intersect' AS op, l_suppkey FROM (SELECT l_suppkey FROM hi INTERSECT SELECT l_suppkey FROM disc)
UNION ALL
SELECT 'except' AS op, l_suppkey FROM (SELECT l_suppkey FROM hi EXCEPT SELECT l_suppkey FROM disc)
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer by totalprice — the
    scalable form of the reference's 'latest N per city' pattern
    (CityStreamApiApplication.java:83-85 + limit; SURVEY.md §2.6).
    row_number over (custkey) keeps state per group at k rows."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


_TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
  ) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q_running_revenue_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: running revenue per supplier in ship order
    (rows-frame cumulative sum). Deterministic frame order via
    (shipdate, orderkey, linenumber)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exact-arithmetic form: windowed double sums are NOT reproducible
    # across engines (DuckDB aggregates window frames via segment
    # trees — different fold order, last-ulp drift), so convert each
    # term to integer ten-thousandths first (deterministic function of
    # an identical double), sum exactly, divide once at the end.
    term_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(term_e4).over(w) / F.lit(10000.0)).alias("running_revenue"),
    )


_RUNNING_REVENUE_SQL = """
SELECT
  l_suppkey, l_orderkey, l_linenumber,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) / 10000.0 AS running_revenue
FROM lineitem
WHERE l_suppkey <= 10
"""


def q_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over the event stream: per-user gap to the
    previous event in seconds."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).cast("long").alias("gap_seconds"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


_USER_EVENT_GAPS_SQL = """
SELECT
  user_id, event_id,
  CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_seconds,
  lead(event_type) OVER w AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube, distinct aggs
# ---------------------------------------------------------------------------


def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-pair, per-flag, grand
    total — multi-level aggregation in one shuffle pass.

    Retired from the registry in r7 (capacity consolidation): its
    lattice {(f,s),(f),()} is a strict subset of the extended
    rel_grouping_sets lattice {(f,s),(f),(s),()} over the same table
    with the same aggregates, so the external row carried no semantics
    the grouping-sets row doesn't. The .rollup() API face stays pinned
    by tests/test_relational_extra.py (rollup ≡ its GROUPING SETS
    expansion)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user bucket): all 4 grouping sets."""
    ev = load(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return (
        ev.cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"), _exact_sum(F.col("value"), 2).alias("total_value"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("user_bucket").cast("string"), F.lit("(all)")).alias(
                "user_bucket"
            ),
            "n",
            "total_value",
        )
    )


_CUBE_EVENTS_SQL = """
SELECT
  coalesce(event_type, '(all)') AS event_type,
  coalesce(CAST(user_bucket AS VARCHAR), '(all)') AS user_bucket,
  count(*) AS n,
  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM (SELECT *, user_id % 10 AS user_bucket FROM events)
GROUP BY CUBE(event_type, user_bucket)
"""


def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact distinct part/supplier counts per
    return flag (expand + two-phase agg under the hood)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


_DISTINCT_PARTS_SQL = """
SELECT
  l_returnflag,
  count(DISTINCT l_partkey) AS n_parts,
  count(DISTINCT l_suppkey) AS n_suppliers,
  count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). Sketch VALUES differ across
    engines, so the raw estimate can't hash-match an oracle — since r7
    the registered surface emits the exact count (bitwise-checked)
    plus the estimate's accuracy CONTRACT as a boolean the oracle pins
    TRUE: default rsd = 0.05, pinned at 15% relative error (3σ — r7
    ADVICE: a 2σ envelope is a probabilistic guarantee that breaches
    ~5% of groups when a big soak corpus pushes the sketch out of its
    exact regime; the tighter envelope stays pytest-pinned at the sfs
    where the sketch is exact). A sketch regression flips the row red
    instead of hiding behind rows-only. At 100 TB this replaces exact
    distinct for dashboards."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(F.approx_count_distinct("user_id") - F.countDistinct("user_id"))
            <= 0.15 * F.countDistinct("user_id")
        ).alias("approx_rel_err_ok"),
    )


_APPROX_DISTINCT_SQL = """
SELECT event_type,
  count(DISTINCT user_id) AS exact_users,
  TRUE AS approx_rel_err_ok
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: user-bucket × event-type count matrix with an explicit
    value list (explicit lists avoid the extra distinct-values job —
    mandatory at scale)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("long")
    )
    piv = (
        ev.groupBy("user_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    )


_PIVOT_EVENT_MATRIX_SQL = """
SELECT
  user_id % 5 AS user_bucket,
  count(*) FILTER (event_type = 'click') AS n_click,
  count(*) FILTER (event_type = 'error') AS n_error,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup') AS n_signup,
  count(*) FILTER (event_type = 'view') AS n_view
FROM events
GROUP BY user_id % 5
"""


# ---------------------------------------------------------------------------
# As-of join, range join, sessionization (SURVEY.md §2.6 custom ops)
# ---------------------------------------------------------------------------


def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — Spark has no native one (pyspark_guide.md 'As-of /
    range join'); composed as union + last_value(ignorenulls) over an
    event-time window, which is shuffle-equivalent to a sort-merge
    as-of and scales linearly: for each purchase event, the most
    recent prior-or-equal view event of the same user.

    The DuckDB oracle uses its native ASOF JOIN."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.col("event_id"), F.lit(1).alias("is_probe")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(0).alias("is_probe"),
    )
    merged = purchases.unionByName(views)
    # order views before purchases at identical ts so ties count as "prior-or-equal"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.when(F.col("is_probe") == 0, F.col("event_id"))
    view_ts = F.when(F.col("is_probe") == 0, F.col("ts"))
    return (
        merged.withColumn("last_view_id", F.last(view_id, ignorenulls=True).over(w))
        .withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("last_view_id").alias("view_id"),
            (F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts"))
            .cast("long")
            .alias("lag_seconds"),
        )
    )


_ASOF_PURCHASE_VIEW_SQL = """
SELECT
  p.user_id,
  p.event_id AS purchase_id,
  v.event_id AS view_id,
  CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS lag_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_events_within_window_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: pairs of events by the same user within 10 minutes.
    Expressed as equi-join on user_id + range predicate, so Spark plans
    a hash/sort-merge join on the equi key and evaluates the range as a
    post-join filter — never a cartesian product."""
    ev = load(spark, sf_dir, "events")
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = ev.select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_id") > F.col("a_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
    )


_EVENTS_WITHIN_WINDOW_PAIRS_SQL = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.event_id > a.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — since r7 the full 2-key lattice
    {(flag,status), (flag), (status), ()} with the same aggregates the
    retired rel_rollup_returns carried: ROLLUP's lattice
    {(f,s),(f),()} is a strict subset, so this one row now pins the
    rollup semantics too (registry consolidation; the .rollup() API
    itself stays pinned by tests/test_relational_extra.py). One
    shuffle pass via Expand, exactly as rollup/cube compile."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT
          coalesce(l_returnflag, '(all)') AS l_returnflag,
          coalesce(l_linestatus, '(all)') AS l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT
  coalesce(l_returnflag, '(all)') AS l_returnflag,
  coalesce(l_linestatus, '(all)') AS l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
"""


def q_skew_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase aggregation (operators.skew): same result
    as a plain groupBy, but the first shuffle spreads hot keys over 16
    salts. Oracle = the plain aggregation, proving salting is
    semantics-preserving."""
    from ..operators.skew import salted_count_sum

    ev = load(spark, sf_dir, "events")
    return salted_count_sum(ev, ["event_type"], value_col="value")


_SKEW_SALTED_COUNTS_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
FROM events GROUP BY event_type
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (batch): gap > 30 min starts a new session —
    lag + conditional cumsum (pyspark_guide.md 'Sessionization'). The
    streaming twin uses session_window in streaming/pipeline.py."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(wsum))
        .withColumn("value_e2", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_e2").alias("session_value_e2"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            (F.sum("session_value_e2") / F.lit(100.0)).alias("total_value"),
        )
    )


_USER_SESSIONS_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_e2,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events, sum(value_e2) AS session_value_e2
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       sum(session_value_e2) / 100.0 AS total_value
FROM per_session GROUP BY user_id
"""


def q_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure scan-side agg — every predicate (date
    range, discount band, quantity cap) reaches the parquet scan; the
    whole query is one codegen stage + a 1-row exact-unit sum."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


_REVENUE_DELTA_SQL = """
SELECT
  sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0 AS revenue_delta,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders with ≥1 line shipped after the order
    date (semi-join), counted per priority class."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


_PRIORITY_LATE_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q_top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returned lines per customer,
    top 20. customer joins without a broadcast hint (SF-proportional —
    stats/AQE decide); top-20 via TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "lost_revenue"
            )
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_TOP_RETURN_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_resample_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-event_type hourly
    counts on a dense hour spine — empty hours appear as zero rows
    (the shape dashboards and forecasting inputs need; a bare groupBy
    silently drops them). The spine is sequence()+explode crossed with
    the type dimension, then a left join picks up observed counts.
    Spine size = hours x types — broadcastable at any horizon."""
    ev = load(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    ).crossJoin(ev.select("event_type").distinct())
    return (
        spine.join(hourly, ["hour", "event_type"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


_RESAMPLE_HOURLY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
full_spine AS (
  SELECT s.hour, t.event_type FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT
  strftime(f.hour, '%Y-%m-%d %H:%M:%S') AS hour,
  f.event_type,
  coalesce(h.n, 0) AS n
FROM full_spine f
LEFT JOIN hourly h ON h.hour = f.hour AND h.event_type = f.event_type
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery: lines whose
    quantity is below 50%% of their part's average — Catalyst
    decorrelates the per-part average into an aggregate + join, so the
    'per-row subquery' costs one extra shuffle, not one query per row."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_partkey,
               count(*) AS n_small_lines,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS small_revenue
        FROM lineitem l1
        WHERE l_quantity < 0.5 * (
            SELECT avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        """
    )


_SMALL_QUANTITY_REVENUE_SQL = """
SELECT l_partkey,
       count(*) AS n_small_lines,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS small_revenue
FROM lineitem l1
WHERE l_quantity < 0.5 * (
    SELECT avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
GROUP BY l_partkey
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped histogram: distribution of customers by how
    many orders they have (including zero) — outer join + two stacked
    aggregations."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


_ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min: for each qualifying part, the
    EUROPE supplier(s) achieving its minimum unit cost. The corpus has
    no partsupp table, so the cost relation is derived from lineitem
    (min observed unit price per part×supplier) — same plan shape:
    a correlated min subquery that Catalyst decorrelates into one
    per-part aggregate + an equality self-join, reusing the partkey
    shuffle. supplier/nation/region are broadcast dimensions."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    europe_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(europe_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = (
        cost.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "mc_partkey")
    )
    qualifying = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name", "p_brand")
    return (
        cost.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(qualifying, cost["l_partkey"] == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


_MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
FROM cost c
JOIN part ON c.l_partkey = p_partkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND unit_cost = (
    SELECT min(unit_cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q_cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between two nations, by
    direction and year. The fact chain lineitem⋈orders shuffles on
    orderkey; supplier/customer nations are broadcast and the
    two-nation filter prunes before the shuffle (either direction)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    n1, n2 = "NATION_1", "NATION_2"
    supp_n = supp.join(
        F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    return (
        li.join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "volume"
            ),
            F.count("*").alias("n_lines"),
        )
    )


_CROSS_NATION_VOLUME_SQL = """
SELECT
  sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  EXTRACT(YEAR FROM l_shipdate)::BIGINT AS l_year,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS volume,
  count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_2's share of PROMO-part
    revenue sold into ASIA, by order year. Share = ratio of two
    exact-unit sums (a conditional sum over the same rows), so the
    double division is bitwise-reproducible across engines. The
    selective part filter is applied before the partkey join; all
    dimensions broadcast — lineitem shuffles only on its join keys."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part")

    promo_parts = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    asia_cust = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    unit = 10_000
    vol_units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * unit + F.lit(0.5)
    ).cast("long")
    return (
        li.join(promo_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol_units).otherwise(F.lit(0)))
                / F.sum(vol_units).cast("double")
            ).alias("mkt_share"),
            (F.sum(vol_units) / F.lit(float(unit))).alias("total_volume"),
        )
    )


_MARKET_SHARE_SQL = """
SELECT
  EXTRACT(YEAR FROM o_orderdate)::BIGINT AS o_year,
  sum(CASE WHEN n2.n_name = 'NATION_2'
           THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
           ELSE 0 END)
    / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
    AS mkt_share,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY 1
"""


def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum quarterly
    revenue — the classic view + scalar-max pattern. The revenue view
    aggregates lineitem once (one suppkey shuffle); the max is a
    1-row scalar joined back by cross-join broadcast, so the view is
    NOT recomputed per row. Revenue in integer units end to end —
    the max-equality compare is on longs, immune to float drift."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000 + F.lit(0.5)
            ).cast("long")
        ).alias("revenue_units")
    )
    # diamond plan: `revenue` feeds both the scalar max and the
    # equality join, and Spark does not share non-identical subtree
    # branches — localCheckpoint materializes the (small, grouped)
    # view once so lineitem is scanned/aggregated once, not twice
    revenue = revenue.localCheckpoint(eager=False)
    top = revenue.agg(F.max("revenue_units").alias("max_units"))
    return (
        revenue.join(F.broadcast(top), F.col("revenue_units") == F.col("max_units"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("revenue_units") / F.lit(10_000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_TOP_REVENUE_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS revenue_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, revenue_units / 10000.0 AS total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_units = (SELECT max(revenue_units) FROM revenue)
ORDER BY s_suppkey
"""


def q_disjunctive_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue under a disjunction of brand × size ×
    quantity bands (no p_container/l_shipmode in this corpus — the
    bands use the columns it has; the plan shape is the point). The
    per-band part predicates prune the broadcast side; the OR of
    conjunctions becomes a single join condition so lineitem is
    scanned once, not once per band."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    band1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    band2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    band3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(band1 | band2 | band3).agg(
        _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_DISJUNCTIVE_BAND_JOIN_SQL = """
SELECT
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped double-correlation: suppliers in a nation who
    were the ONLY late supplier on a multi-supplier order ("late" =
    shipped >60 days after the order date; the corpus has no
    commit/receipt dates). The interesting part is the plan: one
    EXISTS (another supplier contributed to the order) and one NOT
    EXISTS (no OTHER supplier was late) against the same fact table —
    Catalyst decorrelates both into semi/anti joins that reuse the
    orderkey shuffle rather than re-scanning lineitem per row.

    r13 opt: the NOT EXISTS leg used to re-join lineitem⋈orders just
    to read the order date of l3's order — but l3.l_orderkey =
    l1.l_orderkey and o_orderkey is unique, so that o3 row IS the
    outer query's orders row. Referencing the outer o_orderdate
    directly drops one full lineitem⋈orders join from the anti leg
    (plan: 3 lineitem-side joins → 2) with provably identical rows
    (orderkey is the orders PK). The DuckDB oracle keeps the original
    self-join spelling — equivalent by the same uniqueness — so the
    face stays value-checked against an independent derivation."""
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        """
    )


_WAITING_SUPPLIERS_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average balance and no
    RECENT orders (none since 2000 — Q22's "dormant for 7 years"
    compressed to this corpus's date range), counted per nation (no
    phone column, so the country-code grouping becomes the nation
    dimension). Two classic decorrelations in one plan: an
    uncorrelated scalar aggregate (the global average, broadcast as a
    1-row join) and a NOT EXISTS anti-join on custkey whose date
    predicate is pushed below the anti-join's build side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            _exact_sum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
    )


_DORMANT_RICH_CUSTOMERS_SQL = """
SELECT n_name,
       count(*) AS n_custs,
       sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


# The retired multiplicative-hash constants, kept ONLY as the
# deliberately degenerate negative-control family for the
# distribution pins (tests/test_estimator_pins.py) — see
# split_bucket's docstring for why they left the split path.
_SPLIT_MULT = 2654435761
_SPLIT_RED = 1_000_000_007


def split_bucket(col, mod: int):
    """Deterministic, engine-neutral hash bucket in [0, mod) — the
    shared primitive behind the train/val/test split, deterministic
    sampling, source capping, and the packing shards.

    r10 fix (the MinHash-class constant-family sweep): the previous
    ((id % p) · M) % mod multiplicative family was degenerate on any
    id stride sharing a factor with the composite mod — ids that are
    multiples of 100 satisfied (100k·M) % 100 = 0 for every k, so a
    structured-id corpus (snowflake-style ids with constant low
    digits) went 100% train, always-sampled, and cap-exempt; even ids
    could never reach an odd bucket. Bucketing now goes through the
    repo's base md5-60-bit hash of the stringified id (`_h60` in
    operators/dedup.py): full avalanche, no stride can correlate with
    the bucket, still bitwise engine-portable (DuckDB derives the
    identical digits). The degeneracy and the fix are pinned
    distribution-level in tests/test_estimator_pins.py."""
    key = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return key % mod


def split_bucket_sql(col: str, mod: int) -> str:
    """The identical expression in ANSI SQL for the DuckDB oracles."""
    return f"(CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % {mod})"


def q_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test split by key hash — the training-pipeline
    requirement rand() can't satisfy (same row → same split on every
    engine, every run, any partitioning). md5-60bit hash mod 100:
    80/10/10."""
    docs = load(spark, sf_dir, "documents")
    bucket = split_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split")).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_DETERMINISTIC_SPLIT_SQL = f"""
SELECT
  CASE WHEN {split_bucket_sql("doc_id", 100)} < 80 THEN 'train'
       WHEN {split_bucket_sql("doc_id", 100)} < 90 THEN 'val'
       ELSE 'test' END AS split,
  count(*) AS n_docs,
  min(doc_id) AS min_id,
  max(doc_id) AS max_id
FROM documents
GROUP BY 1
"""


QUERIES = {
    "rel_pricing_summary": q_pricing_summary,
    "rel_shipping_priority": q_shipping_priority,
    "rel_local_supplier_volume": q_local_supplier_volume,
    "rel_customer_order_counts": q_customer_order_counts,
    "rel_customers_with_urgent_orders": q_customers_with_urgent_orders,
    "rel_customers_without_orders": q_customers_without_orders,
    "rel_setops_suppliers": q_setops_suppliers,
    "rel_top_orders_per_customer": q_top_orders_per_customer,
    "rel_running_revenue_by_supplier": q_running_revenue_by_supplier,
    "rel_user_event_gaps": q_user_event_gaps,
    "rel_cube_events": q_cube_events,
    "rel_distinct_parts_per_flag": q_distinct_parts_per_flag,
    "rel_approx_distinct_users": q_approx_distinct_users,
    "rel_pivot_event_matrix": q_pivot_event_matrix,
    "rel_asof_purchase_view": q_asof_purchase_view,
    "rel_events_within_window_pairs": q_events_within_window_pairs,
    "rel_user_sessions": q_user_sessions,
    "rel_grouping_sets": q_grouping_sets,
    "rel_skew_salted_counts": q_skew_salted_counts,
    "rel_revenue_delta": q_revenue_delta,
    "rel_priority_late_orders": q_priority_late_orders,
    "rel_top_return_customers": q_top_return_customers,
    "rel_deterministic_split": q_deterministic_split,
    "rel_resample_hourly_gapfill": q_resample_hourly_gapfill,
    "rel_small_quantity_revenue": q_small_quantity_revenue,
    "rel_order_count_distribution": q_order_count_distribution,
    "rel_min_cost_supplier": q_min_cost_supplier,
    "rel_cross_nation_volume": q_cross_nation_volume,
    "rel_market_share": q_market_share,
    "rel_top_revenue_supplier": q_top_revenue_supplier,
    "rel_disjunctive_band_join": q_disjunctive_band_join,
    "rel_waiting_suppliers": q_waiting_suppliers,
    "rel_dormant_rich_customers": q_dormant_rich_customers,
}

ORACLE = {
    "rel_approx_distinct_users": _APPROX_DISTINCT_SQL,
    "rel_pricing_summary": _PRICING_SUMMARY_SQL,
    "rel_shipping_priority": _SHIPPING_PRIORITY_SQL,
    "rel_local_supplier_volume": _LOCAL_SUPPLIER_VOLUME_SQL,
    "rel_customer_order_counts": _CUSTOMER_ORDER_COUNTS_SQL,
    "rel_customers_with_urgent_orders": _CUSTOMERS_WITH_URGENT_SQL,
    "rel_customers_without_orders": _CUSTOMERS_WITHOUT_ORDERS_SQL,
    "rel_setops_suppliers": _SETOPS_SUPPLIERS_SQL,
    "rel_top_orders_per_customer": _TOP_ORDERS_PER_CUSTOMER_SQL,
    "rel_running_revenue_by_supplier": _RUNNING_REVENUE_SQL,
    "rel_user_event_gaps": _USER_EVENT_GAPS_SQL,
    "rel_cube_events": _CUBE_EVENTS_SQL,
    "rel_distinct_parts_per_flag": _DISTINCT_PARTS_SQL,
    # rel_approx_distinct_users: deliberately no oracle (sketch-based)
    "rel_pivot_event_matrix": _PIVOT_EVENT_MATRIX_SQL,
    "rel_asof_purchase_view": _ASOF_PURCHASE_VIEW_SQL,
    "rel_events_within_window_pairs": _EVENTS_WITHIN_WINDOW_PAIRS_SQL,
    "rel_user_sessions": _USER_SESSIONS_SQL,
    "rel_grouping_sets": _GROUPING_SETS_SQL,
    "rel_skew_salted_counts": _SKEW_SALTED_COUNTS_SQL,
    "rel_revenue_delta": _REVENUE_DELTA_SQL,
    "rel_priority_late_orders": _PRIORITY_LATE_ORDERS_SQL,
    "rel_top_return_customers": _TOP_RETURN_CUSTOMERS_SQL,
    "rel_deterministic_split": _DETERMINISTIC_SPLIT_SQL,
    "rel_resample_hourly_gapfill": _RESAMPLE_HOURLY_SQL,
    "rel_small_quantity_revenue": _SMALL_QUANTITY_REVENUE_SQL,
    "rel_order_count_distribution": _ORDER_COUNT_DISTRIBUTION_SQL,
    "rel_min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
    "rel_cross_nation_volume": _CROSS_NATION_VOLUME_SQL,
    "rel_market_share": _MARKET_SHARE_SQL,
    "rel_top_revenue_supplier": _TOP_REVENUE_SUPPLIER_SQL,
    "rel_disjunctive_band_join": _DISJUNCTIVE_BAND_JOIN_SQL,
    "rel_waiting_suppliers": _WAITING_SUPPLIERS_SQL,
    "rel_dormant_rich_customers": _DORMANT_RICH_CUSTOMERS_SQL,
}
