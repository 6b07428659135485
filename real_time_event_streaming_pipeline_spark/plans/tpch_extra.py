"""Second wave of TPC-H-shaped relational plans (SURVEY.md §2.6).

Covers the decision-support shapes not yet in plans/relational.py:
Q9 (multi-dimension profit), Q11 (group share vs global scalar),
Q12 (conditional two-branch counts over a join), Q14 (promo ratio),
Q16 (distinct-count with anti-subquery), Q18 (having-subquery join-
back), Q20 (window-threshold semi-join). The corpus has no
``partsupp`` table (FIXTURES.md §B), so the Q9/Q11/Q16/Q20 shapes are
adapted: supply cost is proxied from ``p_retailprice`` and the
part-supplier relation is derived from ``lineitem`` — the plan
shapes (and the Catalyst features they exercise) are the point, not
the TPC-H numbers.

Scale posture, same rules as plans/relational.py:
- part/supplier/nation/region and all derived small sides are
  broadcast — the lineitem scan is never shuffled for a dimension;
- the only wide shuffles are lineitem⋈orders on orderkey and the
  final hash-aggs, both with map-side partials;
- money sums go through exact integer units (_exact_sum) so the
  DuckDB oracle hash-matches bitwise regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .relational import _dstr, _exact_sum, _exact_sum_sql

_UNITS = "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q9 — profit by nation × year
# ---------------------------------------------------------------------------


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product profit by (nation, year). No partsupp
    in the corpus, so per-unit supply cost is proxied as 10% of
    p_retailprice. Only nation (fixed 25 rows) carries a broadcast
    hint; part/supplier grow with SF, so their join strategy is left
    to size stats/AQE. lineitem⋈orders is the one shuffle;
    (nation, year) agg is 2 groups × ~7 years."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_exact_sum(amount, 4).alias("sum_profit"))
    )


_NATION_PROFIT_SQL = f"""
SELECT
  n_name AS nation,
  CAST(year(o_orderdate) AS BIGINT) AS o_year,
  {_exact_sum_sql("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1", 4)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11 — part value share vs a global scalar threshold
# ---------------------------------------------------------------------------


def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: per-part traded value restricted to EUROPE
    suppliers, kept only when above a fraction of the global total —
    a grouped agg compared against a scalar subquery. The scalar side
    is a one-row broadcast; no second scan of the grouped result is
    shuffled. Value is summed in exact integer units so the group and
    global totals are both order-independent."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    pv = (
        li.join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(units).alias("_u"))
    )
    # diamond: pv feeds both the scalar total and the filter; without
    # materialization the lineitem join+agg runs twice (same reasoning
    # as q_top_revenue_supplier)
    pv = pv.localCheckpoint(eager=False)
    total = pv.agg(F.sum("_u").alias("_t"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("_u") > F.col("_t") * F.lit(0.0001))
        .select("l_partkey", (F.col("_u") / F.lit(10000.0)).alias("part_value"))
    )


_PART_VALUE_SHARE_SQL = f"""
WITH pv AS (
  SELECT l_partkey, sum({_UNITS}) AS u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, u / 10000.0 AS part_value
FROM pv
WHERE u > (SELECT sum(u) FROM pv) * 0.0001
"""


# ---------------------------------------------------------------------------
# Q12 — conditional two-branch counts over a fact-fact join
# ---------------------------------------------------------------------------


def q_priority_linecount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped (no l_shipmode column → grouped by
    l_returnflag): per flag, how many 1997-shipped lines belong to
    high- vs low-priority orders. CASE-sum keeps it one pass — the
    reference's A6 conditional-count shape generalized to a join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_PRIORITY_LINECOUNT_SQL = """
SELECT
  l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue ratio
# ---------------------------------------------------------------------------


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: share of one month's revenue from PROMO-type
    parts. Both branches sum exact integer units in a single agg over
    the broadcast part join; the ratio is one double division of two
    exact longs — identical in any IEEE engine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    promo_u = F.sum(F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0)))
    total_u = F.sum(units)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (promo_u / F.lit(10000.0)).alias("promo_revenue"),
            (total_u / F.lit(10000.0)).alias("total_revenue"),
            (F.lit(100.0) * promo_u / total_u).alias("promo_pct"),
        )
    )


_PROMO_REVENUE_SQL = f"""
SELECT
  sum(CASE WHEN p_type = 'PROMO' THEN {_UNITS} ELSE 0 END) / 10000.0 AS promo_revenue,
  sum({_UNITS}) / 10000.0 AS total_revenue,
  100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_UNITS} ELSE 0 END)
        / sum({_UNITS}) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes, with an anti-subquery
# ---------------------------------------------------------------------------


def q_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per (brand, type, size)
    over the lineitem-derived part-supplier relation, excluding
    suppliers with negative account balance (the "complaints" NOT IN
    of the original, done as a broadcast anti-join — null-safe and
    shuffle-free). Distinct-agg shuffles once on the group keys."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_SUPPLIER_PART_CNT_SQL = """
SELECT p_brand, p_type, p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (having-subquery join-back)
# ---------------------------------------------------------------------------


def q_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds 250,
    joined back to customer. The heavy agg groups lineitem by
    orderkey (same key as the subsequent join — one shuffle serves
    both under AQE); customer is broadcast. Top-20 via
    TakeOrderedAndProject. sum(l_quantity) is integer-valued, exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _dstr("o_orderdate", "o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_LARGE_VOLUME_CUSTOMER_SQL = """
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers of a part family (window threshold + semi-join)
# ---------------------------------------------------------------------------


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped (no partsupp/availqty → share-of-shipments
    form): suppliers who shipped more than 30% of a bolt-family
    part's total 1997 quantity. Per-part totals via a window over the
    grouped result (one shuffle on partkey), then a semi-join into
    supplier. The window partitions on high-cardinality partkey so
    state stays bounded at scale."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    supplier = load(spark, sf_dir, "supplier")
    sp = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    w = Window.partitionBy("l_partkey")
    dom = sp.withColumn("part_total", F.sum("q").over(w)).filter(
        F.col("q") > F.lit(0.3) * F.col("part_total")
    )
    return (
        supplier.join(
            dom.select("l_suppkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_DOMINANT_PART_SUPPLIERS_SQL = """
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
),
dom AS (
  SELECT *, sum(q) OVER (PARTITION BY l_partkey) AS part_total FROM sp
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN dom ON s_suppkey = l_suppkey
WHERE q > 0.3 * part_total
ORDER BY s_suppkey
"""


QUERIES = {
    "rel_nation_profit": q_nation_profit,
    "rel_part_value_share": q_part_value_share,
    "rel_priority_linecount": q_priority_linecount,
    "rel_promo_revenue": q_promo_revenue,
    "rel_supplier_part_cnt": q_supplier_part_cnt,
    "rel_large_volume_customer": q_large_volume_customer,
    "rel_dominant_part_suppliers": q_dominant_part_suppliers,
}

ORACLE = {
    "rel_nation_profit": _NATION_PROFIT_SQL,
    "rel_part_value_share": _PART_VALUE_SHARE_SQL,
    "rel_priority_linecount": _PRIORITY_LINECOUNT_SQL,
    "rel_promo_revenue": _PROMO_REVENUE_SQL,
    "rel_supplier_part_cnt": _SUPPLIER_PART_CNT_SQL,
    "rel_large_volume_customer": _LARGE_VOLUME_CUSTOMER_SQL,
    "rel_dominant_part_suppliers": _DOMINANT_PART_SUPPLIERS_SQL,
}
