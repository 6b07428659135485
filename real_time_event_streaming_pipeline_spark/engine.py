"""CityStreamEngine — the user-facing query API.

One object = the reference's REST surface (SURVEY.md §2.7), fully
parameterized: a user of rishaliype/Real-Time-Event-Streaming-Pipeline
maps each endpoint call to one method here and gets a DataFrame back.
(The oracle-checked queries in plans/ pin these same shapes with fixed
parameters.)

    eng = CityStreamEngine(spark, "/root/testdata/sf0.01")
    eng.events("SF", limit=20).show()        # GET /events/SF?limit=20
    eng.summary("NYC").show()                # GET /summary/NYC
    eng.alerts(city="Chicago", hours=2)      # GET /alerts?city&hours
    eng.cities()                             # GET /cities
    eng.aggregations("LA", "purchase", 10)   # GET /aggregations?...
    eng.stats()                              # GET /stats
    eng.producer_metrics()                   # GET /metrics/producer
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import ALERT_SEVERITIES
from .plans.citystream import city_events, windowed_agg


class CityStreamEngine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def _events(self) -> DataFrame:
        return city_events(self.spark, self.sf_dir)

    def _aggs(self) -> DataFrame:
        return windowed_agg(self._events())

    # -- the 7 endpoints -------------------------------------------------

    def events(self, city: str, limit: int = 50) -> DataFrame:
        """GET /events/{city}?limit=n — newest first (correct top-k)."""
        return (
            self._events()
            .filter(F.col("city") == city)
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .limit(limit)
            .select("event_id", F.col("ts_iso").alias("event_time"), "city", "event_type", "severity")
        )

    def summary(self, city: str) -> DataFrame:
        """GET /summary/{city} — per-event_type totals + grand total."""
        return (
            self._aggs()
            .filter(F.col("city") == city)
            .rollup("event_type")
            .agg(F.sum("event_count").cast("long").alias("total_events"))
            .select(
                F.coalesce("event_type", F.lit("__TOTAL__")).alias("event_type"),
                "total_events",
            )
        )

    def alerts(self, city: str | None = None, hours: int = 48, limit: int = 50) -> DataFrame:
        """GET /alerts?city&hours — high/critical within the last N
        hours of event time, newest first."""
        al = self._events().filter(F.col("severity").isin(*ALERT_SEVERITIES))
        if city is not None:
            al = al.filter(F.col("city") == city)
        cutoff = al.agg((F.max("ts") - F.expr(f"INTERVAL {int(hours)} HOURS")).alias("cutoff"))
        return (
            al.join(F.broadcast(cutoff))
            .filter(F.col("ts") >= F.col("cutoff"))
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .limit(limit)
            .select("event_id", "city", "event_type", "severity", F.col("ts_iso").alias("event_time"))
        )

    def cities(self) -> DataFrame:
        """GET /cities — total events per city, busiest first."""
        return (
            self._aggs()
            .groupBy("city")
            .agg(F.sum("event_count").cast("long").alias("total_events"))
            .orderBy(F.desc("total_events"), F.asc("city"))
        )

    def aggregations(self, city: str, event_type: str, limit: int = 20) -> DataFrame:
        """GET /aggregations?city&eventType&limit — newest windows."""
        return (
            self._aggs()
            .filter((F.col("city") == city) & (F.col("event_type") == event_type))
            .orderBy(F.desc("window_start"))
            .limit(limit)
        )

    def stats(self) -> DataFrame:
        """GET /stats — global totals + alert severity counts."""
        ce = self._events()
        total = ce.agg(F.count("*").alias("value")).select(
            F.lit("total_events").alias("metric"), F.col("value").cast("long")
        )
        alerts = (
            ce.filter(F.col("severity").isin(*ALERT_SEVERITIES))
            .groupBy("severity")
            .agg(F.count("*").alias("value"))
            .select(F.concat(F.lit("alerts_"), F.col("severity")).alias("metric"), F.col("value").cast("long"))
        )
        return total.unionByName(alerts)

    def producer_metrics(self) -> DataFrame:
        """GET /metrics/producer — see plans.scalar.q_producer_metrics."""
        from .plans.scalar import q_producer_metrics

        return q_producer_metrics(self.spark, self.sf_dir)
