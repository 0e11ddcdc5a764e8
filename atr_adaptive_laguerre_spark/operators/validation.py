"""Validation aggregates: information coefficient (Spearman rank
correlation between a feature and the forward return), OOD regime splits.

Reference: ``/root/reference/src/atr_adaptive_laguerre/validation/
information_coefficient.py:29-145`` (Spearman IC of feature[t] vs forward
return[t+k], pairwise NaN drop) and ``validation/ood_robustness.py:79-139``
(quantile-threshold regime splits).

Spearman = Pearson correlation of ranks; both engines rank with
row_number over a deterministic total order (value, then event_id) so
ties resolve identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

FORWARD_K = 5


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _r6(col):
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def q_information_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Spearman IC between value and the 5-step forward
    value change of the same user (lead over the user-time window)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fwd = F.lead("value", FORWARD_K).over(w) - F.col("value")
    base = (ev.select("event_id", "event_type", "value", fwd.alias("fwd"))
            .filter(F.col("fwd").isNotNull()))
    wr = Window.partitionBy("event_type")
    rank_v = F.row_number().over(
        wr.orderBy(F.col("value").asc(), F.col("event_id").asc()))
    rank_f = F.row_number().over(
        wr.orderBy(F.col("fwd").asc(), F.col("event_id").asc()))
    ranked = base.select("event_type",
                         rank_v.alias("rv").cast("double").alias("rv"),
                         rank_f.alias("rf").cast("double").alias("rf"))
    return (ranked.groupBy("event_type")
            .agg(_r6(F.corr("rv", "rf")).alias("spearman_ic"),
                 F.count(F.lit(1)).alias("n_pairs"))
            .filter(F.col("n_pairs") >= 30)
            .orderBy("event_type"))


ORACLE_INFORMATION_COEFFICIENT = f"""
WITH base AS (
  SELECT event_id, event_type, value,
         LEAD(value, {FORWARD_K}) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - value AS fwd
  FROM events
), nn AS (
  SELECT * FROM base WHERE fwd IS NOT NULL
), ranked AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC)::DOUBLE AS rv,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY fwd ASC, event_id ASC)::DOUBLE AS rf
  FROM nn
)
SELECT event_type,
       FLOOR(corr(rv, rf) * 1000000 + 0.5) / 1000000 AS spearman_ic,
       COUNT(*) AS n_pairs
FROM ranked
GROUP BY event_type
HAVING COUNT(*) >= 30
ORDER BY event_type
"""


def q_ood_regime_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOD robustness split: label each event by whether its user's
    rolling-20 volatility is above that user's 75th percentile (exact
    percentile via the 'lower' interpolation both engines share:
    percentile at rank ceil(0.75*n))."""
    ev = _events(spark, sf_dir)
    w20 = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(-19, 0))
    std = F.coalesce(F.stddev_samp("value").over(w20), F.lit(0.0))
    vol = ev.select("event_id", "user_id", std.alias("vol"))
    wr = Window.partitionBy("user_id").orderBy("vol", "event_id")
    wcnt = Window.partitionBy("user_id")
    ranked = vol.select(
        "event_id", "user_id", "vol",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(wcnt).alias("n"))
    thresh_rank = F.ceil(F.col("n") * 0.75)
    flagged = ranked.withColumn(
        "high_vol_regime", (F.col("rnk") > thresh_rank).cast("int"))
    return (flagged.groupBy("user_id")
            .agg(F.sum("high_vol_regime").alias("n_high"),
                 F.count(F.lit(1)).alias("n_total"))
            .orderBy("user_id"))


ORACLE_OOD_REGIME_SPLIT = """
WITH vol AS (
  SELECT event_id, user_id,
         COALESCE(STDDEV_SAMP(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 0) AS vol
  FROM events
), ranked AS (
  SELECT event_id, user_id, vol,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY vol, event_id) AS rnk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM vol
)
SELECT user_id,
       CAST(SUM(CASE WHEN rnk > CEIL(n * 0.75) THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       COUNT(*) AS n_total
FROM ranked
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "information_coefficient": q_information_coefficient,
    "ood_regime_split": q_ood_regime_split,
}

ORACLES = {
    "information_coefficient": ORACLE_INFORMATION_COEFFICIENT,
    "ood_regime_split": ORACLE_OOD_REGIME_SPLIT,
}
