package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment analysis over an event stream: assign every user to a
  * deterministic variant, measure a binary conversion per user, and test
  * the rate difference with the standard two-proportion pooled z-test.
  *
  * Variant assignment is `user_id % 2` — a pure function of the key, so
  * the split is stable across reruns and replayable by a SQL oracle
  * (production would hash a salt+id; the modulus keeps the arithmetic
  * engine-independent).
  */
object Experiment {

  /** One-row experiment readout: per-variant exposures and conversions,
    * rates, pooled two-proportion z statistic, and significance at
    * α = 0.05 (|z| > 1.96). A user "converts" when any `convType` event
    * exceeds `minValue` — a value threshold rather than mere event
    * presence, because dense event streams give every user every event
    * type and a saturated (p̂ ∈ {0,1}) outcome has zero pooled variance.
    * If the outcome still degenerates, `z`/`significant` are NULL rather
    * than a division error.
    *
    * z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled.
    *
    * Scale shape: conversion is a per-user `max` — one partial-aggregable
    * `user_id` shuffle whose output is one row per user; the variant
    * rollup is a 2-group aggregate and the final pivot is a groupless
    * one-row agg. Nothing is broadcast, nothing corpus-sized leaves the
    * cluster.
    */
  def conversionZTest(events: DataFrame, convType: String = "purchase",
      minValue: Double = 0.0, userCol: String = "user_id",
      typeCol: String = "event_type", valueCol: String = "value"): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType && col(valueCol) > minValue, 1)
        .otherwise(0)).as("converted"))
      .withColumn("variant", pmod(col(userCol), lit(2)).cast("int"))
    val flat = perUser.agg(
      sum(when(col("variant") === 0, 1).otherwise(0)).as("n_a"),
      sum(when(col("variant") === 1, 1).otherwise(0)).as("n_b"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0)).as("conv_a"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0)).as("conv_b"))
    val pa = col("conv_a") / col("n_a").cast("double")
    val pb = col("conv_b") / col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")) /
      (col("n_a") + col("n_b")).cast("double")
    val z = when(pooled > 0.0 && pooled < 1.0,
      (pb - pa) / sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
    flat.select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      (floor((pa) * 1e6 + 0.5) / 1e6).as("rate_a"), (floor((pb) * 1e6 + 0.5) / 1e6).as("rate_b"),
      (floor((z) * 1e6 + 0.5) / 1e6).as("z"),
      (abs(z) > 1.96).as("significant"))
  }
}
