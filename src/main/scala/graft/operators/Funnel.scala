package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for a step sequence
  * A → B → C…, a user converts step k iff an event of that type occurs
  * AT OR AFTER their earliest completion of step k−1 (first-touch
  * semantics, the standard product-analytics funnel).
  *
  * Scale shape: every step is a conditional-min window over the SAME
  * `user_id` partitioning — Spark plans the chained windows over one
  * exchange + sort, so the whole funnel costs a single shuffle of the
  * events regardless of step count; the per-user collapse and the final
  * groupless rollup are partial-aggregable. No self-joins, no
  * per-step scans.
  */
object Funnel {

  /** @param steps event types in funnel order (≥ 1).
    * @return one row: n_users, step counts (`step_<type>`), and each
    *         adjacent conversion rate (`conv_<type>`, rounded). */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val byUser = Window.partitionBy(col(userCol))
    var df = events
    steps.zipWithIndex.foreach { case (step, i) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) >= col(s"t_${i - 1}")
      df = df.withColumn(s"t_$i",
        min(when(cond, col(tsCol))).over(byUser))
    }
    val perUser = df
      .select(col(userCol) +: steps.indices.map(i => col(s"t_$i")): _*)
      .distinct()
    val counts = perUser.agg(count(lit(1)).as("n_users"),
      steps.indices.map(i => count(col(s"t_$i")).as(s"step_${steps(i)}")): _*)
    val convs = steps.indices.drop(1).map { i =>
      round(col(s"step_${steps(i)}") /
        col(s"step_${steps(i - 1)}").cast("double"), 6).as(s"conv_${steps(i)}")
    }
    counts.select(col("n_users") +:
      steps.map(st => col(s"step_$st")) ++: convs: _*)
  }
}
