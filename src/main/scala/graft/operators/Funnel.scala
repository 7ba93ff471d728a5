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
      (floor((col(s"step_${steps(i)}") /
        col(s"step_${steps(i - 1)}").cast("double")) * 1e6 + 0.5) / 1e6).as(s"conv_${steps(i)}")
    }
    counts.select(col("n_users") +:
      steps.map(st => col(s"step_$st")) ++: convs: _*)
  }

  /** Weekly cohort retention matrix: users are grouped by the week of
    * their FIRST event (the cohort), and each (cohort, week-offset) cell
    * counts how many of them were active that many weeks later.
    * `retention` divides by the cohort's own size (its offset-0 cell —
    * every user is active in their first week by construction).
    *
    * Scale shape: the per-user first-week aggregate and the activity
    * join both hash on `user_id`, so the event stream shuffles once and
    * the join co-locates on the same partitioning; the per-user
    * (cohort, offset) collapse is a distinct on rows already keyed by
    * user, and the final matrix is |cohorts| × |offsets| rows — tiny, so
    * its cohort-size window costs nothing. No corpus-sized broadcast.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val week = date_trunc("week", col(tsCol)).cast("date")
    val first = events.groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val active = events.select(col(userCol), week.as("active_week")).distinct()
    val cells = active.join(first, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(byCohort))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (floor((col("n_active") / col("cohort_size").cast("double")) * 1e6 + 0.5) / 1e6)
          .as("retention"))
  }

  /** First-order Markov transition matrix over per-user event journeys:
    * P(next event type | current event type), the standard user-journey /
    * process-mining summary. Ordering ties are broken by `event_id` so
    * the chain — and therefore the matrix — is engine-independent.
    *
    * Scale shape: ONE `user_id` window (exchange + sort) produces every
    * adjacent pair via `lead`; the pair count is a partial-aggregable
    * groupBy whose output is |types|² rows, so the row-probability
    * window runs on a bounded frame. The event stream is never
    * self-joined.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("to_event", lead(col(typeCol), 1).over(w))
      .filter(col("to_event").isNotNull)
      .groupBy(col(typeCol).as("from_event"), col("to_event"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_event"))
    pairs.select(col("from_event"), col("to_event"), col("n"),
      (floor((col("n") / sum(col("n")).over(byFrom).cast("double")) * 1e6 + 0.5) / 1e6).as("p"))
  }
}
