package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the per-query shuffle-exchange counts (initial
  * physical plan, sf0.001) as the JSON committed at
  * `tools/shuffle_budget.json` — the budget PlanAuditSpec ratchets
  * against. Regenerate ONLY after reviewing why a count changed: a raised
  * budget is a reviewed decision that a query now legitimately needs one
  * more shuffle, never a side effect.
  *
  * `runMain graft.ShuffleBudget > tools/shuffle_budget.json`
  */
object ShuffleBudget {

  /** Exchanges in the plan string, excluding reuse references (a
    * ReusedExchange consumes an existing shuffle's output; counting it
    * would double-charge the plan for one materialization).
    */
  def countExchanges(plan: String): Int =
    plan.linesIterator.count { l =>
      val t = l.dropWhile(c => !c.isLetter)
      t.startsWith("Exchange ")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> countExchanges(fn(spark, sfDir).queryExecution.executedPlan.toString)
    }
    println(counts.map { case (n, c) => s"""  "$n": $c""" }
      .mkString("{\n", ",\n", "\n}"))
    spark.stop()
  }
}
