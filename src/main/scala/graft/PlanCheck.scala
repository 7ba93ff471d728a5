package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the AQE-final join strategy mix for the named
  * registered queries (comma-separated in args(0); sf dir in args(1),
  * default sf0.01). Used to confirm hint-removal changes still broadcast
  * adaptively at small scale while leaving the planner free at 100 TB.
  *
  * `runMain graft.PlanCheck dedup_ngram_jaccard,sim_semantic_dedup`
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count() // run it so AQE finalizes the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      def n(op: String) = op.r.findAllIn(plan).size
      println(s"PLANCHECK $q: BroadcastHashJoin=${n("BroadcastHashJoin")} " +
        s"SortMergeJoin=${n("SortMergeJoin")} " +
        s"ShuffledHashJoin=${n("ShuffledHashJoin")} " +
        s"BroadcastNestedLoop=${n("BroadcastNestedLoopJoin")} " +
        s"ShuffleExchange=${n("Exchange hashpartitioning")} " +
        s"SinglePartExchange=${n("Exchange SinglePartition")}")
    }
    spark.stop()
  }
}
